"""Deterministic integer hashing used across the engine.

All randomness in the engine is derived from these stable integer mixers so
every stage is reproducible across runs, batch orders, and cluster sizes
(the reference pins determinism the same way — seeded numpy for tie-breaks,
scipy-order KNN ties; see /root/reference/libpysal/weights/spatial_lag.py:227).

Two families:

* ``splitmix64`` — fast 64-bit mixer (public-domain algorithm), vectorized
  over numpy uint64 arrays. Used for salting, jitter seeds, synthetic data.
* multiplicative 32-bit Knuth hashes — used for the deterministic geocode,
  because they are exactly reproducible in ANSI SQL (the DuckDB oracle):
  ``(id * C) % 2**32`` with odd constants.
"""

from __future__ import annotations

import numpy as np

# Knuth multiplicative constants (public, from TAOCP / Fibonacci hashing).
GEO_CX = np.uint64(2654435761)  # 2^32 / phi
GEO_CY = np.uint64(2246822519)  # xxhash prime 2
U32 = np.uint64(4294967296 - 1)  # mask 2^32-1
M32 = 4294967296  # modulus 2^32


def mul32(ids: np.ndarray, const: np.uint64) -> np.ndarray:
    """``(ids * const) mod 2**32`` as uint64 — SQL-reproducible hash."""
    a = ids.astype(np.uint64, copy=False)
    return (a * const) & U32


_POLARS_POOL_WARNED = False


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set)."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    return z


def hash_strings_u64(strs, seed: int = 0) -> np.ndarray:
    """Stable 64-bit hash of a sequence of strings (FNV-1a + splitmix)."""
    out = np.empty(len(strs), dtype=np.uint64)
    fnv_offset = np.uint64(0xCBF29CE484222325)
    fnv_prime = np.uint64(0x100000001B3)
    for i, s in enumerate(strs):
        h = fnv_offset ^ np.uint64(seed)
        for b in s.encode("utf-8"):
            h = (h ^ np.uint64(b)) * fnv_prime
        out[i] = h
    return splitmix64(out)


def _string_array_parts(arr):
    """(bytes uint8, starts, lens) of a non-null pyarrow string array
    (string → int32 offsets, large_string → int64 offsets)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=odt,
                        count=len(arr) + 1 + arr.offset)[arr.offset:]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts = off[:-1].astype(np.int64)
    lens = np.diff(off).astype(np.int64)
    return data, starts, lens


def hash_string_array_u64(arr, seed: int = 0) -> np.ndarray:
    """FULLY VECTORIZED 64-bit hash of a pyarrow string array.

    Position-mixed byte terms summed per string (np.add.reduceat over the
    raw Arrow data buffer — zero per-string Python), then a splitmix
    finalizer over (sum ^ length). Order sensitivity comes from the
    position term inside each byte's mix; collision odds are the usual
    ~2^-64 birthday terms. NOT bit-compatible with ``hash_strings_u64``
    (a different mix); the two must never key the same value space —
    today the loop version keys only block/regime labels, this one
    everything else."""
    data, starts, lens = _string_array_parts(arr)
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    total = int(lens.sum())
    if total == 0:
        return splitmix64(np.full(n, np.uint64(seed)))
    seg_starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
    pos = np.arange(total, dtype=np.int64) - np.repeat(seg_starts, lens)
    flat = data[np.repeat(starts, lens) + pos]
    term = splitmix64(
        (flat.astype(np.uint64) << np.uint64(8))
        ^ (pos.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        ^ np.uint64(seed)
    )
    # reduceat only at non-empty segment starts (consecutive non-empty
    # starts bound exactly one string's bytes; empty strings sum to 0)
    ne = lens > 0
    sums = np.zeros(n, dtype=np.uint64)
    sums[ne] = np.add.reduceat(term, seg_starts[ne])
    return splitmix64(sums ^ lens.astype(np.uint64) ^ np.uint64(seed))


def fast_text_digest_u64(arr, seed: int = 0) -> np.ndarray:
    """ENGINE-INTERNAL 64-bit text digest for within-run byte-identity
    witnessing (the flagship digests text at ingest and re-verifies at
    the shuffle boundary; only the boolean reaches the output).

    NOT oracle-mirrored and NOT guaranteed stable across library
    versions — never use it for values that reach a query result, a
    stored artifact, or a SQL oracle; those paths use
    ``hash_string_array_u64`` (bit-mirrored in pipelines/oracle_hash).

    Backed by polars' vectorized string hash (~1.9 GB/s measured vs
    31 MB/s for the per-byte numpy mix and ~200 MB/s for a hashlib.md5
    row loop — the r4 digest swap to the numpy mix was the flagship's
    2x throughput regression, confirmed by worktree A/B). A worker
    without polars raises (a silent per-worker fallback would mix two
    algorithms in one run and corrupt dedup keys / identity witnesses);
    set LPR_TEXT_DIGEST=spec cluster-wide to force the spec hash."""
    import os

    import pyarrow as pa

    if os.environ.get("LPR_TEXT_DIGEST") == "spec":
        # operator-forced single algorithm (set it in the cluster
        # runtime_env so every worker agrees)
        return hash_string_array_u64(arr, seed)
    # one rayon thread per task: the digest runs inside N concurrent Ray
    # tasks per node — polars' default all-cores pool would oversubscribe
    # N× (takes effect only if polars is not yet imported in this worker)
    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    try:
        import polars as pl
    except ImportError:
        # NO silent per-worker fallback: digests compare across tasks
        # (dedup group keys, the flagship byte-identity witness), so two
        # algorithms in one run would make identical texts hash
        # differently — missed duplicates / false "text changed" aborts
        raise RuntimeError(
            "polars is unavailable in this worker but text digests must "
            "be computed by ONE algorithm cluster-wide; install polars "
            "on every node or set LPR_TEXT_DIGEST=spec in the cluster "
            "runtime_env to force the (slower) spec hash everywhere"
        ) from None
    global _POLARS_POOL_WARNED
    if not _POLARS_POOL_WARNED and pl.thread_pool_size() != 1:
        _POLARS_POOL_WARNED = True
        import warnings

        warnings.warn(
            f"polars was imported before the digest pinned "
            f"POLARS_MAX_THREADS=1 (pool={pl.thread_pool_size()}): N "
            "concurrent Ray tasks will each spawn an all-cores rayon "
            "pool — set POLARS_MAX_THREADS=1 in the worker environment "
            "to avoid N× oversubscription",
            RuntimeWarning,
        )
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pl.from_arrow(arr).hash(seed=seed).to_numpy()


def tokenize_hash(col, seed: int = 0):
    """Whitespace-tokenize a pyarrow string column and hash every token —
    all vectorized. Returns (token_hashes uint64, doc_offsets int64) with
    doc i's tokens at ``token_hashes[doc_offsets[i]:doc_offsets[i+1]]``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lst = pc.utf8_split_whitespace(col)
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    flat = lst.flatten()
    lodt = np.int64 if pa.types.is_large_list(lst.type) else np.int32
    off = np.frombuffer(lst.buffers()[1], dtype=lodt,
                        count=len(lst) + 1 + lst.offset)[lst.offset:]
    doc_off = (off - off[0]).astype(np.int64)
    th = hash_string_array_u64(flat, seed)
    # drop empty tokens (leading/trailing whitespace artifacts)
    _, starts, lens = _string_array_parts(flat)
    keep = lens > 0
    if not keep.all():
        # recompute offsets over kept tokens
        doc_idx = np.repeat(np.arange(len(doc_off) - 1), np.diff(doc_off))
        th = th[keep]
        doc_idx = doc_idx[keep]
        counts = np.bincount(doc_idx, minlength=len(doc_off) - 1)
        doc_off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return th, doc_off

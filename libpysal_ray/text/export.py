"""Training-data export: deterministic sharding with verifiable digests.

The last stage of a curation pipeline: spread documents pseudo-randomly
across ``n_shards`` output partitions so every shard is an unbiased
sample (shard = splitmix64(id) mod n — deterministic at any cluster
size, layout, or re-run; no RNG state, no global sort), write one
parquet directory per shard (resumable: a re-run can skip finished
shard directories), and return a per-shard manifest whose xor-digest
pins the EXACT id set without materializing it anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from libpysal_ray.core.hashing import splitmix64

__all__ = ["shard_manifest", "export_shards"]


def shard_manifest(
    ds: ray.data.Dataset,
    n_shards: int,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(shard_id, n_docs, id_xor) for the deterministic shard map
    shard = splitmix64(id) % n_shards. ``id_xor`` = bit-xor of
    splitmix64(id) over the shard's members — a mergeable set digest, so
    the manifest is ONE tiny aggregate, and any later reader can verify
    a shard by recomputing two integers."""
    if n_shards < 1:
        raise ValueError("n_shards must be ≥ 1")

    def _partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        h = splitmix64(ids.view(np.uint64))
        shard = (h % np.uint64(n_shards)).astype(np.int64)
        order = np.argsort(shard, kind="stable")
        s, hh = shard[order], h[order]
        new = np.ones(len(s), bool)
        new[1:] = s[1:] != s[:-1]
        starts = np.flatnonzero(new)
        n = np.diff(np.append(starts, len(s)))
        xor = np.bitwise_xor.reduceat(hh, starts) if len(s) else (
            np.empty(0, np.uint64)
        )
        return pa.table({
            "shard_id": pa.array(s[starts]),
            "n_docs": pa.array(n.astype(np.int64)),
            # signed reinterpretation = the oracle's toi64(sm64(id))
            "id_xor": pa.array(xor.view(np.int64)),
        })

    part = ds.select_columns([id_col]).map_batches(
        _partial, batch_format="pyarrow"
    )
    # n_docs sums; id_xor merges by xor — reuse the native XorAgg
    from libpysal_ray.core.joins import XorAgg

    g = part.groupby("shard_id").aggregate(
        ray.data.aggregate.Sum("n_docs"), XorAgg("id_xor")
    )
    return g.rename_columns(
        {"sum(n_docs)": "n_docs", "xor(id_xor)": "id_xor"}
    )


def export_shards(
    ds: ray.data.Dataset,
    out_dir: str,
    n_shards: int,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Write ``ds`` as ``out_dir/shard_id=<s>/*.parquet`` (hive-style,
    one directory per shard — a failed run resumes by skipping finished
    directories) and return the shard manifest for verification."""

    def _tag(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        h = splitmix64(ids.view(np.uint64))
        return t.append_column(
            "shard_id",
            pa.array((h % np.uint64(n_shards)).astype(np.int64)),
        )

    tagged = ds.map_batches(_tag, batch_format="pyarrow")
    tagged.write_parquet(out_dir, partition_cols=["shard_id"])
    return shard_manifest(ds, n_shards, id_col=id_col)

"""substring_dedup and shard export/manifest."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from libpysal_ray.core.hashing import splitmix64


def test_substring_dedup_drops_later_overlapping_doc():
    from libpysal_ray.text.dedup import substring_dedup

    a = " ".join(f"w{i}" for i in range(30))
    # b embeds a 16-token window of a (tokens 5..20) inside fresh text
    b = "x0 x1 " + " ".join(f"w{i}" for i in range(5, 21)) + " x2"
    c = " ".join(f"y{i}" for i in range(30))
    d = " ".join(f"w{i}" for i in range(30))  # exact dup of a
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([a, b, c, d]),
    }))
    got = sorted(r["doc_id"]
                 for r in substring_dedup(ds, k=16).take_all())
    assert got == [1, 3]


def test_substring_dedup_short_docs_whole_fold():
    from libpysal_ray.text.dedup import substring_dedup

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": pa.array(["a b c", "a b c", "a b"]),
    }))
    got = sorted(r["doc_id"]
                 for r in substring_dedup(ds, k=16).take_all())
    # 11 is a whole-doc duplicate of 10; "a b" != "a b c"
    assert got == [10, 12]


def _ids_ds(n):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(["t"] * n),
    })).repartition(5)


def test_shard_manifest_matches_closed_form():
    from libpysal_ray.text.export import shard_manifest

    n, k = 1000, 8
    out = shard_manifest(_ids_ds(n), k).to_pandas()
    h = splitmix64(np.arange(n, dtype=np.int64).view(np.uint64))
    shard = (h % np.uint64(k)).astype(np.int64)
    assert int(out["n_docs"].sum()) == n
    for s in range(k):
        row = out[out.shard_id == s]
        members = h[shard == s]
        assert int(row["n_docs"].iloc[0]) == len(members)
        if len(members):
            exp = np.bitwise_xor.reduce(members)
            assert int(row["id_xor"].iloc[0]) == int(exp.view(np.int64))


def test_export_shards_roundtrip(tmp_path):
    from libpysal_ray.text.export import export_shards, shard_manifest

    out_dir = os.path.join(str(tmp_path), "shards")
    n, k = 300, 4
    manifest = export_shards(_ids_ds(n), out_dir, k).to_pandas()
    # hive layout: one directory per shard, re-read matches the manifest
    tbl = pq.read_table(out_dir)
    assert tbl.num_rows == n
    dirs = sorted(d for d in os.listdir(out_dir)
                  if d.startswith("shard_id="))
    assert len(dirs) == len(manifest)
    re_manifest = shard_manifest(
        ray.data.from_arrow(tbl.select(["doc_id"])), k
    ).to_pandas().sort_values("shard_id").reset_index(drop=True)
    assert re_manifest.equals(
        manifest.sort_values("shard_id").reset_index(drop=True)
    )

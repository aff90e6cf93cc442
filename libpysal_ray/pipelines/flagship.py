"""Flagship pipeline — the north-rule spatial-join + tiling chain.

pages (url, warc_ts, html, text, lang)
  → project html away at ingest (wide binary never crosses a shuffle —
    SURVEY §7.4.7)
  → md5 text digest per row (the byte-identity invariant,
    BASELINE.json:15)
  → deterministic geocode (doc_id hash → lon/lat)
  → quadcell assignment at ``res``
  → hot-cell salting (pre-aggregated counts → salt factors, broadcast)
  → PIP join against the polygon layer (broadcast actor-pool STRtree-style
    index; semantics graph/_contiguity.py:94-135)
  → ONE hash shuffle on (cell, salt) → per-partition: re-verify the text
    digest byte-for-byte, attach the polygon's neighbor set (from the
    queen-contiguity graph of the layer, broadcast as a small dict), write
    a checkpointed partition + lineage marker
  → result rows (url, cell, polygon_id, neighbor_set, digest_ok).

Resumable: a re-run loads the manifest's done-set and each group skips
itself if its partition is already durable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

from libpysal_ray.builders.contiguity import queen
from libpysal_ray.sources.pages import pages_from_documents
from libpysal_ray.sources.polygons import _poly_table
from libpysal_ray.spatial.cells import assign_cells, assign_salt, salt_factors
from libpysal_ray.spatial.geocode import geocode_ids
from libpysal_ray.spatial.pip import pip_join
from libpysal_ray.state import lineage


def lonlat_coverage(n: int = 12) -> pa.Table:
    """n×n rectangular polygon layer covering lon [-180,180) × lat [-85,85);
    polygon_id = row-major. The 'admin regions' of the flagship join."""
    pids, rings = [], []
    for r in range(n):
        for c in range(n):
            x0 = -180.0 + 360.0 * c / n
            x1 = -180.0 + 360.0 * (c + 1) / n
            y0 = -85.0 + 170.0 * r / n
            y1 = -85.0 + 170.0 * (r + 1) / n
            pids.append(r * n + c)
            rings.append(([x0, x1, x1, x0, x0], [y0, y0, y1, y1, y0]))
    return _poly_table(pids, rings)


def _digest_batch(t: pa.Table, col: str = "text",
                  out: str = "text_digest") -> pa.Table:
    texts = t.column(col).to_pylist()
    dg = np.array(
        [int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
         for s in texts],
        dtype=np.uint64,
    ).astype(np.int64)
    return t.append_column(out, pa.array(dg))


def flagship(
    sf_dir: str | None = None,
    pages: ray.data.Dataset | None = None,
    out_dir: str | None = None,
    res: int = 5,
    poly_n: int = 12,
    rows_per_part: int = 200_000,
    pip_concurrency=(2, 8),
) -> ray.data.Dataset:
    if pages is None:
        assert sf_dir is not None
        pages = pages_from_documents(sf_dir)

    # 1. project the wide binary away before anything else
    if "html" in pages.schema().names:
        pages = pages.drop_columns(["html"])

    # 2. ingest digest (byte-identity invariant start)
    ds = pages.map_batches(_digest_batch, batch_format="pyarrow")

    # 3. geocode + cell assignment (stateless, no shuffle)
    ds = geocode_ids(ds, "doc_id", lonlat=True)
    ds = assign_cells(ds, res)

    # 4. hot-cell salting. Salt factors come from a SEPARATE narrow
    # pipeline that reads only doc_id (column-pruned at the source) — the
    # wide text column never flows through the count pre-aggregate, and the
    # main pipeline stays single-pass streaming (no materialize).
    if sf_dir is not None:
        narrow: ray.data.Dataset = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        )
    else:
        narrow = pages.select_columns(["doc_id"])
    narrow = assign_cells(geocode_ids(narrow, "doc_id", lonlat=True), res)
    factors = salt_factors(narrow, target_rows_per_part=rows_per_part)
    ds = assign_salt(ds, factors, id_col="doc_id")

    # 5. polygon layer + its queen contiguity, broadcast as neighbor lists
    polys = lonlat_coverage(poly_n)
    qg = queen(ray.data.from_arrow(polys))
    nbrs, _ = qg.neighbors_dict()
    max_pid = max(nbrs) if nbrs else -1
    nbr_offsets = np.zeros(max_pid + 2, dtype=np.int64)
    flat = []
    for pid in range(max_pid + 1):
        ns = sorted(nbrs.get(pid, []))
        flat.extend(ns)
        nbr_offsets[pid + 1] = len(flat)
    nbr_ref = ray.put((nbr_offsets, np.asarray(flat, dtype=np.int64)))

    # 6. PIP join (broadcast actor pool; no shuffle)
    joined = pip_join(
        ds,
        polys,
        res=res,
        id_col="doc_id",
        concurrency=pip_concurrency,
        keep_unmatched=True,
        passthrough=("url", "text", "text_digest", "cell_salted"),
    )

    # 7. the one hash shuffle: (cell, salt) partitions; per-partition verify
    # + neighbor-set attach + checkpointed write
    done = lineage.load_done(out_dir) if out_dir else set()
    done_ref = ray.put(done)
    out_dir_v = out_dir

    def _finalize(t: pa.Table) -> pa.Table:
        key = str(int(t.column("cell_salted")[0].as_py()))
        if out_dir_v and key in ray.get(done_ref):
            return _empty_result()
        texts = t.column("text").to_pylist()
        carried = t.column("text_digest").to_numpy(zero_copy_only=False)
        recomputed = np.array(
            [int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
             for s in texts],
            dtype=np.uint64,
        ).astype(np.int64)
        ok = carried == recomputed
        if not ok.all():
            raise RuntimeError(
                f"text byte-identity violated in partition {key}: "
                f"{int((~ok).sum())} rows"
            )
        offs, flat_arr = ray.get(nbr_ref)
        pids = t.column("polygon_id").to_numpy(zero_copy_only=False)
        nsets = []
        for p in pids:
            if 0 <= p < len(offs) - 1:
                nsets.append(flat_arr[offs[p]: offs[p + 1]].tolist())
            else:
                nsets.append([])
        out = pa.table(
            {
                "url": t.column("url"),
                "cell": t.column("cell"),
                "polygon_id": t.column("polygon_id"),
                "neighbor_set": pa.array(nsets, pa.list_(pa.int64())),
                "digest_ok": pa.array(ok),
            }
        )
        if out_dir_v:
            lineage.write_partition(
                out_dir_v, key, out,
                metrics={"digest_xor": int(np.bitwise_xor.reduce(
                    carried.view(np.uint64)) or 0)},
            )
        return out

    return joined.groupby("cell_salted").map_groups(
        _finalize, batch_format="pyarrow"
    )


def _empty_result() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([], pa.string()),
            "cell": pa.array([], pa.int64()),
            "polygon_id": pa.array([], pa.int64()),
            "neighbor_set": pa.array([], pa.list_(pa.int64())),
            "digest_ok": pa.array([], pa.bool_()),
        }
    )

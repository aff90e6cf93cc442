"""Tabular geometry operations (reference ``cg/ops/tabular.py:20-166``).

``dissolve`` in the reference merges the shapely geometries of every
group (``cg/ops/tabular.py`` → shapely unary union) — inherently a
geometry materialization. The engine computes the dissolve *products*
(per-group area and exterior perimeter) WITHOUT building merged
geometry, by segment cancellation:

* a boundary segment shared by two polygons of the same group is
  interior to the dissolved region and cancels; segments appearing once
  are the dissolved exterior. One ``grouped_by_key`` shuffle on
  (label, canonical-segment) does the global cancellation.
* area is additive for planar (non-overlapping) layers: per-ring
  shoelace inside ``map_batches``, one small ``groupby(label)`` sum.

Planarity assumption (documented per the custom-operator rule): polygons
within a group must not overlap and shared boundaries must use matching
vertices — the same non-strict-contiguity precondition as the hash
Queen/Rook builders (builders/contiguity.py:1-27).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from libpysal_ray.builders.contiguity import (
    _f2i,
    _ring_parts,
    _segment_indices,
)
from libpysal_ray.core.joins import grouped_by_key


def dissolve_stats(
    polys: ray.data.Dataset, label_col: str = "label"
) -> ray.data.Dataset:
    """(label, area, perimeter) of each dissolved group.

    ``polys``: engine polygon schema (polygon_id, xs, ys) plus an int64
    ``label_col`` to dissolve by.
    """

    def _segments(t: pa.Table) -> pa.Table:
        pids, x, y, off = _ring_parts(t)
        lab = t.column(label_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        a, b = _segment_indices(off, x, y)
        ring_of = np.searchsorted(off, a, "right") - 1
        seg_lab = lab[ring_of]
        # canonical endpoint order so both owners key identically
        k1 = np.stack([_f2i(x[a]), _f2i(y[a])])
        k2 = np.stack([_f2i(x[b]), _f2i(y[b])])
        swap = (k1[0] > k2[0]) | ((k1[0] == k2[0]) & (k1[1] > k2[1]))
        lo = np.where(swap, k2, k1)
        hi = np.where(swap, k1, k2)
        ln = np.sqrt((x[a] - x[b]) ** 2 + (y[a] - y[b]) ** 2)
        return pa.table(
            {
                "label": pa.array(seg_lab),
                "k1x": pa.array(lo[0]),
                "k1y": pa.array(lo[1]),
                "k2x": pa.array(hi[0]),
                "k2y": pa.array(hi[1]),
                "ln": pa.array(ln),
            }
        )

    def _cancel(t: pa.Table) -> pa.Table:
        # key-sorted bucket: per distinct (label, segment) sum count;
        # exterior = count 1 (planar layers have counts 1 or 2)
        cols = [
            t.column(c).to_numpy(zero_copy_only=False)
            for c in ("label", "k1x", "k1y", "k2x", "k2y")
        ]
        ln = t.column("ln").to_numpy(zero_copy_only=False)
        n = len(ln)
        if n == 0:
            return pa.table(
                {"label": pa.array([], pa.int64()),
                 "area": pa.array([], pa.float64()),
                 "perimeter": pa.array([], pa.float64())}
            )
        first = np.zeros(n, dtype=bool)
        first[0] = True
        for c in cols:
            np.logical_or(first[1:], c[1:] != c[:-1], out=first[1:])
        gidx = np.cumsum(first) - 1
        cnt = np.bincount(gidx)
        heads = np.flatnonzero(first)
        ext = cnt == 1
        lab = cols[0][heads][ext]
        plen = ln[heads][ext]
        # partial per-label sum inside the bucket
        ulab, inv = np.unique(lab, return_inverse=True)
        psum = np.bincount(inv, weights=plen)
        return pa.table(
            {
                "label": pa.array(ulab),
                "area": pa.array(np.zeros(len(ulab))),
                "perimeter": pa.array(psum),
            }
        )

    def _areas(t: pa.Table) -> pa.Table:
        pids, x, y, off = _ring_parts(t)
        lab = t.column(label_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        a, b = _segment_indices(off, x, y)
        ring_of = np.searchsorted(off, a, "right") - 1
        cross = x[a] * y[b] - x[b] * y[a]
        ring_area = np.abs(
            0.5 * np.bincount(ring_of, weights=cross, minlength=len(lab))
        )
        ulab, inv = np.unique(lab, return_inverse=True)
        asum = np.bincount(inv, weights=ring_area)
        return pa.table(
            {
                "label": pa.array(ulab),
                "area": pa.array(asum),
                "perimeter": pa.array(np.zeros(len(ulab))),
            }
        )

    segs = polys.map_batches(_segments, batch_format="pyarrow")
    perim = grouped_by_key(
        segs, ["label", "k1x", "k1y", "k2x", "k2y"], _cancel
    )
    area = polys.map_batches(_areas, batch_format="pyarrow")
    return (
        perim.union(area)
        .groupby("label")
        .sum(["area", "perimeter"])
        .rename_columns({"sum(area)": "area", "sum(perimeter)": "perimeter"})
    )


def zonal_majority(
    ds: ray.data.Dataset,
    zone_col: str = "zone",
    cat_col: str = "cat",
) -> ray.data.Dataset:
    """Zonal MODE — the majority category per zone (the classic zonal
    statistic for categorical rasters / point layers), deterministic at
    any layout: ties break to the LOWEST category code. Output one row
    per zone: (zone, cat, cnt).

    100 TB shape: per-batch (zone, cat) unique-count partials over a
    packed int64 key → ONE groupby(key) sum → a grouped argmax kernel
    over the zone-bucketed counts (vocab-bounded rows: #zones ×
    #categories — the argmax never sees raw observations)."""
    from libpysal_ray.core.joins import grouped_by_key as _gbk

    sch = ds.schema().base_schema
    for c in (zone_col, cat_col):
        if not pa.types.is_integer(sch.field(c).type):
            raise TypeError(f"zonal_majority column {c!r} must be "
                            f"integer-coded (got {sch.field(c).type})")

    def _bounds(t: pa.Table) -> pa.Table:
        z = t.column(zone_col).to_numpy(zero_copy_only=False)
        c = t.column(cat_col).to_numpy(zero_copy_only=False)
        return pa.table({
            "zmin": pa.array([np.int64(z.min())]),
            "cmin": pa.array([np.int64(c.min())]),
            "zmax": pa.array([np.int64(z.max())]),
            "cmax": pa.array([np.int64(c.max())]),
        })

    b = ds.map_batches(_bounds, batch_format="pyarrow").aggregate(
        ray.data.aggregate.Min("zmin"), ray.data.aggregate.Min("cmin"),
        ray.data.aggregate.Max("zmax"), ray.data.aggregate.Max("cmax"),
    )
    if b["min(zmin)"] is None:
        raise ValueError("zonal_majority: empty input")
    if int(b["min(zmin)"]) < 0 or int(b["min(cmin)"]) < 0:
        raise ValueError("zonal_majority needs non-negative codes")
    ncat = int(b["max(cmax)"]) + 1
    if (int(b["max(zmax)"]) + 1) * ncat >= (1 << 62):
        raise ValueError("zonal_majority: code space too large to pack")

    def _partial(t: pa.Table) -> pa.Table:
        z = t.column(zone_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        c = t.column(cat_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        u, cnt = np.unique(z * ncat + c, return_counts=True)
        return pa.table({
            "k": pa.array(u.astype(np.int64)),
            "cnt": pa.array(cnt.astype(np.int64)),
        })

    counts = (
        ds.select_columns([zone_col, cat_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("k")
        .sum("cnt")
        .map_batches(
            lambda t: pa.table({
                "zone": pa.array(
                    t.column("k").to_numpy(zero_copy_only=False) // ncat
                ),
                "cat": pa.array(
                    t.column("k").to_numpy(zero_copy_only=False) % ncat
                ),
                "cnt": pa.array(
                    t.column("sum(cnt)").to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
            }),
            batch_format="pyarrow",
        )
    )

    def _argmax(t: pa.Table) -> pa.Table:
        z = t.column("zone").to_numpy(zero_copy_only=False)
        c = t.column("cat").to_numpy(zero_copy_only=False)
        n = t.column("cnt").to_numpy(zero_copy_only=False)
        # winner per zone: max count, tie -> lowest cat; rows arrive
        # zone-sorted; within zone sort by (-cnt, cat) and take firsts
        order = np.lexsort((c, -n, z))
        zs = z[order]
        first = np.ones(len(zs), bool)
        first[1:] = zs[1:] != zs[:-1]
        keep = order[first]
        return pa.table({
            "zone": pa.array(z[keep]),
            "cat": pa.array(c[keep]),
            "cnt": pa.array(n[keep]),
        })

    return _gbk(counts, ["zone"], _argmax)

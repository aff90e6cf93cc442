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

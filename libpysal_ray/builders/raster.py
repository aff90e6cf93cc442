"""Raster contiguity — pure index-offset arithmetic, shuffle-light.

Reference semantics: weights/raster.py:186-330 ``da2WSP`` flattens a
``(band, y, x)`` DataArray, masks nodata, and generates neighbor pairs by
integer offsets E/SE/S/SW (+ symmetric) with boundary guards
(raster.py:748-874, numba ``_compute_chunk``). Contiguity is within-band.

Ray-Data plan (works at any raster size, no broadcast state): each VALID
cell emits a *claim* row for every potential incident undirected pair
(keyed by the pair); a pair is a real edge iff BOTH endpoints claimed it —
checked by one ``groupby(pair).count()``-style cogroup. Nodata cells simply
never claim, so edges into nodata die for lack of a second claim. This
replaces the reference's in-memory mask lookup with a shuffle, which is the
scalable choice (the mask for a 10^12-cell raster fits nowhere).

Input: Dataset (band:int, row:int, col:int, value:float64); nodata cells
may be present (filtered by value == nodata) or pre-filtered. Cell id =
``band * nrows * ncols + row * ncols + col``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from libpysal_ray.core import edges as E
from libpysal_ray.core.graph import RayGraph


def _gen_offsets(criterion: str, k: int) -> list[tuple[int, int]]:
    """Undirected offset generators for the k-order WINDOW neighborhood:
    queen = Chebyshev distance ≤ k, rook = Manhattan distance ≤ k — the
    offset sets _compute_chunk enumerates order-by-order
    (weights/raster.py:797-873; rook's order-1 corners appear iff
    k/order ≥ 2, which is exactly the Manhattan-≤-k diamond)."""
    offs = []
    for dr in range(0, k + 1):
        for dc in range(-k, k + 1):
            if dr == 0 and dc <= 0:
                continue  # lower half = mirrors of the upper generators
            dist = (
                max(abs(dr), abs(dc))
                if criterion == "queen"
                else abs(dr) + abs(dc)
            )
            if dist <= k:
                offs.append((dr, dc))
    return offs


def raster_contiguity(
    cells: ray.data.Dataset,
    nrows: int,
    ncols: int,
    criterion: str = "rook",
    nodata: float | None = None,
    k: int = 1,
    include_nodata: bool = False,
) -> RayGraph:
    """``k``: contiguity order, lower orders included (da2WSP semantics,
    weights/raster.py:186-330). ``include_nodata=False`` (default) makes
    k-order neighborhoods path-based — reachable within ≤k hops through
    VALID cells (the reference's Σ_{x≤k} matrix-power branch,
    raster.py:318-330) — built here as higher_order(k, lower_order=True)
    over the order-1 graph (k−1 distributed self-joins).
    ``include_nodata=True`` treats nodata as passable when selecting
    higher-order neighbors (the numba branch): pure window offsets, no
    extra shuffle beyond the one claims cogroup."""
    if k > 1 and not include_nodata:
        base = raster_contiguity(cells, nrows, ncols, criterion, nodata)
        return base.higher_order(k, lower_order=True)
    offsets = _gen_offsets(criterion, k)

    def _claims(t: pa.Table) -> pa.Table:
        band = t.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        row = t.column("row").to_numpy(zero_copy_only=False).astype(np.int64)
        col = t.column("col").to_numpy(zero_copy_only=False).astype(np.int64)
        if nodata is not None:
            val = t.column("value").to_numpy(zero_copy_only=False)
            ok = val != nodata
            band, row, col = band[ok], row[ok], col[ok]
        cid = band * (nrows * ncols) + row * ncols + col
        out_a, out_b = [], []
        for dr, dc in offsets:
            # claim the +offset pair AND the mirrored -offset pair: for an
            # undirected pair (a,b), endpoint a claims via +off, endpoint b
            # via -off — each side exactly once, so count==2 ⇔ both valid.
            for sgn in (1, -1):
                rr, cc = row + sgn * dr, col + sgn * dc
                m = (rr >= 0) & (rr < nrows) & (cc >= 0) & (cc < ncols)
                nid = band[m] * (nrows * ncols) + rr[m] * ncols + cc[m]
                me = cid[m]
                out_a.append(np.minimum(me, nid))
                out_b.append(np.maximum(me, nid))
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a)),
                "b": pa.array(np.concatenate(out_b)),
            }
        )

    def _emit_both(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return E.edge_table(
            np.concatenate([a, b]), np.concatenate([b, a]), 1.0
        )

    claims = cells.map_batches(_claims, batch_format="pyarrow")
    edges = (
        claims.groupby(["a", "b"])
        .count()
        .rename_columns({"count()": "cnt"})
        .filter(expr="cnt == 2")
        .map_batches(_emit_both, batch_format="pyarrow")
    )

    def _ids(t: pa.Table) -> pa.Table:
        band = t.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        row = t.column("row").to_numpy(zero_copy_only=False).astype(np.int64)
        col = t.column("col").to_numpy(zero_copy_only=False).astype(np.int64)
        if nodata is not None:
            val = t.column("value").to_numpy(zero_copy_only=False)
            ok = val != nodata
            band, row, col = band[ok], row[ok], col[ok]
        cid = band * (nrows * ncols) + row * ncols + col
        return pa.table({"focal": pa.array(cid)})

    ids = cells.map_batches(_ids, batch_format="pyarrow")
    return RayGraph(E.resolve_isolates(edges, ids))

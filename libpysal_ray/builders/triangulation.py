"""Proximity graphs — Gabriel and Relative-Neighborhood, by direct
geometric characterization.

Reference: /root/reference/libpysal/weights/gabriel.py:156-259 and
graph/_triangulation.py:455-539 compute these as filters over a scipy
Delaunay triangulation (no scipy in this environment). Both graphs have
closed-form pairwise-triple definitions that need no triangulation:

* Gabriel: edge (i, j) survives iff NO third point k lies in the closed
  disc with diameter ij — equivalently no k with
  d²(i,k) + d²(j,k) ≤ d²(i,j)  (the reference's circle test,
  gabriel.py:184-189 `d² > d²ik + d²jk` kept).
* RNG (Toussaint): edge (i, j) survives iff no k with
  max(d(i,k), d(j,k)) ≤ d(i,j)  (gabriel.py:230-240).

Engine plan: candidate pairs from the tiled distance-band builder (a
``max_edge`` length bound — Gabriel/RNG edges are locally short, and the
bound makes the operator well-defined under tiling); the triple test runs
vectorized per candidate batch against the broadcast point set. At corpus
scale the broadcast side is replaced by per-tile points with halo =
max_edge (any witness k for a pair (i,j) lies within d_ij of both
endpoints, so the halo covers it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from libpysal_ray.builders.distance import distance_band
from libpysal_ray.core import edges as E
from libpysal_ray.core.graph import RayGraph


def _filtered_band(
    points: ray.data.Dataset,
    max_edge: float,
    kind: str,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> RayGraph:
    pts = points.materialize()
    tbl_parts = []
    for b in pts.select_columns([id_col, x_col, y_col]).iter_batches(
        batch_format="pyarrow"
    ):
        tbl_parts.append(b)
    all_tbl = pa.concat_tables(tbl_parts)
    aid = all_tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    ax = all_tbl.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
    ay = all_tbl.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(aid, kind="stable")
    ref = ray.put((aid[order], ax[order], ay[order]))

    band = distance_band(pts, threshold=max_edge, id_col=id_col,
                         x_col=x_col, y_col=y_col)
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    # the band edge table is compacted to few blocks; re-split so the
    # O(pairs × points) witness scan fans out across the cluster
    cand = band.edges.repartition(max(8, ncpu)).map_batches(
        E.drop_isolate_markers, batch_format="pyarrow"
    )

    def _test(t: pa.Table) -> pa.Table:
        ids_s, xs, ys = ray.get(ref)
        f = t.column("focal").to_numpy(zero_copy_only=False)
        n = t.column("neighbor").to_numpy(zero_copy_only=False)
        fi = np.searchsorted(ids_s, f)
        ni = np.searchsorted(ids_s, n)
        ix, iy = xs[fi], ys[fi]
        jx, jy = xs[ni], ys[ni]
        d2ij = (ix - jx) ** 2 + (iy - jy) ** 2
        keep = np.ones(len(f), dtype=bool)
        # witness scan in chunks of candidate pairs × all points
        CH = 256
        for s in range(0, len(f), CH):
            sl = slice(s, s + CH)
            d2ik = (ix[sl, None] - xs[None, :]) ** 2 + \
                   (iy[sl, None] - ys[None, :]) ** 2
            d2jk = (jx[sl, None] - xs[None, :]) ** 2 + \
                   (jy[sl, None] - ys[None, :]) ** 2
            self_mask = (ids_s[None, :] == f[sl, None]) | \
                        (ids_s[None, :] == n[sl, None])
            if kind == "gabriel":
                wit = (d2ik + d2jk) <= d2ij[sl, None]
            else:  # rng
                wit = np.maximum(d2ik, d2jk) <= d2ij[sl, None]
            wit &= ~self_mask
            keep[sl] = ~wit.any(axis=1)
        return t.filter(pa.array(keep))

    out = cand.map_batches(_test, batch_format="pyarrow")
    ids = pts.select_columns([id_col]).rename_columns({id_col: "focal"})
    return RayGraph(E.resolve_isolates(out, ids))


def gabriel(points: ray.data.Dataset, max_edge: float, **kw) -> RayGraph:
    """Gabriel graph restricted to edges ≤ max_edge (gabriel.py:156-207)."""
    return _filtered_band(points, max_edge, "gabriel", **kw)


def relative_neighborhood(
    points: ray.data.Dataset, max_edge: float, **kw
) -> RayGraph:
    """Relative-neighborhood graph restricted to edges ≤ max_edge
    (gabriel.py:210-259)."""
    return _filtered_band(points, max_edge, "rng", **kw)

"""Regular-lattice contiguity builders (lat2W / lat2SW semantics).

Reference: /root/reference/libpysal/weights/util.py:143-232 (lat2W),
util.py:1147-1221 (lat2SW). Ids are row-major ``r * ncols + c``. The
reference itself asserts lat2W(5,5) == lat2SW(5,5) at import
(util.py:1609-1616) — we use the same closed-form adjacency as a golden
oracle for the polygon-contiguity pipeline.

Plan: ``ray.data.range(nrows*ncols)`` → stateless ``map_batches`` emitting
neighbor ids by pure integer offset arithmetic with boundary guards. No
shuffle at all — embarrassingly parallel, so it scales to arbitrarily large
lattices (this is also the raster fast path's skeleton).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from libpysal_ray.core.edges import EDGE_SCHEMA
from libpysal_ray.core.graph import RayGraph


def lat2graph(
    nrows: int = 5,
    ncols: int = 5,
    rook: bool = True,
    bishop: bool = False,
    id_type: str = "int",
) -> RayGraph:
    """Contiguity graph of an nrows×ncols lattice (binary weights).

    rook=True → edge neighbors only; rook=False → queen (adds diagonals);
    bishop=True → diagonals only (util.py docstring semantics).
    """
    n = nrows * ncols

    def _emit(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        r = ids // ncols
        c = ids % ncols
        f_list, nb_list = [], []
        rook_offsets = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        diag_offsets = [(-1, -1), (-1, 1), (1, -1), (1, 1)]
        if bishop:
            offsets = diag_offsets
        elif rook:
            offsets = rook_offsets
        else:
            offsets = rook_offsets + diag_offsets
        for dr, dc in offsets:
            rr, cc = r + dr, c + dc
            ok = (rr >= 0) & (rr < nrows) & (cc >= 0) & (cc < ncols)
            f_list.append(ids[ok])
            nb_list.append(rr[ok] * ncols + cc[ok])
        f = np.concatenate(f_list)
        nb = np.concatenate(nb_list)
        return pa.Table.from_arrays(
            [pa.array(f), pa.array(nb), pa.array(np.ones(len(f)))],
            schema=EDGE_SCHEMA,
        )

    edges = ray.data.range(n).map_batches(_emit, batch_format="pyarrow")
    return RayGraph(edges)


def hexlat2graph(nrows: int = 5, ncols: int = 5) -> RayGraph:
    """Hexagonal-lattice contiguity (reference ``hexLat2W``,
    util.py:59-140): rook lattice plus two diagonal neighbors per cell,
    alternating by row parity — even rows (0-based) add NW/NE, odd rows add
    SW/SE, matching the reference's staggered-hexagon layout.

    Same zero-shuffle offset-arithmetic plan as ``lat2graph``.
    """
    n = nrows * ncols

    def _emit(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        r = ids // ncols
        c = ids % ncols
        f_list, nb_list = [], []
        for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            rr, cc = r + dr, c + dc
            ok = (rr >= 0) & (rr < nrows) & (cc >= 0) & (cc < ncols)
            f_list.append(ids[ok])
            nb_list.append(rr[ok] * ncols + cc[ok])
        even = r % 2 == 0
        # even rows: diagonals up-left/up-right at (r-1, c-1) and (r+1, c-1)
        # odd rows:  diagonals at (r-1, c+1) and (r+1, c+1)
        for dr in (-1, 1):
            dc = np.where(even, -1, 1)
            rr, cc = r + dr, c + dc
            ok = (rr >= 0) & (rr < nrows) & (cc >= 0) & (cc < ncols)
            f_list.append(ids[ok])
            nb_list.append(rr[ok] * ncols + cc[ok])
        f = np.concatenate(f_list)
        nb = np.concatenate(nb_list)
        return pa.Table.from_arrays(
            [pa.array(f), pa.array(nb), pa.array(np.ones(len(f)))],
            schema=EDGE_SCHEMA,
        )

    edges = ray.data.range(n).map_batches(_emit, batch_format="pyarrow")
    return RayGraph(edges)

"""Deterministic synthetic polygon coverages (FIXTURES.md F2).

No shapefiles, no external data. Three coverages:

* ``grid_coverage(R, C)`` — R×C lattice of unit squares, ids row-major.
  Queen/Rook goldens are closed-form: identical to ``lat2graph(R, C)``
  (the reference itself asserts lat2W == lat2SW, weights/util.py:1609-1616,
  and builds the same test lattice via build_lattice_shapefile,
  weights/user.py:102-137).
* ``perturbed_grid(R, C, seed)`` — same topology, shared vertices jointly
  displaced (bit-identical across owners) → exercises exact float vertex
  hashing (_contW_lists.py:89-99 keys raw tuples).
* ``holes_and_islands(R, C, holes, n_islands)`` — removed cells + detached
  polygons → isolates as zero-weight self-loops + component bookkeeping.

Schema: polygon_id:int64, xs:list<double>, ys:list<double>,
bbox_minx/miny/maxx/maxy:float64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _poly_table(pids, rings) -> pa.Table:
    xs = [list(map(float, r[0])) for r in rings]
    ys = [list(map(float, r[1])) for r in rings]
    return pa.table(
        {
            "polygon_id": pa.array(np.asarray(pids, np.int64)),
            "xs": pa.array(xs, pa.list_(pa.float64())),
            "ys": pa.array(ys, pa.list_(pa.float64())),
            "bbox_minx": pa.array([min(x) for x in xs]),
            "bbox_miny": pa.array([min(y) for y in ys]),
            "bbox_maxx": pa.array([max(x) for x in xs]),
            "bbox_maxy": pa.array([max(y) for y in ys]),
        }
    )


def _unit_square(r: int, c: int, vx: np.ndarray | None = None,
                 vy: np.ndarray | None = None):
    """Ring of lattice cell (r, c); vertex (i, j) looked up in vx/vy if
    given (shared-vertex displacement), else integer coords."""
    corners = [(r, c), (r, c + 1), (r + 1, c + 1), (r + 1, c), (r, c)]
    if vx is None:
        return ([float(j) for _, j in corners], [float(i) for i, _ in corners])
    return ([float(vx[i, j]) for i, j in corners],
            [float(vy[i, j]) for i, j in corners])


def grid_coverage(nrows: int, ncols: int) -> ray.data.Dataset:
    pids, rings = [], []
    for r in range(nrows):
        for c in range(ncols):
            pids.append(r * ncols + c)
            rings.append(_unit_square(r, c))
    return ray.data.from_arrow(_poly_table(pids, rings))


def perturbed_grid(nrows: int, ncols: int, seed: int = 42,
                   amp: float = 0.3) -> ray.data.Dataset:
    rng = np.random.default_rng(seed)
    vx = np.tile(np.arange(ncols + 1, dtype=np.float64), (nrows + 1, 1))
    vy = np.tile(np.arange(nrows + 1, dtype=np.float64)[:, None], (1, ncols + 1))
    vx += rng.uniform(-amp, amp, vx.shape)
    vy += rng.uniform(-amp, amp, vy.shape)
    pids, rings = [], []
    for r in range(nrows):
        for c in range(ncols):
            pids.append(r * ncols + c)
            rings.append(_unit_square(r, c, vx, vy))
    return ray.data.from_arrow(_poly_table(pids, rings))


def holes_and_islands(
    nrows: int, ncols: int, holes: tuple[int, ...] = (), n_islands: int = 2
) -> ray.data.Dataset:
    """Grid with some cell ids removed plus detached far-away squares.

    Removed ids simply don't exist; island polygons get ids continuing
    after the grid ids and share no vertices with anything.
    """
    pids, rings = [], []
    for r in range(nrows):
        for c in range(ncols):
            pid = r * ncols + c
            if pid in holes:
                continue
            pids.append(pid)
            rings.append(_unit_square(r, c))
    base = nrows * ncols
    for k in range(n_islands):
        ox, oy = 1000.0 + 10.0 * k, 1000.0
        rings.append(
            ([ox, ox + 1, ox + 1, ox, ox], [oy, oy, oy + 1, oy + 1, oy])
        )
        pids.append(base + k)
    return ray.data.from_arrow(_poly_table(pids, rings))

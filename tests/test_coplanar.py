"""Coplanar-point policies for KNN (graph/_kernel.py:264-369 semantics)
and nonplanar island repair (weights/util.py:1346-1467)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from libpysal_ray.builders.contiguity import nonplanar_neighbors, queen
from libpysal_ray.builders.distance import knn


def _pts(ids, x, y):
    return ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(np.asarray(ids, np.int64)),
                "x": pa.array(np.asarray(x, np.float64)),
                "y": pa.array(np.asarray(y, np.float64)),
            }
        )
    )


# 6 points: ids 0/1 share a site at (0,0); 2..5 spread out
_IDS = [0, 1, 2, 3, 4, 5]
_X = [0.0, 0.0, 1.0, 2.0, 0.0, 3.0]
_Y = [0.0, 0.0, 0.0, 0.0, 1.5, 0.0]


def _edges(g):
    return {
        (int(r["focal"]), int(r["neighbor"])): float(r["weight"])
        for r in g.edges.take_all()
        if not (r["focal"] == r["neighbor"] and r["weight"] == 0.0)
    }


def test_knn_coplanar_raise(ray_session):
    with pytest.raises(ValueError, match="coplanar"):
        knn(_pts(_IDS, _X, _Y), k=2, coplanar="raise")


def test_knn_coplanar_jitter_deterministic(ray_session):
    g1 = _edges(knn(_pts(_IDS, _X, _Y), k=2, coplanar="jitter"))
    g2 = _edges(knn(_pts(_IDS, _X, _Y), k=2, coplanar="jitter"))
    assert g1 == g2
    # every node gets exactly k neighbors
    from collections import Counter

    deg = Counter(f for f, _ in g1)
    assert all(deg[i] == 2 for i in _IDS)


def test_knn_coplanar_clique_semantics(ray_session):
    """Brute replication of _induce_cliques (graph/_utils.py:104-126):
    KNN over unique sites; each duplicate inherits its representative's
    out-neighborhood symmetrically plus a weight-0 site link."""
    got = _edges(knn(_pts(_IDS, _X, _Y), k=2, coplanar="clique"))

    # unique sites: rep of (0,0) is id 0; others are their own site
    reps = [0, 2, 3, 4, 5]
    X = np.asarray(_X)
    Y = np.asarray(_Y)
    base = {}
    for i in reps:
        d = np.hypot(X[reps] - X[i], Y[reps] - Y[i])
        order = sorted(
            (dd, j) for dd, j in zip(d, reps) if j != i
        )
        for dd, j in order[:2]:
            base[(i, j)] = 1.0
    expect = dict(base)
    # duplicate 1 inherits rep 0's out-neighbors symmetrically
    for (f, n), w in base.items():
        if f == 0:
            expect[(1, n)] = w
            expect[(n, 1)] = w
    expect[(1, 0)] = 0.0
    expect[(0, 1)] = 0.0
    assert got == expect


def test_nonplanar_neighbors_repairs_islands(ray_session):
    """Two touching squares + one detached square (gap 0.05): queen leaves
    the detached square an island; nonplanar repair with a large-enough
    tolerance joins it to its nearest polygon."""
    polys = ray.data.from_arrow(
        pa.table(
            {
                "polygon_id": pa.array([0, 1, 2], pa.int64()),
                "xs": pa.array(
                    [
                        [0.0, 1.0, 1.0, 0.0],
                        [1.0, 2.0, 2.0, 1.0],
                        [2.05, 3.05, 3.05, 2.05],
                    ],
                    pa.list_(pa.float64()),
                ),
                "ys": pa.array(
                    [
                        [0.0, 0.0, 1.0, 1.0],
                        [0.0, 0.0, 1.0, 1.0],
                        [0.0, 0.0, 1.0, 1.0],
                    ],
                    pa.list_(pa.float64()),
                ),
            }
        )
    )
    g = queen(polys)
    iso = {
        int(r["focal"])
        for r in g.edges.take_all()
        if r["focal"] == r["neighbor"] and r["weight"] == 0.0
    }
    assert iso == {2}
    # total bounds extent: min(3.05, 1.0) = 1.0 → distance = 0.1 > gap
    fixed = nonplanar_neighbors(g, polys, tolerance=0.1)
    ed = _edges(fixed)
    assert (2, 1) in ed and (1, 2) in ed
    assert (0, 1) in ed  # original joins survive
    assert (2, 0) not in ed  # gap to polygon 0 is > 1.05, stays apart
    iso2 = {
        int(r["focal"])
        for r in fixed.edges.take_all()
        if r["focal"] == r["neighbor"] and r["weight"] == 0.0
    }
    assert iso2 == set()

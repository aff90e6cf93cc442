"""Distance builders vs the reference's canonical six-point goldens.

points = [(10,10), (20,10), (40,10), (15,20), (30,20), (30,30)]
Literal expected outputs embedded in the reference
(weights/distance.py:46-66 KNN, :398-423 Kernel, :753-793 DistanceBand;
see FIXTURES.md F3).
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from libpysal_ray.builders.distance import distance_band, kernel, knn

PTS = [(10, 10), (20, 10), (40, 10), (15, 20), (30, 20), (30, 30)]


@pytest.fixture(scope="module")
def points():
    x = np.array([p[0] for p in PTS], dtype=np.float64)
    y = np.array([p[1] for p in PTS], dtype=np.float64)
    return ray.data.from_arrow(
        pa.table({"id": pa.array(np.arange(6, dtype=np.int64)),
                  "x": pa.array(x), "y": pa.array(y)})
    )


def test_knn_golden(points):
    g = knn(points, k=2)
    nbrs, wts = g.neighbors_dict()
    # reference distance.py:46-57: wknn2.neighbors[0] == [1,3]
    assert sorted(nbrs[0]) == [1, 3]
    assert sorted(nbrs[1]) == [0, 3]
    assert sorted(nbrs[5]) == [3, 4]  # (30,30): nearest (30,20) d=10, (15,20) d=18.0
    assert all(w == 1.0 for ws in wts.values() for w in ws)


def test_knn_tiny_tiles_forces_escalation(points):
    # cell size far below spacing → every tile is a singleton → the guard
    # fails everywhere and the broadcast full-scan fallback must produce
    # the exact same edges
    g = knn(points, k=2, cs=1.0)
    nbrs, _ = g.neighbors_dict()
    assert sorted(nbrs[0]) == [1, 3]
    assert sorted(nbrs[1]) == [0, 3]
    assert sorted(nbrs[5]) == [3, 4]


def test_distance_band_golden(points):
    # reference distance.py:753-766: threshold=11.2 → island id 2
    g = distance_band(points, threshold=11.2)
    nbrs, wts = g.neighbors_dict()
    assert sorted(nbrs[0]) == [1, 3]
    assert sorted(nbrs[1]) == [0, 3]
    assert nbrs[2] == []
    assert sorted(nbrs[3]) == [0, 1]
    assert nbrs[4] == [5]
    assert nbrs[5] == [4]
    iso = [r["focal"] for r in g.isolates().take_all()]
    assert iso == [2]


def test_distance_band_inverse(points):
    # reference distance.py:775-793: alpha=-1 w[0]=[0.1, 0.08944...]
    g = distance_band(points, threshold=11.2, binary=False, alpha=-1.0)
    _, wts = g.neighbors_dict()
    got = sorted(wts[0])
    assert abs(got[0] - 0.08944271909999159) < 1e-12
    assert abs(got[1] - 0.1) < 1e-12
    # gravity alpha=-2: [0.01, 0.008]
    g2 = distance_band(points, threshold=11.2, binary=False, alpha=-2.0)
    _, wts2 = g2.neighbors_dict()
    assert sorted(np.round(wts2[0], 6).tolist()) == [0.008, 0.01]


def test_kernel_fixed_golden(points):
    # reference distance.py:398-411: triangular, k=2 → bw=20.000002,
    # w[0] = [1.0, 0.500000049999995, 0.4409830615267465], nbrs [0,1,3]
    g = kernel(points, k=2, function="triangular")
    nbrs, wts = g.neighbors_dict()
    assert sorted(nbrs[0]) == [0, 1, 3]
    w = dict(zip(nbrs[0], wts[0]))
    assert abs(w[0] - 1.0) < 1e-12
    assert abs(w[1] - 0.500000049999995) < 1e-9
    assert abs(w[3] - 0.4409830615267465) < 1e-9


def test_kernel_fixed_bw15(points):
    # reference distance.py:412-423: bandwidth=15 → w[0] = {0:1, 1:0.3333, 3:0.2546}
    g = kernel(points, bandwidth=15.0, fixed=True, function="triangular")
    nbrs, wts = g.neighbors_dict()
    w = dict(zip(nbrs[0], wts[0]))
    assert abs(w[0] - 1.0) < 1e-12
    assert abs(w[1] - 0.33333333333333337) < 1e-9
    assert abs(w[3] - 0.2546440075000701) < 1e-9


def test_kernel_adaptive(points):
    # reference distance.py:441-454: adaptive bandwidths per point
    g = kernel(points, k=2, fixed=False, function="triangular")
    nbrs, wts = g.neighbors_dict()
    # bw_0 = kth dist * eps = 11.180339887 * 1.0000001
    w = dict(zip(nbrs[0], wts[0]))
    assert abs(w[0] - 1.0) < 1e-12
    # neighbors of 0 = knn {1,3} ∪ self
    assert sorted(nbrs[0]) == [0, 1, 3]


def test_kernel_diagonal(points):
    g = kernel(points, bandwidth=15.0, function="gaussian", diagonal=True)
    nbrs, wts = g.neighbors_dict()
    w = dict(zip(nbrs[0], wts[0]))
    assert w[0] == 1.0  # forced self weight


def test_min_threshold_distance_lattice(ray_session):
    """5x5 integer lattice: every nearest neighbor is at distance 1
    (util.py:1106-1141 doctest golden)."""
    import numpy as np

    from libpysal_ray.builders.distance import min_threshold_distance

    xx, yy = np.meshgrid(np.arange(5.0), np.arange(5.0))
    pts = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(np.arange(25, dtype=np.int64)),
                "x": pa.array(xx.ravel()),
                "y": pa.array(yy.ravel()),
            }
        )
    )
    assert min_threshold_distance(pts) == 1.0


def test_knn_fallback_semi_join_path(points, monkeypatch):
    # VERDICT r3 #3: above FALLBACK_SEMI_IDS the unresolved-point
    # selection must route through the distributed semi-join (no
    # driver-held id array). Force it with threshold 0 + tiny tiles
    # (every point unresolved) — edges must match the broadcast path.
    import libpysal_ray.builders.distance as D

    monkeypatch.setattr(D, "FALLBACK_SEMI_IDS", 0)
    g = knn(points, k=2, cs=1.0)
    nbrs, _ = g.neighbors_dict()
    assert sorted(nbrs[0]) == [1, 3]
    assert sorted(nbrs[1]) == [0, 3]
    assert sorted(nbrs[5]) == [3, 4]


def test_knn_arc_fallback_semi_join_path(monkeypatch):
    import libpysal_ray.builders.distance as D
    from libpysal_ray.builders.sphere import knn_arc_edges

    monkeypatch.setattr(D, "FALLBACK_SEMI_IDS", 0)
    lon = np.array([0.0, 1.0, 2.0, 10.0, 11.0, 12.0])
    lat = np.array([0.0, 0.5, 1.0, 10.0, 10.5, 11.0])
    pts = ray.data.from_arrow(
        pa.table({"id": pa.array(np.arange(6, dtype=np.int64)),
                  "lon": pa.array(lon), "lat": pa.array(lat)})
    )
    # cs=10 km ≪ the ~120 km point spacing: every tile is a singleton, the
    # 3-d coverage guard fails for all points, and the fallback must take
    # the semi-join selection (threshold 0)
    e = knn_arc_edges(pts, k=2, cs=10.0)
    nbrs: dict[int, list[int]] = {}
    for r in e.take_all():
        nbrs.setdefault(r["focal"], []).append(r["neighbor"])
    # two tight clusters of 3: each point's 2-NN are its cluster mates
    assert sorted(nbrs[0]) == [1, 2]
    assert sorted(nbrs[3]) == [4, 5]

"""Tests for coverage batch 2: IO formats, hex lattice, remap, islands,
spatial-interaction weights, fuzzy contiguity."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from libpysal_ray.builders.contiguity import fuzzy, rook
from libpysal_ray.builders.interaction import netw, odw, vecw
from libpysal_ray.builders.lattice import hexlat2graph, lat2graph
from libpysal_ray.core.graph import RayGraph
from libpysal_ray.sources.weights_io import (
    read_gal,
    read_gwt,
    read_mtx,
    write_gal,
    write_gwt,
    write_mtx,
)


def _nbrs(g):
    return g.neighbors_dict()[0]


def test_gal_roundtrip(tmp_path):
    g = lat2graph(3, 3, rook=True)
    p = str(tmp_path / "g.gal")
    write_gal(g, p)
    g2 = read_gal(p)
    assert _nbrs(g) == _nbrs(g2)


def test_gwt_roundtrip(tmp_path):
    g = lat2graph(3, 3, rook=True).transform("R")
    p = str(tmp_path / "g.gwt")
    write_gwt(g, p)
    g2 = read_gwt(p)
    n1, w1 = g.neighbors_dict()
    n2, w2 = g2.neighbors_dict()
    assert n1 == n2
    for k in w1:
        assert np.allclose(w1[k], w2[k])


def test_mtx_roundtrip(tmp_path):
    g = lat2graph(3, 3, rook=True)
    p = str(tmp_path / "g.mtx")
    write_mtx(g, p)
    g2 = read_mtx(p)
    assert _nbrs(g) == _nbrs(g2)


def test_hex_lattice_symmetric_and_cardinality():
    g = hexlat2graph(4, 4)
    nd = _nbrs(g)
    # symmetry
    for f, ns in nd.items():
        for n in ns:
            assert f in nd[n], (f, n)
    # interior hex cell has 6 neighbors: cell (r=1,c=1) → id 5 (odd row)
    assert len(nd[5]) == 6, nd[5]


def test_remap_ids_reversal():
    g = lat2graph(3, 3, rook=True)
    ids = np.arange(9)
    g2 = g.remap_ids(ids, 8 - ids)
    nd, nd2 = _nbrs(g), _nbrs(g2)
    for f, ns in nd.items():
        assert sorted(8 - np.array(ns)) == sorted(nd2[8 - f])


def test_attach_islands():
    # 5 clustered points + 1 far island
    pts = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
                "x": pa.array([0.0, 1.0, 0.0, 1.0, 0.5, 100.0]),
                "y": pa.array([0.0, 0.0, 1.0, 1.0, 0.5, 100.0]),
            }
        )
    ).materialize()
    from libpysal_ray.builders.distance import distance_band

    g = distance_band(pts, threshold=2.0)
    iso = g.isolates().to_pandas()["focal"].tolist()
    assert iso == [5]
    g2 = g.attach_islands(pts)
    nd = _nbrs(g2)
    assert len(nd[5]) == 1  # island now linked to its 1-NN
    nn = nd[5][0]
    assert 5 in nd[nn]  # reverse edge exists
    assert g2.isolates().count() == 0


def test_netw_modes():
    links = ray.data.from_arrow(
        pa.table(
            {"o": pa.array([1, 1, 2], pa.int64()),
             "d": pa.array([10, 11, 10], pa.int64())}
        )
    )
    span = 1 << 21
    lids = {(1, 10): 1 * span + 10, (1, 11): 1 * span + 11,
            (2, 10): 2 * span + 10}
    nd = _nbrs(netw(links, share="O"))
    assert sorted(nd[lids[(1, 10)]]) == [lids[(1, 11)]]
    nd_d = _nbrs(netw(links, share="D"))
    assert sorted(nd_d[lids[(1, 10)]]) == [lids[(2, 10)]]
    nd_od = _nbrs(netw(links, share="OD"))
    assert sorted(nd_od[lids[(1, 10)]]) == sorted(
        [lids[(1, 11)], lids[(2, 10)]]
    )


def test_odw_weights():
    wo = lat2graph(2, 2, rook=True)  # 4 nodes, each 2 neighbors
    wd = lat2graph(2, 1, rook=True)  # 2 nodes, path
    g = odw(wo, wd, d_span=2, transform="R")
    nd, wd_ = g.neighbors_dict()
    # flow (0,0) id 0: o-neighbors of 0 = {1,2} (each w 1/2), d-neighbor of
    # 0 = {1} (w 1) → flows {1*2+1, 2*2+1} = {3, 5} with weight 0.5
    assert sorted(nd[0]) == [3, 5]
    assert np.allclose(wd_[0], [0.5, 0.5])


def test_vecw_small():
    vecs = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([0, 1, 2], pa.int64()),
                "ox": pa.array([0.0, 1.0, 50.0]),
                "oy": pa.array([0.0, 0.0, 50.0]),
                "dx": pa.array([0.0, 1.0, 50.0]),
                "dy": pa.array([0.0, 0.0, 50.0]),
            }
        )
    )
    g = vecw(vecs, threshold=2.0)
    nd = _nbrs(g)
    assert nd[0] == [1] and nd[1] == [0] and nd[2] == []


def test_fuzzy_equals_queen_on_touching_squares():
    # unit squares sharing edges AND corners: fuzzy(tol=0) == queen
    pids, xs, ys = [], [], []
    for r in range(3):
        for c in range(3):
            pids.append(r * 3 + c)
            xs.append([c, c + 1.0, c + 1.0, c, c])
            ys.append([r, r, r + 1.0, r + 1.0, r])
    polys = ray.data.from_arrow(
        pa.table(
            {
                "polygon_id": pa.array(pids, pa.int64()),
                "xs": pa.array(xs, pa.list_(pa.float64())),
                "ys": pa.array(ys, pa.list_(pa.float64())),
            }
        )
    ).materialize()
    from libpysal_ray.builders.contiguity import queen

    assert _nbrs(fuzzy(polys, tolerance=0.0)) == _nbrs(queen(polys))


def test_fuzzy_gap_tolerance():
    # squares of side 0.8 with gap 0.2; tol 0.25 → rook only (diag 0.283)
    pids, xs, ys = [], [], []
    for r in range(2):
        for c in range(2):
            pids.append(r * 2 + c)
            xs.append([c, c + 0.8, c + 0.8, c, c])
            ys.append([r, r, r + 0.8, r + 0.8, r])
    polys = ray.data.from_arrow(
        pa.table(
            {
                "polygon_id": pa.array(pids, pa.int64()),
                "xs": pa.array(xs, pa.list_(pa.float64())),
                "ys": pa.array(ys, pa.list_(pa.float64())),
            }
        )
    ).materialize()
    nd = _nbrs(fuzzy(polys, tolerance=0.25))
    assert sorted(nd[0]) == [1, 2]  # not 3 (diagonal)

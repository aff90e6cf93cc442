"""Roundtrip tests for the legacy long-tail weights formats:
STATA text (sparse + matrix), GeoBUGS, MATLAB MAT v4, Lotus WK1."""

import numpy as np
import pytest

from libpysal_ray.builders.lattice import lat2graph
from libpysal_ray.core.graph import RayGraph
from libpysal_ray.sources.weights_io import (
    read_geobugs,
    read_mat,
    read_stata_text,
    read_wk1,
    write_geobugs,
    write_mat,
    write_stata_text,
    write_wk1,
)


def _adj(g):
    n, w = g.neighbors_dict()
    return {k: dict(zip(n[k], w[k])) for k in n}


def _with_island(ray_session):
    # 3x3 rook lattice plus a disconnected observation id 99
    g = lat2graph(3, 3, rook=True)
    import pyarrow as pa

    from libpysal_ray.core import edges as E

    extra = E.from_arrays(
        np.array([99], np.int64), np.array([99], np.int64),
        np.array([0.0]),
    )
    return RayGraph(g.edges.union(extra))


def test_stata_sparse_roundtrip(ray_session, tmp_path):
    g = lat2graph(3, 3, rook=True)
    p = str(tmp_path / "w.txt")
    write_stata_text(g, p)
    g2 = read_stata_text(p)
    n1, _ = g.neighbors_dict()
    n2, _ = g2.neighbors_dict()
    assert {k: sorted(v) for k, v in n1.items()} == {
        k: sorted(v) for k, v in n2.items()
    }


def test_stata_matrix_roundtrip_keeps_weights(ray_session, tmp_path):
    g = lat2graph(3, 3, rook=True).transform("R")
    p = str(tmp_path / "w.txt")
    write_stata_text(g, p, matrix_form=True)
    g2 = read_stata_text(p)
    a1, a2 = _adj(g), _adj(g2)
    assert set(a1) == set(a2)
    for k in a1:
        for n in a1[k]:
            assert np.isclose(a1[k][n], a2[k][n])


def test_stata_island_survives(ray_session, tmp_path):
    g = _with_island(ray_session)
    p = str(tmp_path / "w.txt")
    write_stata_text(g, p)
    g2 = read_stata_text(p)
    n2, w2 = g2.neighbors_dict()
    assert n2[99] == [] or n2[99] == [99]  # isolate representation
    assert g2.n() == 10


def test_geobugs_roundtrip(ray_session, tmp_path):
    g = lat2graph(3, 3, rook=True).transform("R")
    p = str(tmp_path / "w.bugs")
    write_geobugs(g, p)
    g2 = read_geobugs(p)
    # geobugs remaps ids to 1-based record numbers in canonical order
    a1 = _adj(g)
    a2 = _adj(g2)
    ids = sorted(a1)
    rec = {fid: i + 1 for i, fid in enumerate(ids)}
    for k in a1:
        want = {rec[n]: w for n, w in a1[k].items()}
        assert set(a2[rec[k]]) == set(want)
        for n in want:
            assert np.isclose(a2[rec[k]][n], want[n])


def test_geobugs_binary_reference_form(ray_session, tmp_path):
    # without weights= (exactly what the reference writer emits)
    g = lat2graph(2, 3, rook=True)
    p = str(tmp_path / "w.bugs")
    write_geobugs(g, p, include_weights=False)
    body = open(p).read()
    assert body.startswith("list(num=c(") and "weights" not in body
    g2 = read_geobugs(p)
    assert g2.n() == 6
    a2 = _adj(g2)
    assert all(w == 1.0 for d in a2.values() for w in d.values())


def test_mat_roundtrip(ray_session, tmp_path):
    g = lat2graph(3, 3, rook=True).transform("R")
    p = str(tmp_path / "w.mat")
    write_mat(g, p)
    g2 = read_mat(p)
    a1, a2 = _adj(g), _adj(g2)
    assert set(a1) == set(a2)
    for k in a1:
        assert set(a1[k]) == set(a2[k])
        for n in a1[k]:
            assert np.isclose(a1[k][n], a2[k][n])


def test_mat_v5_raises(tmp_path):
    p = tmp_path / "w5.mat"
    p.write_bytes(b"MATLAB 5.0 MAT-file" + b"\x00" * 120)
    with pytest.raises(ValueError, match="Level-5"):
        read_mat(str(p))


def test_wk1_roundtrip(ray_session, tmp_path):
    g = lat2graph(3, 3, rook=True).transform("R")
    p = str(tmp_path / "w.wk1")
    write_wk1(g, p)
    g2 = read_wk1(p)
    a1, a2 = _adj(g), _adj(g2)
    assert set(a1) == set(a2)
    for k in a1:
        assert set(a1[k]) == set(a2[k])
        for n in a1[k]:
            assert np.isclose(a1[k][n], a2[k][n])


def test_wk1_island_survives(ray_session, tmp_path):
    g = _with_island(ray_session)
    p = str(tmp_path / "w.wk1")
    write_wk1(g, p)
    g2 = read_wk1(p)
    assert g2.n() == 10  # RANGE record preserves all-zero rows


def test_wk1_too_big_raises(ray_session):
    g = lat2graph(20, 20, rook=True)
    with pytest.raises(ValueError, match="256"):
        write_wk1(g, "/tmp/too_big.wk1")


def test_geoda_txt_roundtrip(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from libpysal_ray.sources.tables import read_geoda_txt, write_geoda_txt

    ds = ray.data.from_arrow(
        pa.table(
            {
                "FIPSNO": pa.array([17107, 29223], pa.int64()),
                "HR8488": pa.array([1.290722, 0.0]),
                "NAME": pa.array(["a", "b"]),
            }
        )
    )
    p = str(tmp_path / "t.txt")
    write_geoda_txt(ds, p)
    body = open(p).read().splitlines()
    assert body[0] == "2,3"
    assert body[1] == '"FIPSNO","HR8488","NAME"'
    back = read_geoda_txt(p)
    rows = back.take_all()
    assert rows[0]["FIPSNO"] == 17107 and isinstance(rows[0]["FIPSNO"], int)
    assert abs(rows[0]["HR8488"] - 1.290722) < 1e-12
    assert rows[1]["NAME"] == "b"


def test_geoda_txt_bad_header_raises(tmp_path):
    from libpysal_ray.sources.tables import read_geoda_txt

    p = tmp_path / "bad.txt"
    p.write_text('2,3\n"only","two"\n1,2\n3,4\n')
    import pytest as _pt

    with _pt.raises(TypeError, match="geoda_txt"):
        read_geoda_txt(str(p))


def test_geobugs_negative_weights(ray_session, tmp_path):
    # regression (ADVICE r3): digit-position slicing dropped the minus
    # sign — weights=c(-0.5,...) parsed as 0.5
    p = str(tmp_path / "neg.txt")
    with open(p, "w") as f:
        f.write("list(num=c(1,1),adj=c(2,1),"
                "weights=c(-0.5,1.5e-1),sumNumNeigh=2)")
    g = read_geobugs(p)
    rows = {(r["focal"], r["neighbor"]): r["weight"]
            for r in g.edges.take_all()}
    assert rows[(1, 2)] == -0.5
    assert rows[(2, 1)] == 0.15

"""Algebraic property tests over seeded random graphs — engine results
vs in-memory numpy/set brute references (the reference's test suite
asserts the same identities on fixed fixtures; here they run over
several random graphs per property)."""

import numpy as np
import pytest
import ray.data

from libpysal_ray.core import edges as E
from libpysal_ray.core.graph import RayGraph


def _rand_graph(rng, n=30, m=80, weighted=False, ids_offset=0):
    f = rng.integers(0, n, m)
    nb = rng.integers(0, n, m)
    keep = f != nb
    f, nb = f[keep] + ids_offset, nb[keep] + ids_offset
    # dedup directed pairs
    pairs = np.unique(np.column_stack([f, nb]), axis=0)
    w = (
        rng.random(len(pairs)) + 0.5
        if weighted
        else np.ones(len(pairs))
    )
    ed = E.from_arrays(pairs[:, 0], pairs[:, 1], w)
    ids = np.arange(n, dtype=np.int64) + ids_offset
    g = RayGraph(E.resolve_isolates(ed, ids))
    return g, {(int(a), int(b)): float(x) for (a, b), x in zip(pairs, w)}


def _edge_dict(g):
    return {
        (int(r["focal"]), int(r["neighbor"])): float(r["weight"])
        for r in g.edges.take_all()
        if not (r["focal"] == r["neighbor"] and r["weight"] == 0.0)
    }


def test_transform_r_row_sums(ray_session):
    rng = np.random.default_rng(1)
    g, ed = _rand_graph(rng, weighted=True)
    got = _edge_dict(g.transform("R"))
    sums: dict = {}
    for (f, _n), w in got.items():
        sums[f] = sums.get(f, 0.0) + w
    for f, s in sums.items():
        assert abs(s - 1.0) < 1e-12, (f, s)
    # focals present in input keep all their edges
    assert {k for k in got} == {k for k in ed}


def test_set_ops_against_set_algebra(ray_session):
    rng = np.random.default_rng(2)
    a, ea = _rand_graph(rng)
    b, eb = _rand_graph(rng)
    sa, sb = set(ea), set(eb)
    assert set(_edge_dict(a.union_g(b))) == sa | sb
    assert set(_edge_dict(a.intersection_g(b))) == sa & sb
    assert set(_edge_dict(a.difference_g(b))) == sa - sb
    assert set(_edge_dict(a.symmetric_difference_g(b))) == sa ^ sb
    # containment laws
    assert a.intersection_g(b).issubgraph(a)
    assert a.issubgraph(a.union_g(b))


def test_symmetrize_union_idempotent(ray_session):
    rng = np.random.default_rng(3)
    g, _ = _rand_graph(rng)
    s1 = g.symmetrize("union")
    s2 = s1.symmetrize("union")
    d1, d2 = _edge_dict(s1), _edge_dict(s2)
    assert set(d1) == set(d2)
    # symmetric: every edge has its reverse
    assert all((b, a) in d1 for (a, b) in d1)
    # no asymmetries remain
    assert s1.asymmetries().count() == 0


def test_higher_order_path_graph(ray_session):
    # path 0-1-2-...-9: order-2 neighbors are exactly i±2
    n = 10
    f = np.arange(n - 1)
    ed = E.from_arrays(
        np.concatenate([f, f + 1]), np.concatenate([f + 1, f]), 1.0
    )
    g = RayGraph(E.resolve_isolates(ed, np.arange(n, dtype=np.int64)))
    got = set(_edge_dict(g.higher_order(2)))
    want = {(i, i + 2) for i in range(n - 2)} | {
        (i + 2, i) for i in range(n - 2)
    }
    assert got == want


def test_components_both_paths_match_brute(ray_session):
    rng = np.random.default_rng(4)
    g, ed = _rand_graph(rng, n=40, m=30)
    # brute union-find
    parent = {i: i for i in range(40)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in ed:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(40)}
    nc_want = len(set(want.values()))

    for mde in (5_000_000, 0):  # driver path / forced distributed path
        nc, labels = g.n_components(max_driver_edges=mde)
        got = {
            int(r["focal"]): int(r["component"])
            for r in labels.take_all()
        }
        assert nc == nc_want, mde
        assert got == want, mde


def test_lag_matches_dense_matmul(ray_session):
    rng = np.random.default_rng(5)
    n = 25
    g, ed = _rand_graph(rng, n=n, m=60, weighted=True)
    y = rng.random(n)
    W = np.zeros((n, n))
    for (a, b), w in ed.items():
        W[a, b] = w
    want = W @ y
    got = {
        int(r["focal"]): float(r["lag"])
        for r in g.lag(np.arange(n), y).take_all()
    }
    for i in range(n):
        assert abs(got.get(i, 0.0) - want[i]) < 1e-10, i


def test_remap_roundtrip(ray_session):
    rng = np.random.default_rng(6)
    g, ed = _rand_graph(rng)
    old = np.arange(30, dtype=np.int64)
    new = old * 7 + 3
    g2 = g.remap_ids(old, new).remap_ids(new, old)
    assert set(_edge_dict(g2)) == set(ed)

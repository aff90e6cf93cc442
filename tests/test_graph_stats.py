"""degree_assortativity / reciprocity vs dense numpy references."""

import math

import numpy as np
import pyarrow as pa
import ray.data

from libpysal_ray.builders.lattice import lat2graph
from libpysal_ray.core import edges as E
from libpysal_ray.core.graph import RayGraph
from libpysal_ray.spatial.stats import degree_assortativity, reciprocity


def _graph(f, n):
    t = E.edge_table(np.asarray(f, dtype=np.int64),
                     np.asarray(n, dtype=np.int64), 1.0)
    return RayGraph(ray.data.from_arrow(t).repartition(2))


def _assort_ref(f, n):
    f, n = np.asarray(f), np.asarray(n)
    deg = {i: int((f == i).sum()) for i in set(f) | set(n)}
    df = np.array([deg[i] for i in f], dtype=float)
    dn = np.array([deg[j] for j in n], dtype=float)
    m = len(f)
    num = m * (df * dn).sum() - df.sum() * dn.sum()
    va = m * (df * df).sum() - df.sum() ** 2
    vb = m * (dn * dn).sum() - dn.sum() ** 2
    return num / math.sqrt(va * vb)


def test_assortativity_star_graph(ray_session):
    # star: hub -> leaves and leaves -> hub; strongly disassortative
    hub, leaves = 0, list(range(1, 9))
    f = [hub] * 8 + leaves
    n = leaves + [hub] * 8
    row = degree_assortativity(_graph(f, n)).take_all()[0]
    assert row["m"] == 16
    assert abs(row["assort"] - _assort_ref(f, n)) < 1e-12
    assert row["assort"] < -0.9


def test_assortativity_lattice_and_regular(ray_session):
    g = lat2graph(5, 5, rook=True)
    edges = g._real_edges().take_all()
    f = [r["focal"] for r in edges]
    n = [r["neighbor"] for r in edges]
    row = degree_assortativity(g).take_all()[0]
    assert abs(row["assort"] - _assort_ref(f, n)) < 1e-12
    # degree-regular ring -> zero variance -> NaN
    ring_f = list(range(6)) + list(range(6))
    ring_n = [(i + 1) % 6 for i in range(6)] + [(i - 1) % 6
                                                for i in range(6)]
    row = degree_assortativity(_graph(ring_f, ring_n)).take_all()[0]
    assert math.isnan(row["assort"])


def test_assortativity_asymmetric_zero_outdeg(ray_session):
    # sink node 3 has no outgoing edges -> its out-degree is 0 on the
    # neighbor side (left-join null path)
    f = [0, 1, 2, 0]
    n = [1, 2, 3, 3]
    row = degree_assortativity(_graph(f, n)).take_all()[0]
    assert abs(row["assort"] - _assort_ref(f, n)) < 1e-12


def test_reciprocity_symmetric_and_partial(ray_session):
    g = lat2graph(4, 4, rook=True)
    row = reciprocity(g).take_all()[0]
    assert row["reciprocity"] == 1.0 and row["mutual"] == row["m"]
    # 2 mutual edges out of 5 directed
    f = [0, 1, 0, 2, 3]
    n = [1, 0, 2, 3, 4]
    row = reciprocity(_graph(f, n)).take_all()[0]
    assert row["m"] == 5 and row["mutual"] == 2
    assert row["reciprocity"] == 2.0 / 5.0


def test_reciprocity_none(ray_session):
    f = [0, 1, 2]
    n = [1, 2, 0]
    row = reciprocity(_graph(f, n)).take_all()[0]
    assert row["mutual"] == 0 and row["reciprocity"] == 0.0

"""moran_inference vs the classic Cliff & Ord closed forms (dense)."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from libpysal_ray.builders.lattice import lat2graph
from libpysal_ray.spatial.stats import moran_inference


def _ref(w, x):
    # esda.Moran-style analytic inference, float reference
    n = len(x)
    z = x - x.mean()
    s0 = w.sum()
    num = z @ w @ z
    den = (z * z).sum()
    mi = (n / s0) * num / den
    s1 = ((w + w.T) ** 2).sum() / 2.0
    s2 = ((w.sum(0) + w.sum(1)) ** 2).sum()
    e = -1.0 / (n - 1)
    var_norm = (n * n * s1 - n * s2 + 3 * s0 * s0) / (
        s0 * s0 * (n * n - 1)) - e * e
    b2 = n * (z ** 4).sum() / den ** 2
    var_rand = (
        n * ((n * n - 3 * n + 3) * s1 - n * s2 + 3 * s0 * s0)
        - b2 * ((n * n - n) * s1 - 2 * n * s2 + 6 * s0 * s0)
    ) / ((n - 1) * (n - 2) * (n - 3) * s0 * s0) - e * e
    return {
        "moran_i": mi, "e_i": e,
        "var_norm": var_norm, "z_norm": (mi - e) / math.sqrt(var_norm),
        "var_rand": var_rand, "z_rand": (mi - e) / math.sqrt(var_rand),
        "s1": s1, "s2": s2,
    }


def _attrs(x):
    return ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(len(x), dtype=np.int64)),
        "x": pa.array(np.asarray(x, dtype=np.int64)),
    })).repartition(3)


def test_inference_matches_dense(ray_session):
    g = lat2graph(6, 5, rook=True)
    rng = np.random.default_rng(13)
    x = rng.integers(0, 200, 30).astype(np.int64)
    row = moran_inference(g, _attrs(x)).take_all()[0]
    m, ids = g.to_dense()
    w = (m > 0).astype(float)
    want = _ref(w, x.astype(float))
    assert row["s1"] == int(want["s1"])
    assert row["s2"] == int(want["s2"])
    for k in ("moran_i", "e_i", "var_norm", "z_norm", "var_rand",
              "z_rand"):
        assert abs(row[k] - want[k]) < 1e-10, (k, row[k], want[k])
    assert row["var_norm"] > 0 and row["var_rand"] > 0


def test_inference_gradient_significant(ray_session):
    # a strong gradient must be detected: z-scores far above 1.96
    g = lat2graph(7, 7, rook=True)
    x = (np.arange(49) // 7).astype(np.int64) * 5
    row = moran_inference(g, _attrs(x)).take_all()[0]
    assert row["z_norm"] > 3 and row["z_rand"] > 3
    assert row["e_i"] == -1.0 / 48.0


def test_inference_guards(ray_session):
    g = lat2graph(3, 3, rook=True)
    with pytest.raises(ValueError, match="non-constant"):
        moran_inference(g, _attrs(np.full(9, 3)))
    with pytest.raises(ValueError, match="2\\^31"):
        moran_inference(g, _attrs(np.full(9, 1 << 40)))


def _geary_ref(w, x):
    n = len(x)
    z = x - x.mean()
    s0 = w.sum()
    den = (z * z).sum()
    sq = (w * (x[:, None] - x[None, :]) ** 2).sum()
    gc = ((n - 1) / (2 * s0)) * sq / den
    s1 = ((w + w.T) ** 2).sum() / 2.0
    s2 = ((w.sum(0) + w.sum(1)) ** 2).sum()
    var_norm = ((2 * s1 + s2) * (n - 1) - 4 * s0 * s0) / (
        2 * (n + 1) * s0 * s0)
    b2 = n * (z ** 4).sum() / den ** 2
    var_rand = (
        (n - 1) * s1 * (n * n - 3 * n + 3 - (n - 1) * b2)
        - 0.25 * (n - 1) * s2 * (n * n + 3 * n - 6 - (n * n - n + 2) * b2)
        + s0 * s0 * (n * n - 3 - (n - 1) ** 2 * b2)
    ) / (n * (n - 2) * (n - 3) * s0 * s0)
    return {
        "geary_c": gc,
        "var_norm": var_norm, "z_norm": (gc - 1) / math.sqrt(var_norm),
        "var_rand": var_rand, "z_rand": (gc - 1) / math.sqrt(var_rand),
    }


def test_geary_inference_matches_dense(ray_session):
    from libpysal_ray.spatial.stats import geary_inference

    g = lat2graph(6, 5, rook=True)
    rng = np.random.default_rng(17)
    x = rng.integers(0, 200, 30).astype(np.int64)
    row = geary_inference(g, _attrs(x)).take_all()[0]
    m, ids = g.to_dense()
    want = _geary_ref((m > 0).astype(float), x.astype(float))
    for k in ("geary_c", "var_norm", "z_norm", "var_rand", "z_rand"):
        assert abs(row[k] - want[k]) < 1e-10, (k, row[k], want[k])
    assert row["e_c"] == 1.0 and row["var_norm"] > 0


def test_geary_inference_gradient(ray_session):
    from libpysal_ray.spatial.stats import geary_inference

    g = lat2graph(7, 7, rook=True)
    x = (np.arange(49) // 7).astype(np.int64) * 5
    row = geary_inference(g, _attrs(x)).take_all()[0]
    # strong positive autocorrelation: C << 1, z-scores well negative
    assert row["geary_c"] < 0.6
    assert row["z_norm"] < -3 and row["z_rand"] < -3

"""Moran's I / Geary's C vs classic float-formula references."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from libpysal_ray.builders.lattice import lat2graph
from libpysal_ray.spatial.stats import spatial_autocorr


def _classic(m, x):
    n = len(x)
    z = x - x.mean()
    s0 = m.sum()
    num = z @ m @ z
    moran = (n / s0) * num / (z @ z)
    d = x[:, None] - x[None, :]
    geary = ((n - 1) / (2 * s0)) * (m * d * d).sum() / (z @ z)
    return moran, geary


def test_autocorr_matches_classic(ray_session):
    g = lat2graph(5, 6, rook=True)
    rng = np.random.default_rng(5)
    x = rng.integers(0, 100, 30).astype(np.int64)
    attrs = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(30, dtype=np.int64)),
        "x": pa.array(x),
    })).repartition(3)
    row = spatial_autocorr(g, attrs).take_all()[0]
    m, ids = g.to_dense()
    em, ec = _classic((m > 0).astype(float), x.astype(float))
    assert abs(row["moran_i"] - em) < 1e-12
    assert abs(row["geary_c"] - ec) < 1e-12
    assert row["s0"] == int((m > 0).sum())


def test_autocorr_perfect_gradient_positive(ray_session):
    # row-gradient on a lattice -> strong positive autocorrelation
    g = lat2graph(6, 6, rook=True)
    x = (np.arange(36) // 6).astype(np.int64) * 10
    attrs = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(36, dtype=np.int64)),
        "x": pa.array(x),
    }))
    row = spatial_autocorr(g, attrs).take_all()[0]
    assert row["moran_i"] > 0.5 and row["geary_c"] < 0.5


def test_autocorr_guards(ray_session):
    g = lat2graph(3, 3, rook=True)
    const = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(9, dtype=np.int64)),
        "x": pa.array(np.full(9, 7, dtype=np.int64)),
    }))
    with pytest.raises(ValueError, match="constant"):
        spatial_autocorr(g, const)
    # magnitudes past the int64 narrow guard auto-route to the wide
    # (128-bit limb) path and still produce the exact statistic
    rng = np.random.default_rng(11)
    xb = (1 << 40) + rng.integers(0, 1000, 9).astype(np.int64)
    big = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(9, dtype=np.int64)),
        "x": pa.array(xb),
    }))
    row = spatial_autocorr(g, big).take_all()[0]
    m, _ = lat2graph(3, 3, rook=True).to_dense()
    em, ec = _classic((m > 0).astype(float), xb.astype(float))
    # tolerance bounded by the FLOAT reference's precision at 2^40
    # magnitude (engine side is exact integers; _classic subtracts a
    # ~1e12 mean in float64, losing ~1e-8 relative)
    assert abs(row["moran_i"] - em) < 1e-6
    assert abs(row["geary_c"] - ec) < 1e-6
    # truly un-representable z (>= 2^62) still raises loudly
    huge = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(9, dtype=np.int64)),
        "x": pa.array(
            np.r_[np.full(8, 0, dtype=np.int64), (1 << 62) - 1]),
    }))
    with pytest.raises(ValueError, match="rescale|overflow|int64"):
        spatial_autocorr(g, huge)


def test_id_universe_mismatch_raises(ray_session):
    """Attrs missing a graph node must raise, not silently drop the
    node's edges from the sums (ADVICE r4 #3) — for every statistic
    whose attr attach is an inner join."""
    from libpysal_ray.spatial.stats import join_counts, moran_bv

    g = lat2graph(3, 3, rook=True)
    short = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(8, dtype=np.int64)),  # node 8 missing
        "x": pa.array((np.arange(8) % 2).astype(np.int64)),
    }))
    with pytest.raises(ValueError, match="missing from attrs"):
        spatial_autocorr(g, short)
    with pytest.raises(ValueError, match="missing from attrs"):
        join_counts(g, short)
    short_xy = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(8, dtype=np.int64)),
        "x": pa.array(np.arange(8, dtype=np.int64)),
        "y": pa.array(np.arange(8, dtype=np.int64)[::-1].copy()),
    }))
    with pytest.raises(ValueError, match="missing from attrs"):
        moran_bv(g, short_xy)
    # the per-node statistics share the guarded lag helper (code-review
    # r5: the guard originally landed on only 3 of the family)
    from libpysal_ray.spatial.stats import (
        general_g, getis_ord_g, lisa_quadrants, local_moran)
    for fn in (local_moran, getis_ord_g, lisa_quadrants, general_g):
        with pytest.raises(ValueError, match="missing from attrs"):
            fn(g, short)


def test_getis_and_general_g_overflow_guards(ray_session):
    """getis_ord_g: neighborhood/total sums that would wrap int64 raise
    before any Sum aggregate runs (ADVICE r4 #1). general_g: a legal
    per-term input whose (Σx)² exceeds int64 raises loudly instead of
    OverflowError at output build (ADVICE r4 #2)."""
    from libpysal_ray.spatial.stats import general_g, getis_ord_g

    g = lat2graph(3, 3, rook=True)
    big = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(9, dtype=np.int64)),
        "x": pa.array(np.full(9, (1 << 62) // 4, dtype=np.int64)),
    }))
    with pytest.raises(ValueError, match="overflow"):
        getis_ord_g(g, big)
    # xmax² · max(e,n) passes the per-term guard but (Σx)² > int64:
    # xmax = 2^29 over 9 nodes → per-term 2^58·24 < 2^62 is False…
    # use xmax = 2^28: per-term (2^56)·24 ≈ 2^60.6 < 2^62 passes,
    # Σx = 9·2^28 ≈ 2^31.2, (Σx)² ≈ 2^62.3 ≥ 2^62 → den guard fires.
    tricky = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(9, dtype=np.int64)),
        "x": pa.array(np.full(9, 1 << 28, dtype=np.int64)),
    }))
    with pytest.raises(ValueError, match="denominator"):
        general_g(g, tricky)


def test_local_moran_matches_classic(ray_session):
    from libpysal_ray.spatial.stats import local_moran

    g = lat2graph(5, 5, rook=True)
    rng = np.random.default_rng(9)
    x = rng.integers(0, 50, 25).astype(np.int64)
    attrs = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(25, dtype=np.int64)),
        "x": pa.array(x),
    })).repartition(3)
    got = {r["id"]: r["local_i"] for r in local_moran(g, attrs).take_all()}
    m, ids = g.to_dense()
    w = (m > 0).astype(float)
    z = x - x.mean()
    m2 = (z @ z) / len(z)
    exp = (z / m2) * (w @ z)
    for i in range(25):
        assert abs(got[i] - exp[i]) < 1e-9, i
    # Anselin identity: sum of local Morans = S0 * global I
    from libpysal_ray.spatial.stats import spatial_autocorr
    gi = spatial_autocorr(g, attrs).take_all()[0]
    assert abs(sum(got.values()) - gi["s0"] * gi["moran_i"]) < 1e-6


def test_join_counts_checkerboard_and_blocks(ray_session):
    from libpysal_ray.spatial.stats import join_counts

    g = lat2graph(4, 4, rook=True)
    ids = np.arange(16, dtype=np.int64)
    # checkerboard: every edge is BW
    cb = (((ids // 4) + (ids % 4)) % 2).astype(np.int64)
    attrs = ray.data.from_arrow(pa.table({
        "id": pa.array(ids), "x": pa.array(cb)}))
    row = join_counts(g, attrs).take_all()[0]
    assert row["s0"] == 48 and row["bw"] == 48
    assert row["bb"] == 0 and row["ww"] == 0
    # left-half block: BW only across the middle column boundary
    blk = (ids % 4 < 2).astype(np.int64)
    row = join_counts(g, ray.data.from_arrow(pa.table({
        "id": pa.array(ids), "x": pa.array(blk)}))).take_all()[0]
    assert row["bw"] == 8          # 4 rows x 1 crossing x 2 directions
    assert row["bb"] + row["ww"] + row["bw"] == 48
    with pytest.raises(Exception, match="0/1"):  # wrapped by Ray
        join_counts(g, ray.data.from_arrow(pa.table({
            "id": pa.array(ids), "x": pa.array(ids)}))).take_all()


def test_getis_ord_gstar_hotspot(ray_session):
    from libpysal_ray.spatial.stats import getis_ord_g

    g = lat2graph(5, 5, rook=True)
    ids = np.arange(25, dtype=np.int64)
    x = np.where(ids == 12, 100, 1).astype(np.int64)  # spike at center
    attrs = ray.data.from_arrow(pa.table({
        "id": pa.array(ids), "x": pa.array(x)}))
    gs = {r["id"]: r for r in getis_ord_g(g, attrs).take_all()}
    total = 124
    assert gs[12]["nbr_sum"] == 104            # spike + 4 neighbors
    assert gs[12]["g"] == 104 / total
    assert gs[0]["nbr_sum"] == 3               # corner: self + 2
    # non-star excludes self
    gns = {r["id"]: r for r in getis_ord_g(g, attrs,
                                           star=False).take_all()}
    assert gns[12]["nbr_sum"] == 4
    assert gns[7]["nbr_sum"] == 103            # neighbor of the spike


def test_general_g_closed_form(ray_session):
    from libpysal_ray.spatial.stats import general_g

    g = lat2graph(3, 3, rook=True)
    ids = np.arange(9, dtype=np.int64)
    x = (ids + 1).astype(np.int64)
    row = general_g(g, ray.data.from_arrow(pa.table({
        "id": pa.array(ids), "x": pa.array(x)}))).take_all()[0]
    m, _ = g.to_dense()
    w = (m > 0).astype(np.int64)
    num = int((w * (x[:, None] * x[None, :])).sum())
    den = int(x.sum()) ** 2 - int((x * x).sum())
    assert row["g_num"] == num and row["g_den"] == den
    assert row["general_g"] == num / den


def test_lisa_quadrants_gradient(ray_session):
    from libpysal_ray.spatial.stats import lisa_quadrants

    g = lat2graph(4, 4, rook=True)
    ids = np.arange(16, dtype=np.int64)
    x = (ids // 4).astype(np.int64) * 10    # row gradient
    quads = {r["id"]: r["quad"] for r in lisa_quadrants(
        g, ray.data.from_arrow(pa.table({
            "id": pa.array(ids), "x": pa.array(x)}))).take_all()}
    # top row all HH, bottom row all LL
    assert all(quads[i] == 1 for i in range(12, 16))
    assert all(quads[i] == 3 for i in range(0, 4))


def test_moran_bv_matches_classic_and_self_reduces(ray_session):
    from libpysal_ray.spatial.stats import moran_bv, spatial_autocorr

    g = lat2graph(5, 5, rook=True)
    rng = np.random.default_rng(17)
    ids = np.arange(25, dtype=np.int64)
    x = rng.integers(0, 50, 25).astype(np.int64)
    y = rng.integers(0, 50, 25).astype(np.int64)
    attrs = ray.data.from_arrow(pa.table({
        "id": pa.array(ids), "x": pa.array(x), "y": pa.array(y)}))
    row = moran_bv(g, attrs).take_all()[0]
    m, _ = g.to_dense()
    w = (m > 0).astype(float)
    zx, zy = x - x.mean(), y - y.mean()
    exp = (len(x) / w.sum()) * (zx @ w @ zy) / np.sqrt(
        (zx @ zx) * (zy @ zy))
    assert abs(row["moran_bv"] - exp) < 1e-12
    # x vs x reduces to univariate Moran's I
    attrs_xx = ray.data.from_arrow(pa.table({
        "id": pa.array(ids), "x": pa.array(x), "y": pa.array(x)}))
    bv = moran_bv(g, attrs_xx).take_all()[0]
    uni = spatial_autocorr(g, ray.data.from_arrow(pa.table({
        "id": pa.array(ids), "x": pa.array(x)}))).take_all()[0]
    assert abs(bv["moran_bv"] - uni["moran_i"]) < 1e-12


def test_skater_regions_two_plateaus(ray_session):
    from libpysal_ray.spatial.stats import skater_regions

    # 4x6 lattice, left half value 0, right half 100 -> the ONLY heavy
    # MST edge crosses the middle, so k=2 recovers the two halves
    g = lat2graph(4, 6, rook=True)
    ids = np.arange(24, dtype=np.int64)
    x = np.where(ids % 6 < 3, 0, 100).astype(np.int64)
    attrs = ray.data.from_arrow(pa.table({
        "id": pa.array(ids), "x": pa.array(x)}))
    out = {r["id"]: r["region"] for r in skater_regions(
        g, attrs, n_regions=2).take_all()}
    left = {out[i] for i in ids if i % 6 < 3}
    right = {out[i] for i in ids if i % 6 >= 3}
    assert len(left) == 1 and len(right) == 1 and left != right
    # k=1 -> single region
    out1 = {r["region"] for r in skater_regions(
        g, attrs, n_regions=1).take_all()}
    assert len(out1) == 1
    # k=4 -> exactly 4 contiguous regions
    out4 = {r["id"]: r["region"] for r in skater_regions(
        g, attrs, n_regions=4).take_all()}
    assert len(set(out4.values())) == 4

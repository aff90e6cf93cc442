"""Wide (beyond-int64) exact regime of the ESDA statistics."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from libpysal_ray.builders.lattice import lat2graph
from libpysal_ray.spatial.stats import (
    _prod_sum_exact,
    local_moran,
    spatial_autocorr,
)


def test_prod_sum_exact_fuzz():
    rng = np.random.default_rng(5)
    for _ in range(100):
        n = int(rng.integers(1, 300))
        mag = int(rng.integers(1, 62))
        a = rng.integers(-(1 << mag), 1 << mag, n, dtype=np.int64)
        b = rng.integers(-(1 << mag), 1 << mag, n, dtype=np.int64)
        assert _prod_sum_exact(a, b) == sum(
            int(x) * int(y) for x, y in zip(a, b)
        )
    a = np.array([(1 << 62) - 1, -(1 << 62) + 1, 0], dtype=np.int64)
    b = np.array([(1 << 62) - 1, (1 << 62) - 1, 9], dtype=np.int64)
    assert _prod_sum_exact(a, b) == sum(
        int(x) * int(y) for x, y in zip(a, b)
    )


def _attrs(vals):
    return ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(len(vals), dtype=np.int64)),
        "x": pa.array(np.asarray(vals, dtype=np.int64)),
    }))


@pytest.fixture(scope="module")
def rook5(ray_session):
    return lat2graph(5, 5, rook=True)


def test_local_moran_wide_matches_narrow(rook5):
    rng = np.random.default_rng(2)
    vals = rng.integers(0, 50, 25)
    narrow = local_moran(rook5, _attrs(vals)).to_pandas().sort_values(
        "id").reset_index(drop=True)
    wide = local_moran(rook5, _attrs(vals), force_wide=True).to_pandas(
    ).sort_values("id").reset_index(drop=True)
    assert narrow[["z", "lag_z"]].equals(wide[["z", "lag_z"]])
    # different (documented) float pinning: allclose, not bit-equal
    assert np.allclose(narrow["local_i"], wide["local_i"], rtol=1e-12)


def test_local_moran_wide_layout_invariant(rook5, ray_session):
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 99, 25)
    outs = []
    for parts in (1, 4):
        a = _attrs(vals).repartition(parts)
        outs.append(
            local_moran(rook5, a, force_wide=True).to_pandas()
            .sort_values("id").reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])  # bit-equal across block layouts


def test_local_moran_auto_wide_beyond_int64(rook5):
    # x ~ 2^40: n*z*lag and sum(z^2) blow int64, so the narrow guard
    # would previously raise — the wide path must now engage and match
    # an unbounded-int reference exactly
    rng = np.random.default_rng(11)
    vals = rng.integers(1 << 39, 1 << 40, 25)
    out = local_moran(rook5, _attrs(vals)).to_pandas().sort_values(
        "id").reset_index(drop=True)
    n = 25
    sx = int(vals.sum())
    z = {i: n * int(vals[i]) - sx for i in range(n)}
    den = sum(v * v for v in z.values())
    nbrs = {i: [] for i in range(n)}
    for i in range(n):
        r, c = divmod(i, 5)
        for rr, cc in ((r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1)):
            if 0 <= rr < 5 and 0 <= cc < 5:
                nbrs[i].append(rr * 5 + cc)
    for _, row in out.iterrows():
        i = int(row["id"])
        lag = sum(z[j] for j in nbrs[i])
        assert int(row["z"]) == z[i]
        assert int(row["lag_z"]) == lag
        want = (
            np.float64(n) * np.float64(z[i]) * np.float64(lag)
            / np.float64(den)
        )
        assert row["local_i"] == want  # identical pinned float chain


def test_spatial_autocorr_wide_matches_narrow(rook5):
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 50, 25)
    narrow = spatial_autocorr(rook5, _attrs(vals)).to_pandas().iloc[0]
    wide = spatial_autocorr(
        rook5, _attrs(vals), force_wide=True
    ).to_pandas().iloc[0]
    # exact integers serialize as decimal strings in the wide regime
    assert int(wide["moran_num"]) == int(narrow["moran_num"])
    assert int(wide["sq_diff"]) == int(narrow["sq_diff"])
    assert int(wide["den"]) == int(narrow["den"])
    assert wide["moran_i"] == narrow["moran_i"]
    assert wide["geary_c"] == narrow["geary_c"]


def test_spatial_autocorr_auto_wide_beyond_int64(rook5):
    rng = np.random.default_rng(13)
    vals = rng.integers(1 << 39, 1 << 40, 25)
    out = spatial_autocorr(rook5, _attrs(vals)).to_pandas().iloc[0]
    n = 25
    sx = int(vals.sum())
    z = [n * int(v) - sx for v in vals]
    den = sum(v * v for v in z)
    assert int(out["den"]) == den  # > int64, exact via limb sums
    assert den >= (1 << 63)
    num, sq, s0 = 0, 0, 0
    for i in range(n):
        r, c = divmod(i, 5)
        for rr, cc in ((r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1)):
            if 0 <= rr < 5 and 0 <= cc < 5:
                j = rr * 5 + cc
                s0 += 1
                num += z[i] * z[j]
                d = int(vals[i]) - int(vals[j])
                sq += d * d
    assert int(out["moran_num"]) == num
    assert int(out["sq_diff"]) == sq
    assert int(out["s0"]) == s0
    assert out["moran_i"] == float(
        np.float64(n * num) / np.float64(s0 * den)
    )


def test_lee_l_matches_numpy_reference(rook5):
    from libpysal_ray.spatial.stats import lee_l

    rng = np.random.default_rng(11)
    xv = rng.integers(0, 50, 25)
    yv = rng.integers(0, 50, 25)
    attrs = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(25, dtype=np.int64)),
        "x": pa.array(xv.astype(np.int64)),
        "y": pa.array(yv.astype(np.int64)),
    }))
    got = lee_l(rook5, attrs).to_pandas().iloc[0]

    # independent dense reference: Lee (2001) eq. 18 with binary W
    W = np.zeros((25, 25))
    for r in range(5):
        for c in range(5):
            i = r * 5 + c
            for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                rr, cc = r + dr, c + dc
                if 0 <= rr < 5 and 0 <= cc < 5:
                    W[i, rr * 5 + cc] = 1.0
    n = 25
    dx = xv - xv.mean()
    dy = yv - yv.mean()
    lx = W @ dx
    ly = W @ dy
    ref = (n / (W.sum(axis=1) ** 2).sum()) * (lx * ly).sum() / (
        np.sqrt((dx * dx).sum()) * np.sqrt((dy * dy).sum())
    )
    assert np.isclose(float(got["lee_f"]), ref, rtol=1e-12)
    # exact integer identities with doubled deviations
    assert int(got["lee_num"]) == int(round((lx * ly).sum() * n * n))
    assert int(got["s02"]) == int((W.sum(axis=1) ** 2).sum())

    # forced-wide regime must agree exactly on the integer sums
    wide = lee_l(rook5, attrs, force_wide=True).to_pandas().iloc[0]
    assert wide["lee_num"] == got["lee_num"]
    assert wide["ssx"] == got["ssx"]
    assert wide["ssy"] == got["ssy"]
    assert np.isclose(float(wide["lee_f"]), float(got["lee_f"]), rtol=1e-12)


def test_sigma_convergence_and_shorrocks(ray_session):
    from libpysal_ray.spatial.stats import (
        shorrocks_index,
        sigma_convergence,
    )

    attrs = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(4, dtype=np.int64)),
        "x0": pa.array([0, 10, 20, 30], pa.int64()),
        "x1": pa.array([14, 15, 15, 16], pa.int64()),
    }))
    out = sigma_convergence(attrs).to_pandas().iloc[0]
    # v0 = 4*(0+100+400+900) - 60^2 = 5600 - 3600 = 2000
    # v1 = 4*(196+225+225+256) - 60^2 = 3608 - 3600 = 8
    assert out["v0"] == "2000" and out["v1"] == "8"
    assert np.isclose(out["ratio_f"], 8.0 / 2000.0)

    # transition matrix with bins [15]: classes by searchsorted-right
    # x0: [0,10] -> 0, [20,30] -> 1 ; x1: [14] -> 0, [15,15,16] -> 1
    # n00=1 n01=1 n10=0 n11=2; r0=2, r1=2; trace = 1/2 + 2/2 = 1.5
    # S = (2 - 1.5)/(2-1) = 0.5
    sh = shorrocks_index(attrs, class_bins=[15]).to_pandas().iloc[0]
    assert sh["m_eff"] == 2
    assert int(sh["trace_num"]) == 1 * 2 + 2 * 2  # n00*r1 + n11*r0
    assert int(sh["den"]) == 4
    assert np.isclose(sh["shorrocks_f"], 0.5)


def test_quadrat_chi2_closed_form(ray_session):
    from libpysal_ray.spatial.pointpat import quadrat_chi2

    # 4 points all in one of 4 cells: chi2 = (4*16 - 16)/4 = 12
    pts = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(4, dtype=np.int64)),
        "x": pa.array([1.0, 2.0, 3.0, 4.0]),
        "y": pa.array([1.0, 2.0, 3.0, 4.0]),
    }))
    out = quadrat_chi2(pts, cell=10.0, grid=20.0).to_pandas().iloc[0]
    assert out["m"] == 4 and out["sum_c2"] == 16
    assert out["chi_num"] == 48 and out["dof"] == 3
    assert np.isclose(out["chi2_f"], 12.0)
    # perfectly uniform: one point per cell -> chi2 = 0
    pts2 = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(4, dtype=np.int64)),
        "x": pa.array([5.0, 15.0, 5.0, 15.0]),
        "y": pa.array([5.0, 5.0, 15.0, 15.0]),
    }))
    out2 = quadrat_chi2(pts2, cell=10.0, grid=20.0).to_pandas().iloc[0]
    assert out2["chi_num"] == 0 and out2["chi2_f"] == 0.0


def test_join_counts_inference_vs_enumeration(ray_session):
    from fractions import Fraction
    from itertools import combinations

    from libpysal_ray.builders.lattice import lat2graph
    from libpysal_ray.spatial.stats import join_counts_inference

    # 2x3 rook lattice, 2 ones among 6 nodes: enumerate ALL C(6,2)
    # assignments and compare the analytic rational moments exactly
    g = lat2graph(2, 3, rook=True)
    n, n1 = 6, 2
    xv = np.array([1, 1, 0, 0, 0, 0], dtype=np.int64)
    attrs = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "x": pa.array(xv),
    }))
    out = join_counts_inference(g, attrs).to_pandas().iloc[0]

    edges = []
    for r in range(2):
        for c in range(3):
            i = r * 3 + c
            for rr, cc in ((r + 1, c), (r, c + 1)):
                if rr < 2 and cc < 3:
                    edges += [(i, rr * 3 + cc), (rr * 3 + cc, i)]
    bs = []
    for ones in combinations(range(n), n1):
        x = np.zeros(n, dtype=np.int64)
        x[list(ones)] = 1
        bs.append(sum(int(x[i] * x[j]) for i, j in edges))
    e_ref = Fraction(sum(bs), len(bs))
    v_ref = Fraction(sum(b * b for b in bs), len(bs)) - e_ref * e_ref
    assert Fraction(int(out["e_num"]), int(out["e_den"])) == e_ref
    assert Fraction(int(out["var_num"]), int(out["var_den"])) == v_ref
    # the observed bb for this x: nodes 0,1 adjacent -> 2 directed
    assert out["bb"] == 2


def test_local_moran_inference_vs_enumeration(ray_session):
    from fractions import Fraction
    from itertools import permutations

    from libpysal_ray.builders.lattice import lat2graph
    from libpysal_ray.spatial.stats import local_moran_inference

    # 2x3 rook lattice: full 720-permutation enumeration of the
    # randomization distribution vs the analytic rational moments
    n = 6
    vals = [3, 1, 4, 1, 5, 9]
    g = lat2graph(2, 3, rook=True)
    attrs = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "x": pa.array(np.asarray(vals, dtype=np.int64)),
    }))
    out = local_moran_inference(g, attrs).to_pandas().set_index("id")

    nbrs = {i: [] for i in range(n)}
    for r in range(2):
        for c in range(3):
            i = r * 3 + c
            for rr, cc in ((r + 1, c), (r - 1, c), (r, c + 1), (r, c - 1)):
                if 0 <= rr < 2 and 0 <= cc < 3:
                    nbrs[i].append(rr * 3 + cc)
    sx = sum(vals)
    es = [Fraction(0)] * n
    e2s = [Fraction(0)] * n
    perms = list(permutations(vals))
    for p in perms:
        zd = [n * v - sx for v in p]
        s2 = sum(z * z for z in zd)
        for i in range(n):
            lag = sum(zd[j] for j in nbrs[i])
            ii = Fraction(n * zd[i] * lag, s2)
            es[i] += ii
            e2s[i] += ii * ii
    m = len(perms)
    for i in range(n):
        e_ref = es[i] / m
        v_ref = e2s[i] / m - e_ref * e_ref
        row = out.loc[i]
        assert Fraction(-int(row["deg"]), n - 1) == e_ref
        assert Fraction(int(row["var_num"]), int(row["var_den"])) == v_ref


def test_ols_resid_moran_vs_numpy(ray_session):
    from fractions import Fraction

    from libpysal_ray.builders.lattice import lat2graph
    from libpysal_ray.spatial.stats import ols_resid_moran

    rng = np.random.default_rng(23)
    n = 25
    xv = rng.integers(0, 50, n).astype(np.int64)
    yv = (2 * xv + rng.integers(-10, 10, n)).astype(np.int64)
    g = lat2graph(5, 5, rook=True)
    attrs = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "x": pa.array(xv),
        "y": pa.array(yv),
    }))
    out = ols_resid_moran(g, attrs).to_pandas().iloc[0]
    # numpy reference: lstsq slope + dense Moran of residuals
    A = np.stack([np.ones(n), xv.astype(float)], axis=1)
    coef, *_ = np.linalg.lstsq(A, yv.astype(float), rcond=None)
    assert np.isclose(out["beta_f"], coef[1], rtol=1e-10)
    e = yv - A @ coef
    W = np.zeros((n, n))
    for r in range(5):
        for c in range(5):
            i = r * 5 + c
            for rr, cc in ((r + 1, c), (r - 1, c), (r, c + 1), (r, c - 1)):
                if 0 <= rr < 5 and 0 <= cc < 5:
                    W[i, rr * 5 + cc] = 1.0
    i_ref = (n / W.sum()) * (e @ W @ e) / (e @ e)
    assert np.isclose(out["moran_f"], i_ref, rtol=1e-10)
    # the slope rational is exactly the normal-equation ratio
    sx, sy = int(xv.sum()), int(yv.sum())
    sxx = int((xv * xv).sum())
    sxy = int((xv * yv).sum())
    assert Fraction(int(out["bnum"]), int(out["bden"])) == Fraction(
        n * sxy - sx * sy, n * sxx - sx * sx
    )

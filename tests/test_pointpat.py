"""ripley_k / quadrat_counts / nn_pairs / knox vs brute-force dense
references on small random point sets (tile-boundary coverage is the
thing under test — the brute force has no tiles)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from libpysal_ray.spatial.pointpat import (
    knox,
    nn_pairs,
    quadrat_counts,
    ripley_k,
)


def _pts(n, seed, lo=0, hi=200, tmax=None):
    rng = np.random.default_rng(seed)
    x = rng.integers(lo, hi, n).astype(np.float64)
    y = rng.integers(lo, hi, n).astype(np.float64)
    cols = {
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "x": pa.array(x),
        "y": pa.array(y),
    }
    t = None
    if tmax is not None:
        t = rng.integers(0, tmax, n).astype(np.float64)
        cols["t"] = pa.array(t)
    return ray.data.from_arrow(pa.table(cols)).repartition(3), x, y, t


def test_ripley_k_matches_brute(ray_session):
    ds, x, y, _ = _pts(80, 7)
    radii = [10.0, 35.0, 90.0]
    out = {r["r"]: r for r in ripley_k(ds, radii, area=4e4).take_all()}
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    off = ~np.eye(80, dtype=bool)
    for r in radii:
        want = int(((d2 <= r * r) & off).sum())
        assert out[r]["pair_count"] == want
        assert out[r]["k_f"] == 4e4 * float(want) / float(80 * 79)


def test_ripley_k_guards(ray_session):
    ds, *_ = _pts(5, 1)
    with pytest.raises(ValueError, match="positive radii"):
        ripley_k(ds, [], area=1.0)
    one = ray.data.from_arrow(pa.table({
        "id": pa.array([0], pa.int64()),
        "x": pa.array([0.0]), "y": pa.array([0.0]),
    }))
    with pytest.raises(ValueError, match="n >= 2"):
        ripley_k(one, [1.0], area=1.0)


def test_quadrat_counts_match_brute(ray_session):
    ds, x, y, _ = _pts(60, 3)
    rows = quadrat_counts(ds, cell=50.0).take_all()
    got = {(r["cell_r"], r["cell_c"]): r["cnt"] for r in rows}
    want: dict = {}
    for xi, yi in zip(x, y):
        k = (int(np.floor(yi / 50.0)), int(np.floor(xi / 50.0)))
        want[k] = want.get(k, 0) + 1
    assert got == want


def test_nn_pairs_match_brute(ray_session):
    ds, x, y, _ = _pts(50, 9)
    rows = nn_pairs(ds).take_all()
    assert len(rows) == 50
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    np.fill_diagonal(d2, np.inf)
    for r in rows:
        i = r["focal"]
        best = d2[i].min()
        # tie order: (distance, neighbor id)
        want_nbr = int(np.flatnonzero(d2[i] == best).min())
        assert r["neighbor"] == want_nbr
        assert r["d2"] == int(best)


def test_nn_pairs_duplicate_coords(ray_session):
    # two coincident points: each is the other's nn at d2=0
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([0, 1, 2], pa.int64()),
        "x": pa.array([5.0, 5.0, 100.0]),
        "y": pa.array([5.0, 5.0, 100.0]),
    }))
    got = {r["focal"]: r for r in nn_pairs(ds).take_all()}
    assert got[0]["neighbor"] == 1 and got[0]["d2"] == 0
    assert got[1]["neighbor"] == 0 and got[1]["d2"] == 0
    assert got[2]["d2"] == (95 ** 2) * 2


def test_knox_matches_brute(ray_session):
    ds, x, y, t = _pts(70, 13, tmax=5000)
    delta, tau = 40.0, 600.0
    row = knox(ds, delta=delta, tau=tau).take_all()[0]
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    dt = np.abs(t[:, None] - t[None, :])
    off = ~np.eye(70, dtype=bool)
    sp = (d2 <= delta * delta) & off
    tp = (dt <= tau) & off
    assert row["n"] == 70
    assert row["pairs_space"] == int(sp.sum())
    assert row["pairs_time"] == int(tp.sum())
    assert row["pairs_both"] == int((sp & tp).sum())
    assert row["expected_f"] == (
        float(sp.sum()) * float(tp.sum()) / float(70 * 69)
    )


def test_knox_boundary_times(ray_session):
    # points straddling a temporal tile boundary at exactly tau apart
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([0, 1, 2], pa.int64()),
        "x": pa.array([0.0, 1.0, 2.0]),
        "y": pa.array([0.0, 0.0, 0.0]),
        "t": pa.array([199.0, 201.0, 399.0]),  # 2tau cell = 200
    }))
    row = knox(ds, delta=10.0, tau=100.0).take_all()[0]
    # |199-201|<=100, |201-399|<=100 fails (198), |199-399|=200 fails
    assert row["pairs_time"] == 2
    assert row["pairs_both"] == 2


def test_variogram_matches_brute(ray_session):
    from libpysal_ray.spatial.pointpat import variogram

    rng = np.random.default_rng(17)
    n = 60
    x = rng.integers(0, 150, n).astype(np.float64)
    y = rng.integers(0, 150, n).astype(np.float64)
    v = rng.integers(0, 100, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "x": pa.array(x), "y": pa.array(y), "v": pa.array(v),
    })).repartition(3)
    radii = [20.0, 60.0, 120.0]
    rows = {r["bin"]: r for r in variogram(ds, radii).take_all()}
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    dv2 = (v[:, None].astype(object) - v[None, :].astype(object)) ** 2
    off = ~np.eye(n, dtype=bool)
    lo2 = [0.0] + [r * r for r in radii[:-1]]
    for k, r in enumerate(radii):
        m = off & (d2 > lo2[k]) & (d2 <= r * r)
        assert rows[k]["pair_count"] == int(m.sum())
        assert int(rows[k]["sq_sum"]) == int(dv2[m].sum())
        if m.sum():
            assert rows[k]["gamma_f"] == (
                float(int(dv2[m].sum())) / float(2 * int(m.sum()))
            )
        assert rows[k]["r_lo"] == ([0.0] + radii[:-1])[k]
        assert rows[k]["r_hi"] == r


def test_variogram_exact_past_int64(ray_session):
    from libpysal_ray.spatial.pointpat import variogram

    # marks ~2^40: per-pair dv^2 ~2^80 — decimal strings must stay exact
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([0, 1], pa.int64()),
        "x": pa.array([0.0, 3.0]), "y": pa.array([0.0, 4.0]),
        "v": pa.array([0, 1 << 40], pa.int64()),
    }))
    row = variogram(ds, [10.0]).take_all()[0]
    assert row["pair_count"] == 2
    assert int(row["sq_sum"]) == 2 * (1 << 80)


def test_cross_k_matches_brute(ray_session):
    from libpysal_ray.spatial.pointpat import cross_k

    rng = np.random.default_rng(23)
    na, nb = 40, 55
    ax = rng.integers(0, 200, na).astype(np.float64)
    ay = rng.integers(0, 200, na).astype(np.float64)
    bx = rng.integers(0, 200, nb).astype(np.float64)
    by = rng.integers(0, 200, nb).astype(np.float64)
    A = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(na, dtype=np.int64)),
        "x": pa.array(ax), "y": pa.array(ay),
    })).repartition(2)
    B = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(nb, dtype=np.int64)),
        "x": pa.array(bx), "y": pa.array(by),
    })).repartition(3)
    radii = [15.0, 50.0, 120.0]
    out = {r["r"]: r for r in cross_k(A, B, radii, area=4e4).take_all()}
    d2 = (ax[:, None] - bx[None, :]) ** 2 + (ay[:, None] - by[None, :]) ** 2
    for r in radii:
        want = int((d2 <= r * r).sum())
        assert out[r]["pair_count"] == want
        assert out[r]["k_f"] == 4e4 * float(want) / float(na * nb)


def test_centrography_matches_brute(ray_session):
    from libpysal_ray.spatial.pointpat import centrography

    ds, x, y, _ = _pts(45, 29)
    row = centrography(ds).take_all()[0]
    n = 45
    sx, sy = int(x.sum()), int(y.sum())
    ss = int((x * x + y * y).sum())
    num = n * ss - sx * sx - sy * sy
    assert row["n"] == n
    assert int(row["sum_x"]) == sx and int(row["sum_y"]) == sy
    assert int(row["sd2_num"]) == num
    assert row["mean_x_f"] == float(sx) / float(n)
    assert row["sd2_f"] == float(num) / float(n * n)
    # identity: sd2 == mean squared deviation from the mean
    want = (((x - x.mean()) ** 2 + (y - y.mean()) ** 2).mean())
    assert abs(row["sd2_f"] - want) < 1e-9


def test_colocation_matches_brute(ray_session):
    from libpysal_ray.spatial.pointpat import colocation

    rng = np.random.default_rng(37)
    n = 60
    x = rng.integers(0, 300, n).astype(np.float64)
    y = rng.integers(0, 300, n).astype(np.float64)
    cat = rng.choice(["a", "b", "c"], n)
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "x": pa.array(x), "y": pa.array(y), "cat": pa.array(cat),
    })).repartition(3)
    rows = colocation(ds).take_all()
    got = {(r["cat_a"], r["cat_b"]): r for r in rows}
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    np.fill_diagonal(d2, np.inf)
    want: dict = {}
    for i in range(n):
        best = d2[i].min()
        j = int(np.flatnonzero(d2[i] == best).min())
        k = (cat[i], cat[j])
        want[k] = want.get(k, 0) + 1
    totals = {c: int((cat == c).sum()) for c in ("a", "b", "c")}
    assert {k: v["cnt"] for k, v in got.items()} == want
    for (a, b), r in got.items():
        nb = totals[b] - (1 if a == b else 0)
        assert r["n_a"] == totals[a] and r["n_b"] == nb
        assert r["clq_f"] == (
            float(r["cnt"]) / float(totals[a])
            / (float(nb) / float(n - 1))
        )


def test_sd_ellipse_matches_brute(ray_session):
    from libpysal_ray.spatial.pointpat import sd_ellipse

    ds, x, y, _ = _pts(40, 43)
    row = sd_ellipse(ds).take_all()[0]
    n = 40
    sx, sy = int(x.sum()), int(y.sum())
    sxx = n * int((x * x).sum()) - sx * sx
    syy = n * int((y * y).sum()) - sy * sy
    sxy = n * int((x * y).sum()) - sx * sy
    assert int(row["sxx"]) == sxx
    assert int(row["syy"]) == syy
    assert int(row["sxy"]) == sxy
    assert row["tan2theta_f"] == 2.0 * float(sxy) / (float(sxx) - float(syy))


def test_nearest_join_matches_brute(ray_session):
    from libpysal_ray.spatial.pointpat import nearest_join

    rng = np.random.default_rng(51)
    na, nb = 45, 35
    ax = rng.integers(0, 300, na).astype(np.float64)
    ay = rng.integers(0, 300, na).astype(np.float64)
    bx = rng.integers(0, 300, nb).astype(np.float64)
    by = rng.integers(0, 300, nb).astype(np.float64)
    # overlapping id spaces on purpose: ids must NOT self-exclude
    A = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(na, dtype=np.int64)),
        "x": pa.array(ax), "y": pa.array(ay),
    })).repartition(2)
    B = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(nb, dtype=np.int64)),
        "x": pa.array(bx), "y": pa.array(by),
    })).repartition(3)
    rows = nearest_join(A, B).take_all()
    assert len(rows) == na
    d2 = (ax[:, None] - bx[None, :]) ** 2 + (ay[:, None] - by[None, :]) ** 2
    for r in rows:
        i = r["focal"]
        best = d2[i].min()
        want = int(np.flatnonzero(d2[i] == best).min())
        assert r["neighbor"] == want, (i, r, want)
        assert r["d2"] == int(best)


def test_nearest_join_coincident_cross_ids(ray_session):
    from libpysal_ray.spatial.pointpat import nearest_join

    # A point with the SAME id and SAME coords as a B point must still
    # join (distance 0) — no cross-set self-exclusion
    A = ray.data.from_arrow(pa.table({
        "id": pa.array([7], pa.int64()),
        "x": pa.array([10.0]), "y": pa.array([10.0]),
    }))
    B = ray.data.from_arrow(pa.table({
        "id": pa.array([7, 8], pa.int64()),
        "x": pa.array([10.0, 50.0]), "y": pa.array([10.0, 50.0]),
    }))
    rows = nearest_join(A, B).take_all()
    assert rows == [{"focal": 7, "neighbor": 7, "d2": 0}]


def test_nearest_join_sparse_b_forces_fallback(ray_session):
    from libpysal_ray.spatial.pointpat import nearest_join

    # B far away from every A point: local tiles have no candidates ->
    # every A point resolves through the broadcast fallback pass
    rng = np.random.default_rng(53)
    na = 30
    A = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(na, dtype=np.int64)),
        "x": pa.array(rng.integers(0, 50, na).astype(np.float64)),
        "y": pa.array(rng.integers(0, 50, na).astype(np.float64)),
    })).repartition(2)
    B = ray.data.from_arrow(pa.table({
        "id": pa.array([0, 1], pa.int64()),
        "x": pa.array([5000.0, 9000.0]),
        "y": pa.array([5000.0, 9000.0]),
    }))
    rows = nearest_join(A, B).take_all()
    assert len(rows) == na
    assert all(r["neighbor"] == 0 for r in rows)  # 5000 is closer


def test_gfj_functions_closed_form(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from libpysal_ray.spatial.pointpat import gfj_functions

    # 4 points on a 10-spaced row inside a 40x40 window
    pts = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(4, dtype=np.int64)),
        "x": pa.array([5.0, 15.0, 25.0, 35.0]),
        "y": pa.array([5.0, 5.0, 5.0, 5.0]),
    }))
    out = gfj_functions(
        pts, radii=[9.0, 10.0], grid=40.0, anchor_step=10.0
    ).to_pandas().sort_values("r").reset_index(drop=True)
    # every NN distance is exactly 10 -> G(9)=0, G(10)=4
    assert list(out["g_cnt"]) == [0, 4]
    assert out["n"].iloc[0] == 4 and out["m2"].iloc[0] == 16
    # anchors at (10i,10j), i,j in 0..3; points on y=5 row:
    # min distance from anchor rows y=0 and y=10 is 5 or sqrt(25+25);
    # from rows y=20,30 it's 15, 25 -> F(9) counts 8 anchors (d=5 or
    # sqrt(50)<=9? sqrt(50)=7.07 yes): anchors (0,0): nearest point
    # (5,5) d=sqrt(50); (10,0): (5,5)/(15,5) d=sqrt(50)... all 8
    # anchors in rows y=0,10 are within sqrt(50); rows 20/30 at 15+,25+
    assert list(out["f_cnt"]) == [8, 8]
    assert np.isclose(out["g_f"].iloc[1], 1.0)
    assert np.isclose(out["f_f"].iloc[0], 0.5)
    # J(9) = (1-0)/(1-0.5) = 2
    assert np.isclose(out["j_f"].iloc[0], 2.0)
    # J at G=1: (1-1)/(1-0.5) = 0
    assert np.isclose(out["j_f"].iloc[1], 0.0)


def test_two_step_fca_closed_form(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from libpysal_ray.spatial.access import two_step_fca

    # facility at (0,0) cap 2; demand at (0,0) p=3 and (10,0) p=5,
    # threshold 10: D = 8, R = 2e6 // 8 = 250000; both demands see it
    supply = ray.data.from_arrow(pa.table({
        "id": pa.array([100], pa.int64()),
        "x": pa.array([0.0]), "y": pa.array([0.0]),
        "s": pa.array([2], pa.int64()),
    }))
    demand = ray.data.from_arrow(pa.table({
        "id": pa.array([0, 1], pa.int64()),
        "x": pa.array([0.0, 10.0]), "y": pa.array([0.0, 0.0]),
        "p": pa.array([3, 5], pa.int64()),
    }))
    out = {r["id"]: (r["acc"], r["acc_f"]) for r in
           two_step_fca(supply, demand, threshold=10.0).take_all()}
    assert out[0] == (250000, 0.25) and out[1] == (250000, 0.25)

    # out-of-range demand gets a zero row, not a missing row
    demand2 = ray.data.from_arrow(pa.table({
        "id": pa.array([0, 7], pa.int64()),
        "x": pa.array([0.0, 500.0]), "y": pa.array([0.0, 0.0]),
        "p": pa.array([4, 9], pa.int64()),
    }))
    out2 = {r["id"]: r["acc"] for r in
            two_step_fca(supply, demand2, threshold=10.0).take_all()}
    assert out2[7] == 0 and out2[0] == 500000  # 2e6 // 4


def test_idw_interpolate_closed_form(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from libpysal_ray.spatial.access import idw_interpolate

    # anchor at origin; points at d2=1 (v=10) and d2=4 (v=40)
    anchors = ray.data.from_arrow(pa.table({
        "id": pa.array([0], pa.int64()),
        "x": pa.array([0.0]), "y": pa.array([0.0]),
    }))
    pts = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "x": pa.array([1.0, 2.0]), "y": pa.array([0.0, 0.0]),
        "v": pa.array([10, 40], pa.int64()),
    }))
    out = idw_interpolate(anchors, pts, radius=5.0, scale=100).to_pandas()
    # w1 = 100//1 = 100, w2 = 100//4 = 25
    # num = 10*100 + 40*25 = 2000, den = 125, idw = 16.0
    assert out["num"].iloc[0] == 2000 and out["den"].iloc[0] == 125
    assert np.isclose(out["idw_f"].iloc[0], 16.0)

    # coincident point takes the full scale weight (d2 clamp)
    pts2 = ray.data.from_arrow(pa.table({
        "id": pa.array([1], pa.int64()),
        "x": pa.array([0.0]), "y": pa.array([0.0]),
        "v": pa.array([7], pa.int64()),
    }))
    out2 = idw_interpolate(anchors, pts2, radius=5.0, scale=100).to_pandas()
    assert out2["num"].iloc[0] == 700 and out2["den"].iloc[0] == 100
    # empty neighborhood -> zero row
    pts3 = ray.data.from_arrow(pa.table({
        "id": pa.array([1], pa.int64()),
        "x": pa.array([100.0]), "y": pa.array([0.0]),
        "v": pa.array([7], pa.int64()),
    }))
    out3 = idw_interpolate(anchors, pts3, radius=5.0, scale=100).to_pandas()
    assert out3["den"].iloc[0] == 0 and out3["idw_f"].iloc[0] == 0.0


def test_percolation_profile_closed_form(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from libpysal_ray.spatial.pointpat import percolation_profile

    # 4 points on a line at 0, 10, 20, 100
    pts = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(4, dtype=np.int64)),
        "x": pa.array([0.0, 10.0, 20.0, 100.0]),
        "y": pa.array([0.0, 0.0, 0.0, 0.0]),
    }))
    out = percolation_profile(pts, radii=[5.0, 10.0, 100.0]).to_pandas()
    out = out.sort_values("r").reset_index(drop=True)
    # r=5: all singletons; r=10: {0,1,2} + {3}; r=100: one component
    assert list(out["n_components"]) == [4, 2, 1]
    assert list(out["giant"]) == [1, 3, 4]

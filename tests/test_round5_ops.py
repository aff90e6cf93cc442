"""Round-5 additions: general_g_inference, trend_surface, rank_markov,
location_quotient, paragraph_dedup — each vs an independent dense /
brute-force float or Python reference."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from libpysal_ray.builders.lattice import lat2graph


def _attrs(x):
    return ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(len(x), dtype=np.int64)),
        "x": pa.array(np.asarray(x, dtype=np.int64)),
    })).repartition(3)


def _g_ref(w, x):
    # esda.G-style analytic moments, float reference
    n = len(x)
    s0 = w.sum()
    s1 = ((w + w.T) ** 2).sum() / 2.0
    s2 = ((w.sum(0) + w.sum(1)) ** 2).sum()
    num = x @ w @ x
    den = x.sum() ** 2 - (x * x).sum()
    g = num / den
    e = s0 / (n * (n - 1))
    b0 = (n * n - 3 * n + 3) * s1 - n * s2 + 3 * s0 * s0
    b1 = -((n * n - n) * s1 - 2 * n * s2 + 6 * s0 * s0)
    b2 = -(2 * n * s1 - (n + 3) * s2 + 6 * s0 * s0)
    b3 = 4 * (n - 1) * s1 - 2 * (n + 1) * s2 + 8 * s0 * s0
    b4 = s1 - s2 + s0 * s0
    m1, m2 = x.sum(), (x * x).sum()
    m3, m4 = (x ** 3).sum(), (x ** 4).sum()
    eg2 = (b0 * m2 ** 2 + b1 * m4 + b2 * m1 ** 2 * m2 + b3 * m1 * m3
           + b4 * m1 ** 4) / (
        (m1 ** 2 - m2) ** 2 * n * (n - 1) * (n - 2) * (n - 3))
    var = eg2 - e * e
    return {"g": g, "e": e, "eg2": eg2, "var": var,
            "z": (g - e) / math.sqrt(var), "s1": s1, "s2": s2}


def test_general_g_inference_matches_dense(ray_session):
    from libpysal_ray.spatial.stats import general_g_inference

    g = lat2graph(6, 5, rook=True)
    rng = np.random.default_rng(7)
    x = rng.integers(1, 50, 30).astype(np.int64)
    row = general_g_inference(g, _attrs(x)).take_all()[0]
    m, _ = g.to_dense()
    want = _g_ref((m > 0).astype(float), x.astype(float))
    assert row["s1"] == int(want["s1"])
    assert row["s2"] == int(want["s2"])
    for k, rk in (("g_f", "g"), ("e_f", "e"), ("eg2_f", "eg2"),
                  ("var_f", "var"), ("z_f", "z")):
        assert abs(row[k] - want[rk]) < 1e-10, (k, row[k], want[rk])
    # exact rational consistency
    assert int(row["eg2_num"]) / int(row["eg2_den"]) == pytest.approx(
        want["eg2"], abs=1e-12
    )


def test_general_g_inference_rejects_constant(ray_session):
    from libpysal_ray.spatial.stats import general_g_inference

    g = lat2graph(4, 4, rook=True)
    with pytest.raises(ValueError):
        general_g_inference(g, _attrs(np.full(16, 3)))


def test_trend_surface_matches_lstsq(ray_session):
    from libpysal_ray.spatial.stats import trend_surface

    rng = np.random.default_rng(11)
    n = 200
    x = rng.integers(0, 1000, n)
    y = rng.integers(0, 1000, n)
    z = (2 * x - y + rng.integers(0, 50, n)) % 997
    pts = ray.data.from_arrow(pa.table({
        "x": pa.array(x.astype(np.int64)),
        "y": pa.array(y.astype(np.int64)),
        "z": pa.array(z.astype(np.int64)),
    })).repartition(4)
    row = trend_surface(pts).take_all()[0]
    A = np.column_stack([np.ones(n), x, y]).astype(float)
    coef, res, _, _ = np.linalg.lstsq(A, z.astype(float), rcond=None)
    assert abs(row["a_f"] - coef[0]) < 1e-6
    assert abs(row["b_f"] - coef[1]) < 1e-6
    assert abs(row["c_f"] - coef[2]) < 1e-6
    sse = ((A @ coef - z) ** 2).sum()
    assert abs(row["sse_f"] - sse) < 1e-4 * max(1.0, sse)
    # exact rational residual identity: sse_num/det >= 0
    assert int(row["sse_num"]) * int(row["det"]) >= 0


def test_trend_surface_singular_raises(ray_session):
    from libpysal_ray.spatial.stats import trend_surface

    pts = ray.data.from_arrow(pa.table({
        "x": pa.array(np.arange(10, dtype=np.int64)),
        "y": pa.array(np.arange(10, dtype=np.int64)),  # collinear
        "z": pa.array(np.arange(10, dtype=np.int64)),
    }))
    with pytest.raises(ValueError, match="singular"):
        trend_surface(pts)


def _rank_markov_ref(ids, x0, x1, k):
    n = len(ids)
    out = {}
    for tag, x in (("c0", x0), ("c1", x1)):
        order = np.lexsort((ids, x))
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.arange(n)
        out[tag] = rank * k // n
    cnt = {}
    for a, b in zip(out["c0"], out["c1"]):
        cnt[(int(a), int(b))] = cnt.get((int(a), int(b)), 0) + 1
    return cnt


def test_rank_markov_matches_brute(ray_session):
    from libpysal_ray.spatial.stats import rank_markov

    rng = np.random.default_rng(3)
    n = 300
    ids = np.arange(n, dtype=np.int64)
    # coarse scores -> many ties at every quintile boundary
    x0 = rng.integers(0, 7, n).astype(np.int64)
    x1 = rng.integers(0, 7, n).astype(np.int64)
    snap = ray.data.from_arrow(pa.table({
        "id": pa.array(ids), "x0": pa.array(x0), "x1": pa.array(x1),
    })).repartition(5)
    got = {
        (int(r["c0"]), int(r["c1"])): int(r["cnt"])
        for r in rank_markov(snap, n_classes=5).take_all()
    }
    assert got == _rank_markov_ref(ids, x0, x1, 5)


def test_rank_markov_distributed_tie_path(ray_session):
    """Force the prefix-sum fallback (max_boundary_ids=0) — result must
    be identical to the driver-gather path."""
    from libpysal_ray.spatial.stats import rank_markov

    rng = np.random.default_rng(5)
    n = 120
    ids = rng.permutation(n).astype(np.int64)
    x0 = rng.integers(0, 3, n).astype(np.int64)
    x1 = rng.integers(0, 3, n).astype(np.int64)
    snap = ray.data.from_arrow(pa.table({
        "id": pa.array(ids), "x0": pa.array(x0), "x1": pa.array(x1),
    })).repartition(4)
    a = {
        (int(r["c0"]), int(r["c1"])): int(r["cnt"])
        for r in rank_markov(snap, n_classes=4).take_all()
    }
    b = {
        (int(r["c0"]), int(r["c1"])): int(r["cnt"])
        for r in rank_markov(
            snap, n_classes=4, max_boundary_ids=0
        ).take_all()
    }
    assert a == b == _rank_markov_ref(ids, x0, x1, 4)


def test_location_quotient_matches_brute(ray_session):
    from libpysal_ray.spatial.inequality import location_quotient

    rng = np.random.default_rng(9)
    n = 500
    reg = rng.integers(0, 8, n).astype(np.int64)
    cat = rng.integers(0, 5, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "region": pa.array(reg), "cat": pa.array(cat),
    })).repartition(6)
    rows = location_quotient(ds).take_all()
    for r in rows:
        c = int(((reg == r["region"]) & (cat == r["cat"])).sum())
        rt = int((reg == r["region"]).sum())
        ct = int((cat == r["cat"]).sum())
        assert r["cnt"] == c
        assert r["lq_num"] == c * n
        assert r["lq_den"] == rt * ct
        assert r["lq_f"] == pytest.approx(
            (c / rt) / (ct / n), rel=1e-12
        )
    assert sum(r["cnt"] for r in rows) == n


def _para_ref(texts, w):
    seen = {}
    chunks = {}
    for d, txt in enumerate(texts):
        toks = txt.split(" ")
        cs = [" ".join(toks[i: i + w]) for i in range(0, len(toks), w)]
        chunks[d] = cs
        for i, c in enumerate(cs):
            seen.setdefault(c, (d, i))
    out = {}
    for d, cs in chunks.items():
        kept = [c for i, c in enumerate(cs) if seen[c] == (d, i)]
        if kept:
            out[d] = (" ".join(kept), len(kept))
    return out


def test_paragraph_dedup_matches_brute(ray_session):
    from libpysal_ray.text.dedup import paragraph_dedup

    rng = np.random.default_rng(17)
    vocab = ["alpha", "beta", "gamma", "delta"]
    texts = []
    for _ in range(60):
        toks = [vocab[i] for i in rng.integers(0, 4, rng.integers(1, 30))]
        texts.append(" ".join(toks))
    # exact duplicate docs and shared prefixes stress the winner rule
    texts[10] = texts[3]
    texts[20] = texts[3] + " " + texts[5]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(60, dtype=np.int64)),
        "text": pa.array(texts, pa.large_string()),
    })).repartition(5)
    got = {
        int(r["doc_id"]): (r["clean_text"], int(r["n_kept"]))
        for r in paragraph_dedup(ds, window=4).take_all()
    }
    assert got == _para_ref(texts, 4)


def test_paragraph_dedup_identical_docs(ray_session):
    from libpysal_ray.text.dedup import paragraph_dedup

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([5, 1, 9], pa.int64()),
        "text": pa.array(["a b c d e", "a b c d e", "a b c d e"],
                         pa.large_string()),
    }))
    rows = paragraph_dedup(ds, window=3).take_all()
    # lowest doc_id keeps everything; the other two vanish entirely
    assert len(rows) == 1
    assert rows[0]["doc_id"] == 1
    assert rows[0]["clean_text"] == "a b c d e"
    assert rows[0]["n_kept"] == 2


def test_gi_inference_matches_dense(ray_session):
    from libpysal_ray.spatial.stats import gi_inference

    g = lat2graph(6, 5, rook=True)
    rng = np.random.default_rng(21)
    x = rng.integers(1, 40, 30).astype(np.int64)
    rows = {int(r["id"]): r for r in gi_inference(g, _attrs(x)).take_all()}
    m, ids = g.to_dense()
    w = (m > 0).astype(float)
    n = 30
    m1, m2 = x.sum(), (x * x).sum()
    for i, node in enumerate(ids):
        r = rows[int(node)]
        deg = w[i].sum()
        lag = float(w[i] @ x)
        s1p = m1 - x[i]
        gi = lag / s1p
        e = deg / (n - 1)
        s2p = m2 - x[i] ** 2
        var = (deg * (n - 1 - deg) / ((n - 1) ** 2 * (n - 2))) * (
            ((n - 1) * s2p - s1p ** 2) / s1p ** 2
        )
        assert r["g_num"] == int(lag) and r["g_den"] == int(s1p)
        assert abs(r["g_f"] - gi) < 1e-12
        assert abs(r["e_f"] - e) < 1e-12
        assert abs(r["v_f"] - var) < 1e-12
        if var > 0:
            assert abs(r["z_f"] - (gi - e) / math.sqrt(var)) < 1e-10
    assert len(rows) == 30


def test_focal_mean_matches_brute(ray_session):
    from libpysal_ray.builders.raster import focal_mean

    rng = np.random.default_rng(2)
    nr, nc = 7, 6
    vals = rng.integers(-5, 100, (nr, nc)).astype(np.int64)
    nodata = -1
    vals[vals < 0] = nodata
    r, c = np.meshgrid(np.arange(nr), np.arange(nc), indexing="ij")
    cells = ray.data.from_arrow(pa.table({
        "row": pa.array(r.ravel().astype(np.int64)),
        "col": pa.array(c.ravel().astype(np.int64)),
        "value": pa.array(vals.ravel()),
    })).repartition(4)
    got = {
        (int(x["row"]), int(x["col"])): (int(x["num"]), int(x["den"]))
        for x in focal_mean(cells, nr, nc, nodata=nodata).take_all()
    }
    want = {}
    for i in range(nr):
        for j in range(nc):
            if vals[i, j] == nodata:
                continue
            win = [
                int(vals[a, b])
                for a in range(max(0, i - 1), min(nr, i + 2))
                for b in range(max(0, j - 1), min(nc, j + 2))
                if vals[a, b] != nodata
            ]
            want[(i, j)] = (sum(win), len(win))
    assert got == want


def test_bilinear_matches_scipy_style(ray_session):
    from libpysal_ray.builders.raster import bilinear_resample

    rng = np.random.default_rng(8)
    grid = rng.integers(0, 1000, (10, 10)).astype(np.int64)
    cell = 10
    xs = rng.integers(0, 100, 200).astype(np.int64)
    ys = rng.integers(0, 100, 200).astype(np.int64)
    pts = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(200, dtype=np.int64)),
        "x": pa.array(xs), "y": pa.array(ys),
    })).repartition(3)
    rows = {int(r["doc_id"]): r
            for r in bilinear_resample(pts, grid, cell=cell).take_all()}
    for i in range(200):
        x, y = int(xs[i]), int(ys[i])
        inside = 5 <= x < 95 and 5 <= y < 95
        assert (i in rows) == inside
        if not inside:
            continue
        fx, fy = (x - 5) / cell, (y - 5) / cell
        c0, r0 = int(fx), int(fy)
        tx, ty = fx - c0, fy - r0
        want = (
            (1 - tx) * (1 - ty) * grid[r0, c0]
            + tx * (1 - ty) * grid[r0, c0 + 1]
            + (1 - tx) * ty * grid[r0 + 1, c0]
            + tx * ty * grid[r0 + 1, c0 + 1]
        )
        got = rows[i]["val_num"] / rows[i]["val_den"]
        assert abs(got - want) < 1e-9
        assert rows[i]["val_den"] == cell * cell


def test_areal_interpolate_matches_brute(ray_session):
    from libpysal_ray.spatial.overlay import areal_interpolate

    # 4x4 unit-square zones; two 2x2 source squares (area16 = 64) on
    # half-integer corners, integer values
    def _sq(ids, x0s, y0s, w):
        xs = [[a, a + w, a + w, a, a] for a in x0s]
        ys = [[b, b, b + w, b + w, b] for b in y0s]
        return ray.data.from_arrow(pa.table({
            "polygon_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "xs": pa.array(xs, pa.list_(pa.float64())),
            "ys": pa.array(ys, pa.list_(pa.float64())),
        }))

    zones = _sq(range(16), [i % 4 for i in range(16)],
                [i // 4 for i in range(16)], 1.0)
    srcs = _sq([100, 101], [0.5, 1.75], [0.5, 1.75], 2.0)
    vals = ray.data.from_arrow(pa.table({
        "right_id": pa.array([100, 101], pa.int64()),
        "v": pa.array([80, 48], pa.int64()),
    }))
    got = {
        int(r["zone"]): (int(r["val_num"]), int(r["val_den"]),
                         float(r["val_f"]))
        for r in areal_interpolate(zones, srcs, vals,
                                   src_area16=64).take_all()
    }
    # brute force: rectangle intersection areas
    want = {}
    for z in range(16):
        zx, zy = z % 4, z // 4
        tot = 0
        for sid, (sx, sy), v in (
            (100, (0.5, 0.5), 80), (101, (1.75, 1.75), 48),
        ):
            w = max(0.0, min(zx + 1, sx + 2) - max(zx, sx))
            h = max(0.0, min(zy + 1, sy + 2) - max(zy, sy))
            tot += v * int(round(w * h * 16))
        if tot > 0:
            want[z] = (tot, 64, tot / 64)
    assert got == want
    # conservation: total transferred mass == sum of source values
    # (sources fully inside the zone frame)
    assert sum(n for n, _, _ in got.values()) == (80 + 48) * 64


def test_areal_interpolate_rejects_non_sixteenth(ray_session):
    from libpysal_ray.spatial.overlay import areal_interpolate

    def _poly(ids, coords):
        return ray.data.from_arrow(pa.table({
            "polygon_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "xs": pa.array([c[0] for c in coords],
                           pa.list_(pa.float64())),
            "ys": pa.array([c[1] for c in coords],
                           pa.list_(pa.float64())),
        }))

    zones = _poly([0], [([0.0, 1.0, 1.0, 0.0, 0.0],
                         [0.0, 0.0, 1.0, 1.0, 0.0])])
    srcs = _poly([1], [([0.1, 0.9, 0.9, 0.1, 0.1],
                        [0.1, 0.1, 0.9, 0.9, 0.1])])
    vals = ray.data.from_arrow(pa.table({
        "right_id": pa.array([1], pa.int64()),
        "v": pa.array([10], pa.int64()),
    }))
    with pytest.raises(Exception, match="sixteenth"):
        areal_interpolate(zones, srcs, vals, src_area16=16).take_all()


def test_raster_slope_matches_brute(ray_session):
    from libpysal_ray.builders.raster import raster_slope

    rng = np.random.default_rng(4)
    nr, nc = 8, 7
    vals = rng.integers(0, 200, (nr, nc)).astype(np.int64)
    vals[vals % 11 == 0] = -1  # scattered nodata
    r, c = np.meshgrid(np.arange(nr), np.arange(nc), indexing="ij")
    cells = ray.data.from_arrow(pa.table({
        "row": pa.array(r.ravel().astype(np.int64)),
        "col": pa.array(c.ravel().astype(np.int64)),
        "value": pa.array(vals.ravel()),
    })).repartition(3)
    cellsize = 5
    got = {
        (int(x["row"]), int(x["col"])): (
            int(x["gx_num"]), int(x["gy_num"]), int(x["den"]),
            float(x["slope_f"]),
        )
        for x in raster_slope(cells, nr, nc, cellsize=cellsize,
                              nodata=-1).take_all()
    }
    wx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]])
    wy = wx.T
    want = {}
    for i in range(1, nr - 1):
        for j in range(1, nc - 1):
            win = vals[i - 1: i + 2, j - 1: j + 2]
            if (win == -1).any():
                continue
            gx, gy = int((wx * win).sum()), int((wy * win).sum())
            den = 8 * cellsize
            want[(i, j)] = (gx, gy, den,
                            math.hypot(gx / den, gy / den))
    assert set(got) == set(want)
    for k in want:
        assert got[k][:3] == want[k][:3], (k, got[k], want[k])
        assert abs(got[k][3] - want[k][3]) < 1e-12


def test_zonal_majority_matches_brute(ray_session):
    from libpysal_ray.spatial.ops import zonal_majority

    rng = np.random.default_rng(6)
    n = 400
    z = rng.integers(0, 10, n).astype(np.int64)
    c = rng.integers(0, 4, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "zone": pa.array(z), "cat": pa.array(c),
    })).repartition(5)
    got = {
        int(r["zone"]): (int(r["cat"]), int(r["cnt"]))
        for r in zonal_majority(ds).take_all()
    }
    want = {}
    for zz in np.unique(z):
        cnts = np.bincount(c[z == zz], minlength=4)
        best = int(np.flatnonzero(cnts == cnts.max())[0])  # tie->lowest
        want[int(zz)] = (best, int(cnts[best]))
    assert got == want

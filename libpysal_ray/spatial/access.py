"""Spatial accessibility: fixed-point two-step floating catchment area.

2SFCA (Luo & Wang 2003 — the access-measures family the reference
ecosystem ships around libpysal weights) under the engine's exactness
discipline: supply-to-demand ratios are FLOOR FIXED-POINT integers
R_j = s_j·scale // D_j, so both catchment sums are exact int64 and the
whole measure is bit-reproducible at any cluster size / batch layout
and SQL-mirrored (floats from float sums would be summation-order-
dependent; the floor quantization at 1/scale is the documented,
deterministic contract).

100 TB shape: each catchment aggregation is ONE tagged-union tile
shuffle at cs = halo = threshold (the :func:`tile_points` plan shared
with ripley_k/cross_k) — every A point is core in exactly one tile, so
per-tile vectorized masked sums emit final rows directly; nothing but
(id, sum) rows move after the shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from libpysal_ray.builders.distance import tile_points
from libpysal_ray.core import joins as J

_CHUNK = 2048


def band_value_sum(
    points_a: ray.data.Dataset,
    points_b: ray.data.Dataset,
    threshold: float,
    val_col: str,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> ray.data.Dataset:
    """For every point in A, the exact int64 sum of B's ``val_col``
    over all B points within ``threshold`` (inclusive, squared-distance
    test — coincident points count; no cross-set self-exclusion).
    Returns (id, bsum, bcnt) with a row for EVERY A point (0s when the
    catchment is empty). One tile shuffle; A-core rows emit finished
    sums per tile."""
    t2 = float(threshold) * float(threshold)

    def _tag(mark, with_val):
        def _f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "id": t.column(id_col),
                "x": t.column(x_col),
                "y": t.column(y_col),
                "mark": pa.array(np.full(n, mark, dtype=np.int64)),
                "val": (
                    pa.array(
                        t.column(val_col)
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64)
                    )
                    if with_val
                    else pa.array(np.zeros(n, dtype=np.int64))
                ),
            })
        return _f

    both = points_a.map_batches(
        _tag(1, False), batch_format="pyarrow"
    ).union(points_b.map_batches(_tag(2, True), batch_format="pyarrow"))
    tiled = tile_points(both, cs=float(threshold), halo=float(threshold),
                        extra_cols=("mark", "val"))

    def _sums(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        mark = t.column("mark").to_numpy(zero_copy_only=False)
        val = t.column("val").to_numpy(zero_copy_only=False)
        core = t.column("core").to_numpy(zero_copy_only=False)
        ids = t.column("id").to_numpy(zero_copy_only=False)
        ai = np.flatnonzero(core & (mark == 1))
        bj = np.flatnonzero(mark == 2)
        out_s = np.zeros(len(ai), dtype=np.int64)
        out_c = np.zeros(len(ai), dtype=np.int64)
        if len(bj):
            xb, yb, vb = x[bj], y[bj], val[bj]
            for s in range(0, len(ai), _CHUNK):
                sel = ai[s : s + _CHUNK]
                dx = x[sel, None] - xb[None, :]
                dy = y[sel, None] - yb[None, :]
                m = (dx * dx + dy * dy) <= t2
                out_s[s : s + _CHUNK] = m @ vb
                out_c[s : s + _CHUNK] = m.sum(axis=1)
        return pa.table({
            "id": pa.array(ids[ai]),
            "bsum": pa.array(out_s),
            "bcnt": pa.array(out_c),
        })

    return J.per_group(tiled, ("tile",), _sums)


def two_step_fca(
    supply: ray.data.Dataset,
    demand: ray.data.Dataset,
    threshold: float,
    scale: int = 1_000_000,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    s_col: str = "s",
    p_col: str = "p",
) -> ray.data.Dataset:
    """Two-step floating catchment area accessibility with floor
    fixed-point ratios:

        D_j = Σ_{i: d_ij ≤ t} p_i             (demand on facility j)
        R_j = s_j·scale // D_j  (0 if D_j=0)  (exact integer ratio)
        A_i = Σ_{j: d_ij ≤ t} R_j             (accessibility of i)

    Output (id, acc, acc_f) for EVERY demand point — acc exact int64 in
    1/scale units, acc_f = acc / scale one pinned float division.
    Overflow is pre-checked in unbounded ints: A_i ≤ scale·Σ_j s_j, so
    total supply × scale must stay under 2^62 (raises loudly)."""
    sagg = supply.aggregate(
        ray.data.aggregate.Sum(s_col), ray.data.aggregate.Min(s_col)
    )
    total_s = int(sagg[f"sum({s_col})"] or 0)
    if int(sagg[f"min({s_col})"] or 0) < 0:
        raise ValueError("two_step_fca: supply must be non-negative")
    if total_s * int(scale) >= (1 << 62):
        raise ValueError(
            "two_step_fca: total supply x scale exceeds 2^62; "
            "reduce scale"
        )
    pmin = demand.min(p_col)
    if pmin is not None and int(pmin) < 0:
        raise ValueError("two_step_fca: demand must be non-negative")

    dj = band_value_sum(
        supply, demand, threshold, p_col,
        id_col=id_col, x_col=x_col, y_col=y_col,
    )
    sup_attrs = supply.map_batches(
        lambda t: pa.table({
            "id": t.column(id_col),
            "xs": t.column(x_col),
            "ys": t.column(y_col),
            "sv": pa.array(
                t.column(s_col).to_numpy(zero_copy_only=False)
                .astype(np.int64)
            ),
        }),
        batch_format="pyarrow",
    )
    rj = J.bucket_join(sup_attrs, dj, on="id").map_batches(
        lambda t: pa.table({
            "id": t.column("id"),
            "x": t.column("xs"),
            "y": t.column("ys"),
            "r": pa.array(np.where(
                t.column("bsum").to_numpy(zero_copy_only=False) > 0,
                t.column("sv").to_numpy(zero_copy_only=False)
                * np.int64(scale)
                // np.maximum(
                    t.column("bsum").to_numpy(zero_copy_only=False), 1
                ),
                np.int64(0),
            )),
        }),
        batch_format="pyarrow",
    ).materialize()
    ai = band_value_sum(
        demand, rj, threshold, "r",
        id_col=id_col, x_col=x_col, y_col=y_col,
    )
    inv = float(int(scale))
    return ai.map_batches(
        lambda t: pa.table({
            "id": t.column("id"),
            "acc": t.column("bsum"),
            "acc_f": pa.array(
                t.column("bsum").to_numpy(zero_copy_only=False)
                .astype(np.float64) / inv
            ),
        }),
        batch_format="pyarrow",
    )


def kde_surface(
    anchors: ray.data.Dataset,
    points: ray.data.Dataset,
    bandwidth: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> ray.data.Dataset:
    """Kernel density surface at anchor locations with the Epanechnikov
    (parabolic) kernel — the one classic kernel that is EXACTLY rational
    in integer coordinates (reference kernel registry:
    `libpysal/kernels.py:243-310`, 'parabolic'; the legacy quadratic of
    `weights/distance.py:702-745`):

        ksum_i = Σ_{j: d² < h²} (h² − d²_ij)     (exact int64)
        kde_f  = ksum / (n_points · h²)          (one pinned division)

    d² is an exact integer for integer-valued coordinates, so the sum
    is layout-invariant int64 — no float kernel eval anywhere. The
    normalizing constant 2/π of the true density is omitted (documented
    contract; it cancels in any density RATIO use). Output
    (id, ksum, cnt, kde_f) for EVERY anchor; empty neighborhoods get
    (0, 0, 0.0). Strict inequality d² < h² keeps the support open like
    the reference kernel's (1 − z²)·(z < 1) indicator.

    100 TB shape: the same ONE tagged-union tile shuffle as
    :func:`band_value_sum` (cs = halo = h); per-tile blocked masked
    sums emit finished anchor rows. Overflow pre-check: h²·n < 2^62."""
    h2i = int(float(bandwidth) * float(bandwidth))
    if h2i < 1:
        raise ValueError("kde_surface: bandwidth^2 must be >= 1")
    n_pts = int(points.count())
    if h2i * max(n_pts, 1) >= (1 << 62):
        raise ValueError("kde_surface: h^2 x n exceeds 2^62; reduce "
                         "bandwidth")

    def _tag(mark):
        def _f(t: pa.Table) -> pa.Table:
            return pa.table({
                "id": t.column(id_col),
                "x": t.column(x_col),
                "y": t.column(y_col),
                "mark": pa.array(
                    np.full(t.num_rows, mark, dtype=np.int64)),
            })
        return _f

    both = anchors.map_batches(
        _tag(1), batch_format="pyarrow"
    ).union(points.map_batches(_tag(2), batch_format="pyarrow"))
    tiled = tile_points(both, cs=float(bandwidth), halo=float(bandwidth),
                        extra_cols=("mark",))

    def _sums(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        mark = t.column("mark").to_numpy(zero_copy_only=False)
        core = t.column("core").to_numpy(zero_copy_only=False)
        ids = t.column("id").to_numpy(zero_copy_only=False)
        ai = np.flatnonzero(core & (mark == 1))
        bj = np.flatnonzero(mark == 2)
        ks = np.zeros(len(ai), dtype=np.int64)
        kc = np.zeros(len(ai), dtype=np.int64)
        if len(bj):
            xb, yb = x[bj], y[bj]
            for s in range(0, len(ai), _CHUNK):
                sel = ai[s : s + _CHUNK]
                dx = x[sel, None] - xb[None, :]
                dy = y[sel, None] - yb[None, :]
                # exact: integer-valued coords make d2 an exactly-
                # represented integer in float64
                d2 = (dx * dx + dy * dy).astype(np.int64)
                m = d2 < h2i
                ks[s : s + _CHUNK] = np.where(m, np.int64(h2i) - d2,
                                              0).sum(axis=1)
                kc[s : s + _CHUNK] = m.sum(axis=1)
        return pa.table({
            "id": pa.array(ids[ai]),
            "ksum": pa.array(ks),
            "cnt": pa.array(kc),
        })

    out = J.per_group(tiled, ("tile",), _sums)
    norm = float(max(n_pts, 1) * h2i)
    return out.map_batches(
        lambda t: pa.table({
            "id": t.column("id"),
            "ksum": t.column("ksum"),
            "cnt": t.column("cnt"),
            "kde_f": pa.array(
                t.column("ksum").to_numpy(zero_copy_only=False)
                .astype(np.float64) / norm
            ),
        }),
        batch_format="pyarrow",
    )


def idw_interpolate(
    anchors: ray.data.Dataset,
    points: ray.data.Dataset,
    radius: float,
    scale: int = 1_000_000_000,
    v_col: str = "v",
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> ray.data.Dataset:
    """Inverse-distance-weighted interpolation of ``points[v_col]`` at
    every anchor location, bounded to ``radius``, with FLOOR FIXED-POINT
    weights so the sums are exact integers at any layout:

        w_j   = scale // max(d²_j, 1)          (d² exact integer)
        num_i = Σ_{j: d_ij ≤ r} v_j · w_j
        den_i = Σ_{j: d_ij ≤ r} w_j
        idw_f = num / den                      (one pinned division)

    Coincident points (d² = 0) take the full ``scale`` weight (the
    documented d² ≥ 1 clamp — a deterministic contract both the engine
    and the SQL oracle share, in place of the reference family's
    float 1/d² whose distributed sum is order-dependent). Output
    (id, num, den, idw_f) for EVERY anchor; empty neighborhoods get
    (0, 0, 0.0). Same ONE tile shuffle as :func:`band_value_sum`.
    Overflow pre-check: |v|_max·scale·n_points < 2^62 (unbounded-int,
    loud)."""
    vagg = points.aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Max(v_col),
        ray.data.aggregate.Min(v_col),
    )
    n_pts = int(vagg["count()"])
    vmax = max(
        abs(int(vagg[f"max({v_col})"] or 0)),
        abs(int(vagg[f"min({v_col})"] or 0)),
    )
    if vmax * int(scale) * max(n_pts, 1) >= (1 << 62):
        raise ValueError(
            "idw_interpolate: v_max x scale x n exceeds 2^62; reduce "
            "scale"
        )
    t2 = float(radius) * float(radius)

    def _tag(mark, with_val):
        def _f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "id": t.column(id_col),
                "x": t.column(x_col),
                "y": t.column(y_col),
                "mark": pa.array(np.full(n, mark, dtype=np.int64)),
                "val": (
                    pa.array(
                        t.column(v_col)
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64)
                    )
                    if with_val
                    else pa.array(np.zeros(n, dtype=np.int64))
                ),
            })
        return _f

    both = anchors.map_batches(
        _tag(1, False), batch_format="pyarrow"
    ).union(points.map_batches(_tag(2, True), batch_format="pyarrow"))
    tiled = tile_points(both, cs=float(radius), halo=float(radius),
                        extra_cols=("mark", "val"))
    sc = np.int64(scale)

    def _sums(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        mark = t.column("mark").to_numpy(zero_copy_only=False)
        val = t.column("val").to_numpy(zero_copy_only=False)
        core = t.column("core").to_numpy(zero_copy_only=False)
        ids = t.column("id").to_numpy(zero_copy_only=False)
        ai = np.flatnonzero(core & (mark == 1))
        bj = np.flatnonzero(mark == 2)
        num = np.zeros(len(ai), dtype=np.int64)
        den = np.zeros(len(ai), dtype=np.int64)
        if len(bj):
            xb, yb, vb = x[bj], y[bj], val[bj]
            for s in range(0, len(ai), _CHUNK):
                sel = ai[s : s + _CHUNK]
                dx = x[sel, None] - xb[None, :]
                dy = y[sel, None] - yb[None, :]
                d2 = dx * dx + dy * dy
                m = d2 <= t2
                # exact: coordinates are integer-valued, so d2 is an
                # exactly-represented integer in float64
                w = np.where(
                    m, sc // np.maximum(d2.astype(np.int64), 1), 0
                )
                num[s : s + _CHUNK] += (w * vb[None, :]).sum(axis=1)
                den[s : s + _CHUNK] += w.sum(axis=1)
        return pa.table({
            "id": pa.array(ids[ai]),
            "num": pa.array(num),
            "den": pa.array(den),
        })

    out = J.per_group(tiled, ("tile",), _sums)
    return out.map_batches(
        lambda t: pa.table({
            "id": t.column("id"),
            "num": t.column("num"),
            "den": t.column("den"),
            "idw_f": pa.array(np.where(
                t.column("den").to_numpy(zero_copy_only=False) > 0,
                t.column("num").to_numpy(zero_copy_only=False)
                .astype(np.float64)
                / np.maximum(
                    t.column("den").to_numpy(zero_copy_only=False), 1
                ).astype(np.float64),
                0.0,
            )),
        }),
        batch_format="pyarrow",
    )


def huff_probabilities(
    demand: ray.data.Dataset,
    supply: ray.data.Dataset,
    radius: float,
    scale: int = 1_000_000_000,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    s_col: str = "s",
) -> ray.data.Dataset:
    """Huff gravity-model choice probabilities (Huff 1963; the
    spatial-interaction family beside the reference's spintW builders):
    for demand point i and each supply j within ``radius``,

        P_ij = s_j·w_ij / Σ_{j' in range} s_j'·w_ij',
        w_ij = scale // max(d²_ij, 1)      (the exact idw weight)

    — attractiveness over distance-decayed competition. Both the
    numerator and the per-i denominator are exact int64 (the
    :func:`idw_interpolate` fixed-point discipline; the d² ≥ 1 clamp is
    the same documented contract), one pinned float per pair. Output
    (id, supply_id, p_num, p_den, p_f); demand points with no supply in
    range emit nothing.

    100 TB shape: ONE tagged-union tile shuffle (cs = halo = radius) —
    every demand point is core in exactly one tile with ALL its
    in-range supply present, so the per-tile kernel emits finished
    pair rows AND their shared denominator in the same pass; no second
    shuffle, no join. Overflow pre-check: s_max·scale·n_supply < 2^62."""
    sagg = supply.aggregate(
        ray.data.aggregate.Count(), ray.data.aggregate.Max(s_col),
        ray.data.aggregate.Min(s_col),
    )
    n_sup = int(sagg["count()"])
    smax = int(sagg[f"max({s_col})"] or 0)
    if int(sagg[f"min({s_col})"] or 0) < 0:
        raise ValueError("huff_probabilities: supply must be >= 0")
    if smax * int(scale) * max(n_sup, 1) >= (1 << 62):
        raise ValueError("huff_probabilities: s_max x scale x n "
                         "exceeds 2^62; reduce scale")
    t2 = float(radius) * float(radius)
    sc = np.int64(scale)

    def _tag(mark, with_val):
        def _f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "id": t.column(id_col),
                "x": t.column(x_col),
                "y": t.column(y_col),
                "mark": pa.array(np.full(n, mark, dtype=np.int64)),
                "val": (
                    pa.array(
                        t.column(s_col)
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64)
                    )
                    if with_val
                    else pa.array(np.zeros(n, dtype=np.int64))
                ),
            })
        return _f

    both = demand.map_batches(
        _tag(1, False), batch_format="pyarrow"
    ).union(supply.map_batches(_tag(2, True), batch_format="pyarrow"))
    tiled = tile_points(both, cs=float(radius), halo=float(radius),
                        extra_cols=("mark", "val"))

    def _pairs(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        mark = t.column("mark").to_numpy(zero_copy_only=False)
        val = t.column("val").to_numpy(zero_copy_only=False)
        core = t.column("core").to_numpy(zero_copy_only=False)
        ids = t.column("id").to_numpy(zero_copy_only=False)
        ai = np.flatnonzero(core & (mark == 1))
        bj = np.flatnonzero(mark == 2)
        oi, oj, on, od = [], [], [], []
        if len(bj):
            xb, yb, vb, jb = x[bj], y[bj], val[bj], ids[bj]
            for s in range(0, len(ai), _CHUNK):
                sel = ai[s : s + _CHUNK]
                dx = x[sel, None] - xb[None, :]
                dy = y[sel, None] - yb[None, :]
                d2 = dx * dx + dy * dy
                m = d2 <= t2
                w = np.where(
                    m, sc // np.maximum(d2.astype(np.int64), 1), 0
                )
                num = w * vb[None, :]
                den = num.sum(axis=1)
                ii, jj = np.nonzero(m)
                oi.append(ids[sel][ii])
                oj.append(jb[jj])
                on.append(num[ii, jj])
                od.append(den[ii])
        if not oi:
            return pa.table({
                "id": pa.array([], pa.int64()),
                "supply_id": pa.array([], pa.int64()),
                "p_num": pa.array([], pa.int64()),
                "p_den": pa.array([], pa.int64()),
            })
        return pa.table({
            "id": pa.array(np.concatenate(oi).astype(np.int64)),
            "supply_id": pa.array(np.concatenate(oj).astype(np.int64)),
            "p_num": pa.array(np.concatenate(on).astype(np.int64)),
            "p_den": pa.array(np.concatenate(od).astype(np.int64)),
        })

    out = J.per_group(tiled, ("tile",), _pairs)
    return out.map_batches(
        lambda t: t.append_column("p_f", pa.array(np.where(
            t.column("p_den").to_numpy(zero_copy_only=False) > 0,
            t.column("p_num").to_numpy(zero_copy_only=False)
            .astype(np.float64)
            / np.maximum(
                t.column("p_den").to_numpy(zero_copy_only=False), 1
            ).astype(np.float64),
            0.0,
        ))),
        batch_format="pyarrow",
    )


def gw_mean(
    anchors: ray.data.Dataset,
    points: ray.data.Dataset,
    bandwidth: float,
    v_col: str = "v",
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> ray.data.Dataset:
    """Geographically weighted mean (the GW summary-statistics family,
    Brunsdon et al. 2002) at anchor locations with the Epanechnikov
    kernel — EXACT rational per anchor because the parabolic kernel is
    integer-valued on integer coordinates (the :func:`kde_surface`
    trick):

        num_i = Σ_{d² < h²} (h² − d²)·v_j      den_i = Σ (h² − d²)

    Output (id, num, den, gw_f) for EVERY anchor; empty neighborhoods
    get (0, 0, 0.0). One pinned float division per anchor.

    100 TB shape: the ONE tagged-union tile shuffle of
    :func:`band_value_sum` (cs = halo = h); blocked per-tile masked
    matmuls emit finished rows. Overflow pre-check:
    h²·|v|max·n < 2^62."""
    h2i = int(float(bandwidth) * float(bandwidth))
    if h2i < 1:
        raise ValueError("gw_mean: bandwidth^2 must be >= 1")
    vagg = points.aggregate(
        ray.data.aggregate.Count(), ray.data.aggregate.Max(v_col),
        ray.data.aggregate.Min(v_col),
    )
    n_pts = int(vagg["count()"])
    vmax = max(abs(int(vagg[f"max({v_col})"] or 0)),
               abs(int(vagg[f"min({v_col})"] or 0)))
    if h2i * max(vmax, 1) * max(n_pts, 1) >= (1 << 62):
        raise ValueError("gw_mean: h^2 x v_max x n exceeds 2^62; "
                         "reduce bandwidth")

    def _tag(mark, with_val):
        def _f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "id": t.column(id_col),
                "x": t.column(x_col),
                "y": t.column(y_col),
                "mark": pa.array(np.full(n, mark, dtype=np.int64)),
                "val": (
                    pa.array(
                        t.column(v_col)
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64)
                    )
                    if with_val
                    else pa.array(np.zeros(n, dtype=np.int64))
                ),
            })
        return _f

    both = anchors.map_batches(
        _tag(1, False), batch_format="pyarrow"
    ).union(points.map_batches(_tag(2, True), batch_format="pyarrow"))
    tiled = tile_points(both, cs=float(bandwidth), halo=float(bandwidth),
                        extra_cols=("mark", "val"))

    def _sums(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        mark = t.column("mark").to_numpy(zero_copy_only=False)
        val = t.column("val").to_numpy(zero_copy_only=False)
        core = t.column("core").to_numpy(zero_copy_only=False)
        ids = t.column("id").to_numpy(zero_copy_only=False)
        ai = np.flatnonzero(core & (mark == 1))
        bj = np.flatnonzero(mark == 2)
        num = np.zeros(len(ai), dtype=np.int64)
        den = np.zeros(len(ai), dtype=np.int64)
        if len(bj):
            xb, yb, vb = x[bj], y[bj], val[bj]
            for s in range(0, len(ai), _CHUNK):
                sel = ai[s : s + _CHUNK]
                dx = x[sel, None] - xb[None, :]
                dy = y[sel, None] - yb[None, :]
                d2 = (dx * dx + dy * dy).astype(np.int64)
                w = np.where(d2 < h2i, np.int64(h2i) - d2, 0)
                num[s : s + _CHUNK] = (w * vb[None, :]).sum(axis=1)
                den[s : s + _CHUNK] = w.sum(axis=1)
        return pa.table({
            "id": pa.array(ids[ai]),
            "num": pa.array(num),
            "den": pa.array(den),
        })

    out = J.per_group(tiled, ("tile",), _sums)
    return out.map_batches(
        lambda t: t.append_column("gw_f", pa.array(np.where(
            t.column("den").to_numpy(zero_copy_only=False) > 0,
            t.column("num").to_numpy(zero_copy_only=False)
            .astype(np.float64)
            / np.maximum(
                t.column("den").to_numpy(zero_copy_only=False), 1
            ).astype(np.float64),
            0.0,
        ))),
        batch_format="pyarrow",
    )

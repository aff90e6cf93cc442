"""Tabular spatial overlay — polygon×polygon intersection attributes.

Reference semantics: ``cg/ops/tabular.py:74-120`` ``spatial_overlay``
(geopandas overlay): intersect two polygon layers and attach both
layers' attributes to each intersection piece. The engine computes the
overlay *products* — (left_id, right_id, intersection area) — without
materializing merged geometry, the same products-not-geometry stance as
``dissolve_stats`` (spatial/ops.py).

Physical plan (Ray-Data-first; the reference is a single in-memory
geopandas call):

1. **tile shuffle**: each polygon of both layers is emitted to every
   grid cell its bbox overlaps (cell size auto-derived from mean bbox
   extent). One ``grouped_by_key`` shuffle on the tile id.
2. **per-tile pair discovery**: vectorized bbox-overlap matrix between
   the tile's left and right members; a pair is processed ONLY in the
   tile containing the min-corner of the two bboxes' intersection, so
   multi-tile pairs are counted exactly once (corner rule).
3. **vectorized multi-pair Sutherland–Hodgman**: all candidate pairs in
   a tile are clipped simultaneously — clip rings are padded to a
   uniform K vertices by repeating their last vertex (a degenerate
   a==b clip edge keeps every subject vertex: cross((b-a),(v-a))==0 ⇒
   inside ⇒ no-op round), so every round is one flat numpy pass over
   the ragged "vertex soup" of all pairs. K rounds total; no per-pair
   Python. Areas by shoelace + bincount.

Constraints (documented per the custom-operator rule):
* CLIP (right) polygons must be CONVEX — validated per polygon, loud
  ``NotImplementedError`` otherwise (CW rings are reoriented). Subject
  (left) polygons may be arbitrary simple rings: Sutherland–Hodgman's
  bridging edges for multi-piece intersections traverse twice in
  opposite directions and cancel in the shoelace sum.
* Single-ring polygons (no holes), the engine polygon schema
  (polygon_id, xs, ys).
* ``overlay_difference`` additionally assumes the right layer is
  internally non-overlapping (areas subtract additively);
  ``overlay_union`` / ``overlay_identity`` / ``overlay_symdiff``
  inherit that for whichever side is subtracted from.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from libpysal_ray.builders.contiguity import _ring_parts
from libpysal_ray.core.joins import bucket_join, grouped_by_key

_PAIR_CHUNK = 1 << 22  # max soup vertices per clip sub-batch


def _open_rings(x, y, off):
    """Drop a duplicated closing vertex per ring (open-ring invariant for
    the clip state); returns (x, y, off) rebuilt."""
    n = len(off) - 1
    if n == 0 or off[-1] == 0:
        return x, y, off
    starts, ends = off[:-1], off[1:] - 1
    closed = (
        (off[1:] - off[:-1] > 1)
        & (x[starts] == x[ends])
        & (y[starts] == y[ends])
    )
    if not closed.any():
        return x, y, off
    keep = np.ones(len(x), dtype=bool)
    keep[ends[closed]] = False
    cnt = (off[1:] - off[:-1]) - closed.astype(np.int64)
    noff = np.concatenate([[0], np.cumsum(cnt)])
    return x[keep], y[keep], noff


def _bboxes(x, y, off):
    s = off[:-1]
    return (
        np.minimum.reduceat(x, s),
        np.maximum.reduceat(x, s),
        np.minimum.reduceat(y, s),
        np.maximum.reduceat(y, s),
    )


def _auto_cell(*layers: ray.data.Dataset) -> float:
    """Cell size ≈ 2× the mean bbox max-extent over both layers (small
    per-batch partials; only two scalars reach the driver)."""

    def _p(t: pa.Table) -> pa.Table:
        _, x, y, off = _ring_parts(t)
        if len(off) <= 1:
            return pa.table({"s": pa.array([0.0]), "n": pa.array([0.0])})
        bx0, bx1, by0, by1 = _bboxes(x, y, off)
        ext = np.maximum(bx1 - bx0, by1 - by0)
        return pa.table(
            {"s": pa.array([float(ext.sum())]),
             "n": pa.array([float(len(ext))])}
        )

    s = n = 0.0
    for lay in layers:
        for r in lay.map_batches(_p, batch_format="pyarrow").take_all():
            s += r["s"]
            n += r["n"]
    mean = s / n if n else 1.0
    return max(mean * 2.0, 1e-9)


def _ensure_ccw_convex(x, y, off):
    """Reorient CW rings to CCW in the flat soup; raise loudly on any
    non-convex clip polygon. Vectorized over all rings at once."""
    n = len(off) - 1
    if n == 0:
        return x, y
    cnt = off[1:] - off[:-1]
    ends = off[1:] - 1
    idx = np.arange(len(x))
    within = idx - np.repeat(off[:-1], cnt)
    nxt = idx + 1
    nxt[ends] = off[:-1]
    # orientation per ring (shoelace sign)
    cr = x * y[nxt] - x[nxt] * y
    a2 = np.add.reduceat(cr, off[:-1])
    cw = a2 < 0
    if cw.any():
        flip = np.repeat(cw, cnt)
        ridx = np.repeat(off[:-1] + cnt - 1, cnt) - within
        x = np.where(flip, x[np.where(flip, ridx, idx)], x)
        y = np.where(flip, y[np.where(flip, ridx, idx)], y)
        nxt = idx + 1
        nxt[ends] = off[:-1]
    # convexity: every consecutive edge cross must be >= 0 (CCW)
    ex, ey = x[nxt] - x, y[nxt] - y
    cross = ex * ey[nxt] - ey * ex[nxt]
    scale = np.maximum(np.abs(ex) + np.abs(ey), 1.0)
    if (cross < -1e-12 * np.repeat(
        np.maximum.reduceat(scale, off[:-1]) ** 2, cnt
    )).any():
        raise NotImplementedError(
            "overlay clip (right) polygons must be convex"
        )
    return x, y


def _next_idx(p_of: np.ndarray, soff: np.ndarray) -> np.ndarray:
    """Circular next-vertex index within each pair of the soup."""
    idx = np.arange(len(p_of))
    nxt = idx + 1
    cnt = soff[1:] - soff[:-1]
    ne = cnt > 0
    nxt[soff[1:][ne] - 1] = soff[:-1][ne]
    return nxt


def _clip_pairs(sx, sy, p_of, scnt, RX, RY, qi):
    """Sutherland–Hodgman over ALL pairs at once. Subject soup
    (sx, sy, p_of) with per-pair counts ``scnt``; clip rings padded to
    the uniform (npairs-indexable) 2-D arrays RX/RY of width K, selected
    per pair by ``qi``. Returns the clipped soup (sx, sy, p_of, scnt)."""
    npairs = len(scnt)
    K = RX.shape[1]
    for j in range(K):
        if len(sx) == 0:
            break
        soff = np.concatenate([[0], np.cumsum(scnt)])
        nxt = _next_idx(p_of, soff)
        axp, ayp = RX[qi, j], RY[qi, j]
        jn = (j + 1) % K
        bxp, byp = RX[qi, jn], RY[qi, jn]
        ax, ay = axp[p_of], ayp[p_of]
        bx, by = bxp[p_of], byp[p_of]
        d = (bx - ax) * (sy - ay) - (by - ay) * (sx - ax)
        inside = d >= 0.0
        d_n = d[nxt]
        crossing = inside != inside[nxt]
        denom = d - d_n
        with np.errstate(divide="ignore", invalid="ignore"):
            tt = np.where(denom != 0.0, d / denom, 0.0)
        ix = sx + tt * (sx[nxt] - sx)
        iy = sy + tt * (sy[nxt] - sy)
        cnt_out = inside.astype(np.int64) + crossing
        base = np.cumsum(cnt_out) - cnt_out
        total = int(base[-1] + cnt_out[-1]) if len(base) else 0
        ox = np.empty(total, dtype=np.float64)
        oy = np.empty(total, dtype=np.float64)
        op = np.empty(total, dtype=np.int64)
        pos_v = base[inside]
        ox[pos_v], oy[pos_v], op[pos_v] = sx[inside], sy[inside], p_of[inside]
        pos_x = (base + inside)[crossing]
        ox[pos_x], oy[pos_x], op[pos_x] = (
            ix[crossing], iy[crossing], p_of[crossing],
        )
        sx, sy, p_of = ox, oy, op
        scnt = np.bincount(op, minlength=npairs).astype(np.int64)
    return sx, sy, p_of, scnt


def _pair_areas(sx, sy, p_of, scnt):
    npairs = len(scnt)
    soff = np.concatenate([[0], np.cumsum(scnt)])
    nxt = _next_idx(p_of, soff)
    cr = sx * sy[nxt] - sx[nxt] * sy
    a2 = np.bincount(p_of, weights=cr, minlength=npairs)
    return np.abs(a2) / 2.0


def overlay_intersection(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    cell_size: float | None = None,
    left_id: str = "left_id",
    right_id: str = "right_id",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """(left_id, right_id, area) for every intersecting polygon pair —
    the attribute table of the reference's ``spatial_overlay(df1, df2,
    how='intersection')`` with ``area`` standing in for the piece
    geometry. Right-layer polygons must be convex."""
    cs = _auto_cell(left, right) if cell_size is None else float(cell_size)

    def _emit(side: int):
        def f(t: pa.Table) -> pa.Table:
            pids, x, y, off = _ring_parts(t)
            if len(off) <= 1:
                return pa.table(
                    {
                        "tile": pa.array([], pa.int64()),
                        "side": pa.array([], pa.int8()),
                        "polygon_id": pa.array([], pa.int64()),
                        "xs": pa.array([], pa.list_(pa.float64())),
                        "ys": pa.array([], pa.list_(pa.float64())),
                        "bx0": pa.array([], pa.float64()),
                        "bx1": pa.array([], pa.float64()),
                        "by0": pa.array([], pa.float64()),
                        "by1": pa.array([], pa.float64()),
                    }
                )
            bx0, bx1, by0, by1 = _bboxes(x, y, off)
            cx0 = np.floor(bx0 / cs).astype(np.int64)
            cx1 = np.floor(bx1 / cs).astype(np.int64)
            cy0 = np.floor(by0 / cs).astype(np.int64)
            cy1 = np.floor(by1 / cs).astype(np.int64)
            nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
            ncell = nx * ny
            total = int(ncell.sum())
            rep = np.repeat(np.arange(len(ncell)), ncell)
            w = np.arange(total) - np.repeat(np.cumsum(ncell) - ncell, ncell)
            tx = cx0[rep] + w % nx[rep]
            ty = cy0[rep] + w // nx[rep]
            tile = (tx + (1 << 20)) * (1 << 21) + (ty + (1 << 20))
            base = t.take(pa.array(rep.astype(np.int64)))
            return pa.table(
                {
                    "tile": pa.array(tile),
                    "side": pa.array(
                        np.full(total, side, dtype=np.int8)
                    ),
                    "polygon_id": base.column("polygon_id"),
                    "xs": base.column("xs"),
                    "ys": base.column("ys"),
                    "bx0": pa.array(bx0[rep]),
                    "bx1": pa.array(bx1[rep]),
                    "by0": pa.array(by0[rep]),
                    "by1": pa.array(by1[rep]),
                }
            )

        f._size_expanding = True  # bbox→multi-tile fanout
        return f

    u = left.map_batches(_emit(0), batch_format="pyarrow").union(
        right.map_batches(_emit(1), batch_format="pyarrow")
    )

    def _kernel(t: pa.Table) -> pa.Table:
        out_l, out_r, out_a = [], [], []
        tiles = t.column("tile").to_numpy(zero_copy_only=False)
        n = len(tiles)
        if n == 0:
            return pa.table(
                {
                    left_id: pa.array([], pa.int64()),
                    right_id: pa.array([], pa.int64()),
                    "area": pa.array([], pa.float64()),
                }
            )
        side = t.column("side").to_numpy(zero_copy_only=False)
        pids_all = t.column("polygon_id").to_numpy(zero_copy_only=False)
        bb = {
            c: t.column(c).to_numpy(zero_copy_only=False)
            for c in ("bx0", "bx1", "by0", "by1")
        }
        starts = np.flatnonzero(
            np.concatenate([[True], tiles[1:] != tiles[:-1]])
        )
        ends = np.append(starts[1:], n)
        for s, e in zip(starts, ends):
            ls = np.arange(s, e)[side[s:e] == 0]
            rs = np.arange(s, e)[side[s:e] == 1]
            if len(ls) == 0 or len(rs) == 0:
                continue
            tile = int(tiles[s])
            tx = tile // (1 << 21) - (1 << 20)
            ty = tile % (1 << 21) - (1 << 20)
            # bbox-overlap matrix + the corner dedup rule
            mx0 = np.maximum(bb["bx0"][ls, None], bb["bx0"][None, rs])
            my0 = np.maximum(bb["by0"][ls, None], bb["by0"][None, rs])
            ok = (
                (mx0 <= np.minimum(bb["bx1"][ls, None], bb["bx1"][None, rs]))
                & (my0 <= np.minimum(bb["by1"][ls, None],
                                     bb["by1"][None, rs]))
                & (np.floor(mx0 / cs).astype(np.int64) == tx)
                & (np.floor(my0 / cs).astype(np.int64) == ty)
            )
            pi, qi = np.nonzero(ok)
            if len(pi) == 0:
                continue
            sub = t.slice(s, e - s)
            _, fx, fy, foff = _ring_parts(sub)
            fx, fy, foff = _open_rings(fx, fy, foff)
            rel_l, rel_r = ls - s, rs - s
            lstart, lcnt = foff[:-1][rel_l], (foff[1:] - foff[:-1])[rel_l]
            rstart, rcnt = foff[:-1][rel_r], (foff[1:] - foff[:-1])[rel_r]
            # clip rings: CCW + convex, padded to uniform width K
            rsel = np.repeat(rstart, rcnt) + (
                np.arange(int(rcnt.sum()))
                - np.repeat(np.cumsum(rcnt) - rcnt, rcnt)
            )
            roff = np.concatenate([[0], np.cumsum(rcnt)])
            cx, cy = _ensure_ccw_convex(fx[rsel], fy[rsel], roff)
            K = int(rcnt.max())
            pad = np.minimum(
                np.arange(K)[None, :], (rcnt - 1)[:, None]
            ) + roff[:-1][:, None]
            RX, RY = cx[pad], cy[pad]
            # subject soup for all pairs at once, chunked so a dense tile
            # never builds a soup beyond _PAIR_CHUNK vertices
            scnt_all = lcnt[pi].astype(np.int64)
            cum = np.cumsum(scnt_all)
            marks = np.searchsorted(
                cum, np.arange(_PAIR_CHUNK, int(cum[-1]), _PAIR_CHUNK)
            )
            bounds = np.unique(
                np.concatenate([[0], marks + 1, [len(pi)]])
            )
            for ca, cb in zip(bounds[:-1], bounds[1:]):
                cpi, cqi = pi[ca:cb], qi[ca:cb]
                scnt = scnt_all[ca:cb]
                total = int(scnt.sum())
                p_of = np.repeat(np.arange(len(cpi)), scnt)
                vsel = np.repeat(lstart[cpi], scnt) + (
                    np.arange(total)
                    - np.repeat(np.cumsum(scnt) - scnt, scnt)
                )
                sx, sy = fx[vsel], fy[vsel]
                sx, sy, p_of, scnt2 = _clip_pairs(
                    sx, sy, p_of, scnt, RX, RY, cqi
                )
                area = _pair_areas(sx, sy, p_of, scnt2)
                keep = area > 0.0
                out_l.append(pids_all[ls[cpi[keep]]])
                out_r.append(pids_all[rs[cqi[keep]]])
                out_a.append(area[keep])
        if not out_l:
            return pa.table(
                {
                    left_id: pa.array([], pa.int64()),
                    right_id: pa.array([], pa.int64()),
                    "area": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                left_id: pa.array(
                    np.concatenate(out_l).astype(np.int64)
                ),
                right_id: pa.array(
                    np.concatenate(out_r).astype(np.int64)
                ),
                "area": pa.array(np.concatenate(out_a)),
            }
        )

    _kernel._size_expanding = True  # pair emission per tile
    return grouped_by_key(u, ["tile"], _kernel, num_buckets=num_buckets)


def overlay_difference(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    cell_size: float | None = None,
    pieces: ray.data.Dataset | None = None,
    key: str = "left_id",
) -> ray.data.Dataset:
    """(left_id, area) of each left polygon MINUS the right layer —
    ``spatial_overlay(..., how='difference')`` attributes. Assumes the
    right layer is internally non-overlapping (intersection areas then
    subtract additively); left polygons fully covered by the right
    layer drop out (area 0), uncovered ones keep their full area.

    ``pieces``/``key``: an already-computed intersection table to
    aggregate by ``key`` instead of re-running the tiled clip —
    ``overlay()`` shares ONE materialized piece table across its
    union/identity/symmetric_difference branches this way."""

    def _areas(t: pa.Table) -> pa.Table:
        pids, x, y, off = _ring_parts(t)
        if len(off) <= 1:
            return pa.table(
                {"left_id": pa.array([], pa.int64()),
                 "full_area": pa.array([], pa.float64())}
            )
        x, y, off = _open_rings(x, y, off)
        cnt = off[1:] - off[:-1]
        idx = np.arange(len(x))
        nxt = idx + 1
        ne = cnt > 0
        nxt[off[1:][ne] - 1] = off[:-1][ne]
        cr = x * y[nxt] - x[nxt] * y
        a2 = np.add.reduceat(cr, off[:-1]) if len(x) else np.zeros(0)
        return pa.table(
            {
                "left_id": pa.array(pids.astype(np.int64)),
                "full_area": pa.array(np.abs(a2) / 2.0),
            }
        )

    full = left.map_batches(_areas, batch_format="pyarrow")
    if pieces is None:
        pieces = overlay_intersection(left, right, cell_size=cell_size)
    if key != "left_id":
        pieces = pieces.map_batches(
            lambda t, _k=key: pa.table({
                "left_id": t.column(_k), "area": t.column("area"),
            }),
            batch_format="pyarrow",
        )
    inter = (
        pieces.groupby("left_id")
        .sum("area")
        .rename_columns({"sum(area)": "cut_area"})
    )
    if inter.schema() is None:
        # no intersecting pair anywhere: every left polygon survives whole
        inter = ray.data.from_arrow(
            pa.table(
                {"left_id": pa.array([], pa.int64()),
                 "cut_area": pa.array([], pa.float64())}
            )
        )
    joined = bucket_join(full, inter, on="left_id", how="left")

    def _sub(t: pa.Table) -> pa.Table:
        fa = t.column("full_area").to_numpy(zero_copy_only=False)
        ca = t.column("cut_area").to_numpy(zero_copy_only=False)
        ca = np.where(np.isnan(ca), 0.0, ca)
        area = fa - ca
        keep = area > 0.0
        return pa.table(
            {
                "left_id": t.column("left_id").filter(pa.array(keep)),
                "area": pa.array(area[keep]),
            }
        )

    return joined.map_batches(_sub, batch_format="pyarrow")


def _null_side(ds: ray.data.Dataset, present: str, absent: str):
    """Lift a one-sided difference table (id, area) into the union
    schema (left_id, right_id, area) with nulls on the absent side."""

    def _f(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("left_id"), pa.int64())
        nulls = pa.nulls(t.num_rows, pa.int64())
        cols = {present: ids, absent: nulls, "area": t.column("area")}
        return pa.table(
            {k: cols[k] for k in ("left_id", "right_id", "area")}
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def overlay(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    how: str = "intersection",
    cell_size: float | None = None,
) -> ray.data.Dataset:
    """Reference ``spatial_overlay(df1, df2, how)`` attribute table
    (``cg/ops/tabular.py:75-120``): all five geopandas modes, composed
    from the two tiled primitives. Output schema is uniformly
    (left_id, right_id, area); a difference piece carries a NULL id on
    the side it excludes.

    100 TB shape: each primitive is one tile shuffle; the composition
    unions 2-3 independent streaming pipelines (Ray shares no subplans,
    so ``left``/``right`` are re-read per primitive — reads stream, so
    this trades re-scan for zero materialization). Pass ``cell_size``
    to pin one grid across the primitives."""
    if how == "intersection":
        return overlay_intersection(left, right, cell_size=cell_size)
    if cell_size is None:
        cell_size = _auto_cell(left, right)
    if how == "difference":
        # single consumer: stream straight through, no materialize
        return overlay_difference(left, right, cell_size=cell_size)
    # ONE tiled clip pass; the remaining modes consume the piece table
    # 2-3 times, so materialize it once (pairs only — far narrower than
    # the polygon layers) instead of re-running the intersection per
    # branch (Ray shares no subplans)
    pieces = overlay_intersection(
        left, right, cell_size=cell_size
    ).materialize()
    parts: list[ray.data.Dataset] = []
    if how in ("union", "identity"):
        parts.append(pieces)
    if how in ("union", "identity", "symmetric_difference"):
        ldiff = overlay_difference(left, right, cell_size=cell_size,
                                   pieces=pieces)
        parts.append(_null_side(ldiff, "left_id", "right_id"))
    if how in ("union", "symmetric_difference"):
        # right-minus-left: aggregate the SAME pieces by right_id
        # (assumes LEFT internally disjoint)
        rdiff = overlay_difference(right, left, cell_size=cell_size,
                                   pieces=pieces, key="right_id")
        parts.append(_null_side(rdiff, "right_id", "left_id"))
    if not parts:
        raise ValueError(
            "how must be one of intersection/union/identity/"
            f"difference/symmetric_difference, got {how!r}"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def areal_interpolate(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    src_vals: ray.data.Dataset,
    src_area16: int,
    left_id: str = "left_id",
    right_id: str = "right_id",
    val_col: str = "v",
) -> ray.data.Dataset:
    """Area-weighted areal interpolation (the tobler-style transfer of
    an extensive attribute from source polygons onto target zones):
    value(t) = Σ_s v_s · area(s∩t)/area(s). Exact-integer variant for
    UNIFORM source polygons: every source has the same area
    ``src_area16``/16 (sixteenth units — quarter-integer geometry keeps
    each pairwise intersection area an exact multiple of 1/16), so the
    result is the exact fraction val_num/val_den with val_den =
    src_area16 constant. Heterogeneous source areas need a float path —
    raise there rather than silently mixing denominators. Output one
    row per target zone with ≥1 intersecting source: (zone, val_num,
    val_den, val_f).

    100 TB shape: rides :func:`overlay_intersection`'s tile shuffle
    (the only geometry pass), ONE value bucket_join on the source id
    and ONE groupby(zone) integer sum — no driver-side geometry."""
    from libpysal_ray.core.joins import bucket_join

    if src_area16 <= 0:
        raise ValueError("src_area16 must be a positive sixteenth count")
    pairs = overlay_intersection(
        left, right, left_id=left_id, right_id=right_id
    )

    def _a16(t: pa.Table) -> pa.Table:
        a = t.column("area").to_numpy(zero_copy_only=False)
        a16 = a * 16.0
        r = np.rint(a16)
        if np.abs(a16 - r).max(initial=0.0) != 0.0:
            raise ValueError(
                "areal_interpolate needs quarter-integer geometry "
                "(intersection areas must be exact sixteenths)"
            )
        return pa.table({
            right_id: t.column(right_id),
            "zone": t.column(left_id),
            "a16": pa.array(r.astype(np.int64)),
        })

    j = bucket_join(
        pairs.map_batches(_a16, batch_format="pyarrow"),
        src_vals.map_batches(
            lambda t: pa.table({
                right_id: t.column(right_id),
                "v": pa.array(
                    t.column(val_col).to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
            }),
            batch_format="pyarrow",
        ),
        on=right_id,
    )

    def _terms(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False)
        a16 = t.column("a16").to_numpy(zero_copy_only=False)
        if len(v) and (
            int(np.abs(v).max()) * int(np.abs(a16).max()) >= (1 << 56)
        ):
            raise ValueError("areal_interpolate terms would overflow "
                             "int64; rescale values")
        return pa.table({
            "zone": t.column("zone"),
            "term": pa.array(v * a16),
        })

    agg = j.map_batches(_terms, batch_format="pyarrow").groupby(
        "zone"
    ).sum("term")

    def _out(t: pa.Table) -> pa.Table:
        num = t.column("sum(term)").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table({
            "zone": t.column("zone"),
            "val_num": pa.array(num),
            "val_den": pa.array(
                np.full(len(num), src_area16, dtype=np.int64)
            ),
            "val_f": pa.array(num.astype(np.float64)
                              / np.float64(src_area16)),
        })

    return agg.map_batches(_out, batch_format="pyarrow")

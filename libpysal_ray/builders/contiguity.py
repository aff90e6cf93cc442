"""Polygon contiguity builders — Queen/Rook by shared-vertex/edge hashing.

Reference semantics: weights/_contW_lists.py:70-128 (legacy hash builder)
and graph/_contiguity.py:13-91 ``_vertex_set_intersection``:

* Queen: two polygons are neighbors iff they share ≥1 vertex. The reference
  inverts a ``vertex → {polygon ids}`` hash map keyed on RAW coordinate
  tuples (no rounding — _contW_lists.py:89-99); we key on the float64 BIT
  PATTERNS, so equality semantics are bit-exact identical.
* Rook: neighbors iff they share ≥1 full edge; key = the sorted vertex pair
  of each boundary segment (_contW_lists.py:103-124).

Ray-Data plan: the reference's in-memory hash map becomes the shuffle —
``flat_map`` polygons → (vertex-key, poly_id) rows → ``groupby(key)`` →
per-bucket emit all ordered pairs → global dedup → isolate resolution.
Scales: the shuffle key space is the vertex set; no polygon geometry moves
after the explode.

Polygon input schema: ``polygon_id: int64, xs: list<double>,
ys: list<double>`` (single outer ring, closing vertex optional; multi-part
polygons may list parts under the same id — vertices are deduped per id so
no phantom self-edges arise, mirroring _contiguity.py:50-64's per-part
offset guard).

Also here: block/regime weights (util.py:235-294 — all members of a regime
are mutual neighbors) as one groupby(regime) cross-product.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from libpysal_ray.core import edges as E
from libpysal_ray.core.graph import RayGraph


def _f2i(a: np.ndarray) -> np.ndarray:
    """float64 → int64 bit pattern (exact-equality hash key; normalize -0.0)."""
    a = np.asarray(a, dtype=np.float64) + 0.0  # -0.0 → +0.0
    return a.view(np.int64)


def _explode_vertices(t: pa.Table) -> pa.Table:
    """(polygon_id, xs, ys) → (kx, ky, poly) one row per DISTINCT vertex."""
    pids = t.column("polygon_id").to_numpy(zero_copy_only=False)
    xs = t.column("xs").to_pylist()
    ys = t.column("ys").to_pylist()
    out_kx, out_ky, out_p = [], [], []
    for pid, xr, yr in zip(pids, xs, ys):
        kx = _f2i(np.asarray(xr))
        ky = _f2i(np.asarray(yr))
        uniq = np.unique(np.stack([kx, ky], axis=1), axis=0)
        out_kx.append(uniq[:, 0])
        out_ky.append(uniq[:, 1])
        out_p.append(np.full(len(uniq), pid, dtype=np.int64))
    return pa.table(
        {
            "kx": pa.array(np.concatenate(out_kx) if out_kx else np.empty(0, np.int64)),
            "ky": pa.array(np.concatenate(out_ky) if out_ky else np.empty(0, np.int64)),
            "poly": pa.array(np.concatenate(out_p) if out_p else np.empty(0, np.int64)),
        }
    )


def _explode_edges(t: pa.Table) -> pa.Table:
    """(polygon_id, xs, ys) → (k1x, k1y, k2x, k2y, poly) per boundary segment,
    vertex pair sorted so both polygons key identically."""
    pids = t.column("polygon_id").to_numpy(zero_copy_only=False)
    xs = t.column("xs").to_pylist()
    ys = t.column("ys").to_pylist()
    cols: dict[str, list] = {k: [] for k in ("k1x", "k1y", "k2x", "k2y", "poly")}
    for pid, xr, yr in zip(pids, xs, ys):
        x = np.asarray(xr, dtype=np.float64)
        y = np.asarray(yr, dtype=np.float64)
        # ensure closed ring
        if x[0] != x[-1] or y[0] != y[-1]:
            x = np.append(x, x[0])
            y = np.append(y, y[0])
        ax, ay = _f2i(x[:-1]), _f2i(y[:-1])
        bx, by = _f2i(x[1:]), _f2i(y[1:])
        # drop degenerate zero-length segments
        ok = (ax != bx) | (ay != by)
        ax, ay, bx, by = ax[ok], ay[ok], bx[ok], by[ok]
        # canonical order: (a <= b) lexicographically
        swap = (ax > bx) | ((ax == bx) & (ay > by))
        k1x = np.where(swap, bx, ax)
        k1y = np.where(swap, by, ay)
        k2x = np.where(swap, ax, bx)
        k2y = np.where(swap, ay, by)
        # dedup segments within the polygon
        seg = np.stack([k1x, k1y, k2x, k2y], axis=1)
        seg = np.unique(seg, axis=0)
        cols["k1x"].append(seg[:, 0])
        cols["k1y"].append(seg[:, 1])
        cols["k2x"].append(seg[:, 2])
        cols["k2y"].append(seg[:, 3])
        cols["poly"].append(np.full(len(seg), pid, dtype=np.int64))
    return pa.table(
        {
            k: pa.array(
                np.concatenate(v) if v else np.empty(0, np.int64)
            )
            for k, v in cols.items()
        }
    )


def _bucket_pairs(t: pa.Table) -> pa.Table:
    """All ordered pairs of distinct polygon ids sharing one bucket."""
    p = np.unique(t.column("poly").to_numpy(zero_copy_only=False))
    m = len(p)
    if m < 2:
        return E.empty_edges()
    f = np.repeat(p, m)
    n = np.tile(p, m)
    keep = f != n
    return E.edge_table(f[keep], n[keep], 1.0)


def _pairs_sorted_block(key_cols: list[str]):
    """Vectorized multi-group pair emission over a key-SORTED block.

    Ray's sort range-partitions with consistent boundary handling, so rows
    with equal keys never straddle blocks — the same guarantee map_groups
    relies on. Instead of one Python call per vertex bucket (the map_groups
    cost model), this processes every bucket in the block at once: groups
    are found by run-length over the sorted keys, then pair cross-products
    are emitted per group-SIZE class with one broadcasted numpy op each
    (bucket sizes are tiny — ≤4 for lattice vertices — so there are only a
    handful of size classes per block).
    """

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return E.empty_edges()
        keys = [
            t.column(c).to_numpy(zero_copy_only=False) for c in key_cols
        ]
        poly = t.column("poly").to_numpy(zero_copy_only=False)
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for k in keys:
            change[1:] |= k[1:] != k[:-1]
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, n))
        out_f, out_n = [], []
        for m in np.unique(sizes):
            if m < 2:
                continue
            s = starts[sizes == m]
            mat = poly[s[:, None] + np.arange(m)[None, :]]  # (G, m)
            ff = np.repeat(mat, m, axis=1).ravel()
            nn = np.tile(mat, (1, m)).ravel()
            keep = ff != nn
            out_f.append(ff[keep])
            out_n.append(nn[keep])
        if not out_f:
            return E.empty_edges()
        return E.edge_table(
            np.concatenate(out_f), np.concatenate(out_n), 1.0
        )

    return f


def queen(polygons: ray.data.Dataset) -> RayGraph:
    """Queen contiguity — shared-vertex hash shuffle."""
    ids = polygons.select_columns(["polygon_id"]).rename_columns(
        {"polygon_id": "focal"}
    )
    verts = polygons.map_batches(_explode_vertices, batch_format="pyarrow")
    pairs = verts.sort(["kx", "ky"]).map_batches(
        _pairs_sorted_block(["kx", "ky"]), batch_format="pyarrow"
    )
    edges = E.dedup(
        pairs.map_batches(E.batch_dedup, batch_format="pyarrow")
    )
    return RayGraph(E.resolve_isolates(edges, ids))


def rook(polygons: ray.data.Dataset) -> RayGraph:
    """Rook contiguity — shared-edge hash shuffle."""
    ids = polygons.select_columns(["polygon_id"]).rename_columns(
        {"polygon_id": "focal"}
    )
    segs = polygons.map_batches(_explode_edges, batch_format="pyarrow")
    pairs = segs.sort(["k1x", "k1y", "k2x", "k2y"]).map_batches(
        _pairs_sorted_block(["k1x", "k1y", "k2x", "k2y"]), batch_format="pyarrow"
    )
    edges = E.dedup(
        pairs.map_batches(E.batch_dedup, batch_format="pyarrow")
    )
    return RayGraph(E.resolve_isolates(edges, ids))


def block(
    table: ray.data.Dataset, id_col: str, regime_col: str
) -> RayGraph:
    """Block/regime weights: members of a regime are mutual neighbors
    excluding self (util.py:235-294, graph/_contiguity.py:209-237).

    One groupby(regime) cross-product. Hot regimes emit O(m²) edges — that
    is the operator's defined output size, not a plan artifact.
    """
    ids = table.select_columns([id_col]).rename_columns({id_col: "focal"})

    def _cross(t: pa.Table) -> pa.Table:
        p = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(p)
        if m < 2:
            return E.empty_edges()
        f = np.repeat(p, m)
        n = np.tile(p, m)
        keep = f != n
        return E.edge_table(f[keep], n[keep], 1.0)

    edges = table.groupby(regime_col).map_groups(_cross, batch_format="pyarrow")
    return RayGraph(E.resolve_isolates(edges, ids))

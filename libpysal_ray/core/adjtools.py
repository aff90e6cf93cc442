"""Adjacency-list function mapping (reference ``weights/adjtools.py``).

``adjlist_apply`` (adjtools.py:6-86) evaluates a binary function on the
(focal attribute, neighbor attribute) pair of every edge; the
multivariate form (adjtools.py:89-128) hands the function two P-length
rows. ``adjlist_map`` (adjtools.py:157-226) maps one function per
covariate column. The reference materializes pandas merges and applies
the function row-by-row; here the attribute attach is the engine's
size-switched ``bucket_join`` / broadcast lookup on the edge Dataset
(the same path ``lag`` uses) and the function is applied once per Arrow
batch to whole numpy arrays — so ``func`` must accept arrays, which the
reference's documented examples (``np.subtract``, ``lambda x, y: x < y``,
``lambda x, y: ((x - y) ** 2).sum(-1)``) already do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from libpysal_ray.core.graph import _attach_attr


def _attach_both(edges, attr_ids, values, name, id_col, val_col):
    out = _attach_attr(
        edges, attr_ids, values, key_col="focal",
        out_col=f"{name}_focal", id_col=id_col, val_col=val_col,
    )
    return _attach_attr(
        out, attr_ids, values, key_col="neighbor",
        out_col=f"{name}_neighbor", id_col=id_col, val_col=val_col,
    )


def adjlist_apply(
    graph,
    attr_ids,
    attr_values=None,
    func=np.subtract,
    id_col: str = "id",
    val_col: str = "value",
    name: str | None = None,
) -> ray.data.Dataset:
    """Apply ``func`` to every edge's (focal, neighbor) attribute pair.

    ``graph`` is a RayGraph or an edge Dataset. ``attr_ids`` is either a
    numpy id array with ``attr_values`` of shape (N,) or (N, P) —
    broadcast once via ray.put — or an attribute Dataset with
    (``id_col``, ``val_col``) columns, attached by a distributed
    bucket_join (the 100 TB path; single column). For (N, P) values,
    ``func`` receives two (batch, P) arrays and must return one value
    per row (reference _adjlist_mvapply semantics). Returns the edge
    Dataset with ``att_focal`` / ``att_neighbor`` (single-column case)
    and the result column named ``name`` or ``func.__name__``.
    """
    edges = graph.edges if hasattr(graph, "edges") else graph
    col = name or getattr(func, "__name__", "result")

    if isinstance(attr_ids, ray.data.Dataset):
        if attr_values is not None:
            raise ValueError(
                "pass EITHER an attribute Dataset (attr_ids with "
                "id_col/val_col) OR numpy ids + attr_values — got both; "
                "the Dataset path would silently ignore attr_values"
            )
        out = _attach_both(edges, attr_ids, None, "att", id_col, val_col)

        def _apply(t: pa.Table) -> pa.Table:
            xf = t.column("att_focal").to_numpy(zero_copy_only=False)
            xn = t.column("att_neighbor").to_numpy(zero_copy_only=False)
            return t.append_column(col, pa.array(np.asarray(func(xf, xn))))

        return out.map_batches(_apply, batch_format="pyarrow")

    if attr_values is not None and np.asarray(attr_values).ndim == 1:
        out = _attach_both(edges, attr_ids, attr_values, "att",
                           id_col, val_col)

        def _apply1(t: pa.Table) -> pa.Table:
            xf = t.column("att_focal").to_numpy(zero_copy_only=False)
            xn = t.column("att_neighbor").to_numpy(zero_copy_only=False)
            return t.append_column(col, pa.array(np.asarray(func(xf, xn))))

        return out.map_batches(_apply1, batch_format="pyarrow")

    # multivariate numpy path: the whole (N, P) matrix broadcast ONCE
    # via ray.put; one map_batches does both endpoint lookups per batch
    vals = np.asarray(attr_values, dtype=np.float64)
    if vals.ndim != 2:
        raise ValueError("attr_values must be (N,) or (N, P)")
    return edges.map_batches(
        _mv_lookup_apply(attr_ids, vals, [(col, func, None)]),
        batch_format="pyarrow",
    )


def _mv_lookup_apply(attr_ids, vals, specs, emit_attrs=None):
    """Per-batch closure over a ONE-time ray.put broadcast of the sorted
    (ids, (N, P) values): looks up the focal and neighbor attribute rows
    with two searchsorted probes and appends result columns.

    ``specs``: list of (out_col, func, j) — ``j=None`` hands func the
    full (batch, P) matrices (adjlist_apply multivariate), an int hands
    it column j (adjlist_map). ``emit_attrs``: optional list of
    (name, j) also emitting ``{name}_focal`` / ``{name}_neighbor``.
    Raises loudly on edge ids missing from ``attr_ids``."""
    ids = np.asarray(attr_ids, np.int64)
    vals = np.asarray(vals, np.float64)
    order = np.argsort(ids, kind="stable")
    ref = ray.put((ids[order], vals[order]))

    def _lookup(k: np.ndarray, q: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(k, q)
        bad = (pos >= len(k)) | (k[np.minimum(pos, len(k) - 1)] != q)
        if bad.any():
            raise ValueError(
                f"{int(bad.sum())} edge ids missing from attr_ids "
                f"(first: {int(q[bad][0])})"
            )
        return pos

    def _f(t: pa.Table) -> pa.Table:
        k, m = ray.get(ref)
        f = t.column("focal").to_numpy(zero_copy_only=False)
        n = t.column("neighbor").to_numpy(zero_copy_only=False)
        xf = m[_lookup(k, f)]
        xn = m[_lookup(k, n)]
        for name, j in (emit_attrs or []):
            t = t.append_column(f"{name}_focal", pa.array(xf[:, j]))
            t = t.append_column(f"{name}_neighbor", pa.array(xn[:, j]))
        for out_col, func, j in specs:
            a = xf if j is None else xf[:, j]
            b = xn if j is None else xn[:, j]
            t = t.append_column(out_col, pa.array(np.asarray(func(a, b))))
        return t

    return _f


def filter_adjlist(graph_or_edges) -> ray.data.Dataset:
    """Undirected dedup of an adjacency list: ONE row per unordered
    {a, b} pair (reference adjtools.py:230-276; it keeps the first row
    in pandas iteration order — a distributed Dataset has no row order,
    so the kept row here is canonical: the (lo→hi) orientation when any
    such row exists, else (hi→lo), with the MIN weight among kept-
    orientation duplicates; sort the reference's input likewise for
    parity). One grouped-aggregate shuffle on the canonical pair; no
    driver state."""
    from libpysal_ray.core import joins as J

    edges = (graph_or_edges.edges if hasattr(graph_or_edges, "edges")
             else graph_or_edges)

    def _canon(t: pa.Table) -> pa.Table:
        f = t.column("focal").to_numpy(zero_copy_only=False)
        n = t.column("neighbor").to_numpy(zero_copy_only=False)
        w = t.column("weight").to_numpy(zero_copy_only=False)
        fwd = f <= n
        return pa.table({
            "lo": pa.array(np.minimum(f, n)),
            "hi": pa.array(np.maximum(f, n)),
            "has_fwd": pa.array(fwd.astype(np.int64)),
            "w_fwd": pa.array(np.where(fwd, w, np.inf)),
            "w_rev": pa.array(np.where(fwd, np.inf, w)),
        })

    g = J.grouped_agg(
        edges.map_batches(_canon, batch_format="pyarrow"),
        ("lo", "hi"), ("has_fwd", "w_fwd", "w_rev"),
        ("max", "min", "min"),
    )

    def _emit(t: pa.Table) -> pa.Table:
        lo = t.column("lo").to_numpy(zero_copy_only=False)
        hi = t.column("hi").to_numpy(zero_copy_only=False)
        fwd = t.column("max(has_fwd)").to_numpy(zero_copy_only=False) > 0
        w1 = t.column("min(w_fwd)").to_numpy(zero_copy_only=False)
        w0 = t.column("min(w_rev)").to_numpy(zero_copy_only=False)
        return pa.table({
            "focal": pa.array(np.where(fwd, lo, hi)),
            "neighbor": pa.array(np.where(fwd, hi, lo)),
            "weight": pa.array(np.where(fwd, w1, w0)),
        })

    return g.map_batches(_emit, batch_format="pyarrow")


def adjlist_map(
    graph,
    attr_ids,
    data,
    funcs=(np.subtract,),
    names: list[str] | None = None,
) -> ray.data.Dataset:
    """Map one function per covariate column over the adjacency list
    (reference adjtools.py:157-226): ``data`` is (N, P); a single
    callable is replicated across all P columns. Returns the edge
    Dataset with, per column j, ``{name_j}_focal`` / ``{name_j}_neighbor``
    and the result column ``{func.__name__}_{name_j}``.
    """
    data = np.asarray(data, dtype=np.float64)
    if data.ndim == 1:
        data = data[:, None]
    p = data.shape[1]
    if callable(funcs):
        funcs = (funcs,)
    if len(funcs) == 1:
        funcs = [funcs[0]] * p
    if len(funcs) != p:
        raise ValueError(
            f"{len(funcs)} functions for {p} data columns"
        )
    if names is None:
        names = [str(j) for j in range(p)]
    if isinstance(attr_ids, ray.data.Dataset):
        raise ValueError(
            "adjlist_map takes numpy ids + an (N, P) data matrix; for a "
            "single attribute Dataset column use adjlist_apply"
        )
    edges = graph.edges if hasattr(graph, "edges") else graph
    # ONE broadcast of the whole (N, P) matrix + one map_batches with
    # two endpoint lookups — not 2P sequential attach passes
    specs = [
        (f"{getattr(fn, '__name__', 'f')}_{names[j]}", fn, j)
        for j, fn in enumerate(funcs)
    ]
    return edges.map_batches(
        _mv_lookup_apply(attr_ids, data, specs,
                         emit_attrs=[(names[j], j) for j in range(p)]),
        batch_format="pyarrow",
    )

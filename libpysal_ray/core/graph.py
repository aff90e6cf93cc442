"""RayGraph — the engine's spatial-weights graph over a Ray Dataset.

Reimplements the semantics of the reference's two graph abstractions
(legacy ``W``: /root/reference/libpysal/weights/weights.py:134-197; modern
``Graph``: /root/reference/libpysal/graph/base.py:68-141) on a single lazy
``ray.data.Dataset`` edge table ``(focal, neighbor, weight)``.

Physical-plan notes (this is what makes it Ray-Data-first, not a port):

* transforms B is a stateless per-edge ``map_batches``; R is ONE
  ``groupby(focal).map_groups`` (no join-back needed — the group holds the
  whole row); D and V are two-pass: a global aggregate reduced to a driver
  scalar, broadcast into a per-edge map;
* spatial lag joins the attribute vector on ``neighbor`` (broadcast for
  small attrs, distributed hash join otherwise) then ``groupby(focal).sum``;
* higher-order is k−1 distributed hash self-joins with per-batch dedup
  before each shuffle;
* set ops are cogroups: tag each side, union, one groupby on
  (focal, neighbor), per-group bitmask logic;
* summary scalars (s0/s1/s2, traces) are groupby/aggregate pipelines — no
  sparse matrix is ever materialized.

Isolates are zero-weight self-loops throughout (reference
graph/_utils.py:248-272), and canonical (focal, neighbor) order is applied
only at the serialize/compare boundary.
"""

from __future__ import annotations

import math
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from libpysal_ray.core import edges as E
from libpysal_ray.core import joins as J

ALLOWED_TRANSFORMATIONS = ("O", "B", "R", "D", "V")


def ids_dataset(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct focal ids as a Dataset (distributed unique via groupby)."""
    return edges.select_columns(["focal"]).groupby("focal").count().select_columns(["focal"])


def all_ids_dataset(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct ids over focal ∪ neighbor."""
    f = edges.select_columns(["focal"])
    n = edges.select_columns(["neighbor"]).rename_columns({"neighbor": "focal"})
    return f.union(n).groupby("focal").count().select_columns(["focal"])


class RayGraph:
    """Immutable spatial-weights graph; every op returns a new RayGraph.

    (Reference Graph is likewise immutable — graph/_set_ops.py:41-45.)
    """

    def __init__(self, edges: ray.data.Dataset, transformation: str = "O"):
        self._edges = edges
        self.transformation = transformation

    # ------------------------------------------------------------------ io
    @classmethod
    def from_arrays(cls, focal, neighbor, weight=1.0, ids=None) -> "RayGraph":
        ds = E.from_arrays(focal, neighbor, weight)
        if ids is not None:
            ds = E.resolve_isolates(ds, np.asarray(ids, dtype=np.int64))
        else:
            # id universe = focal ∪ neighbor (ids seen only as neighbors must
            # still exist as observations — reference W keys every id)
            ds = E.resolve_isolates(ds, all_ids_dataset(ds))
        return cls(ds)

    @classmethod
    def from_parquet(cls, path: str, **kwargs) -> "RayGraph":
        return cls(ray.data.read_parquet(path, **kwargs))

    @classmethod
    def from_pandas_adjlist(cls, df: pd.DataFrame) -> "RayGraph":
        return cls.from_arrays(
            df["focal"].to_numpy(np.int64),
            df["neighbor"].to_numpy(np.int64),
            df["weight"].to_numpy(np.float64),
        )

    def to_parquet(self, path: str) -> None:
        """Canonical-order partitioned Parquet (the reference's own native
        Graph serialization is this exact table — graph/io/_parquet.py)."""
        E.canonical(self._edges).write_parquet(path)

    # ------------------------------------------------------------ accessors
    @property
    def edges(self) -> ray.data.Dataset:
        return self._edges

    def canonical_edges(self) -> ray.data.Dataset:
        return E.canonical(self._edges)

    def to_pandas(self) -> pd.DataFrame:
        """Driver-side canonical adjacency frame — small graphs/tests only."""
        df = self.canonical_edges().to_pandas()
        return df.reset_index(drop=True)

    def neighbors_dict(self) -> tuple[dict, dict]:
        """(neighbors, weights) dicts — the legacy-W presentation
        (weights.py:134-197). Driver-side; small graphs/tests only."""
        df = self.to_pandas()
        neighbors: dict = {}
        weights: dict = {}
        for f, g in df.groupby("focal", sort=True):
            is_marker = (g["neighbor"] == f) & (g["weight"] == 0.0)
            real = g[~is_marker]
            neighbors[int(f)] = [int(x) for x in real["neighbor"]]
            weights[int(f)] = [float(x) for x in real["weight"]]
        return neighbors, weights

    # ------------------------------------------------------------- scalars
    def n(self) -> int:
        return ids_dataset(self._edges).count()

    def nonzero(self) -> int:
        return self._edges.filter(
            lambda r: r["weight"] != 0.0 or r["focal"] != r["neighbor"]
        ).count()

    # ----------------------------------------------------------- transforms
    def transform(self, code: str | Callable) -> "RayGraph":
        """B/R/D/V weight transforms (semantics: weights.py:1074-1184,
        graph/base.py:1827-1902). Callable → per-row-group transform ('C')."""
        if isinstance(code, str):
            code = code.upper()
        ds = self._edges

        if code == "B":
            def _b(t: pa.Table) -> pa.Table:
                w = t.column("weight").to_numpy(zero_copy_only=False)
                return t.set_column(
                    t.schema.get_field_index("weight"),
                    "weight",
                    pa.array((w != 0.0).astype(np.float64)),
                )
            return RayGraph(ds.map_batches(_b, batch_format="pyarrow"), "B")

        if code == "R":
            def _r(t: pa.Table) -> pa.Table:
                w = t.column("weight").to_numpy(zero_copy_only=False)
                s = w.sum()
                out = w / s if s != 0.0 else w  # isolate rows stay 0
                return t.set_column(
                    t.schema.get_field_index("weight"), "weight", pa.array(out)
                )
            return RayGraph(
                ds.groupby("focal").map_groups(_r, batch_format="pyarrow"), "R"
            )

        if code == "D":
            s0 = float(ds.sum("weight") or 0.0)
            def _d(t: pa.Table) -> pa.Table:
                w = t.column("weight").to_numpy(zero_copy_only=False)
                return t.set_column(
                    t.schema.get_field_index("weight"), "weight", pa.array(w / s0)
                )
            return RayGraph(ds.map_batches(_d, batch_format="pyarrow"), "D")

        if code == "V":
            # pass 1: s_ij = w_ij / sqrt(sum_j w_ij^2) per row
            def _v1(t: pa.Table) -> pa.Table:
                w = t.column("weight").to_numpy(zero_copy_only=False)
                q = math.sqrt(float((w * w).sum()))
                out = w / q if q != 0.0 else w
                return t.set_column(
                    t.schema.get_field_index("weight"), "weight", pa.array(out)
                )
            s = ds.groupby("focal").map_groups(_v1, batch_format="pyarrow")
            # pass 2: global rescale n / Q (weights.py:1160-1173)
            s = s.materialize()  # avoid recomputing pass 1 for Q and output
            big_q = float(s.sum("weight") or 0.0)
            n = self.n()
            nq = n / big_q if big_q != 0.0 else 0.0
            def _v2(t: pa.Table) -> pa.Table:
                w = t.column("weight").to_numpy(zero_copy_only=False)
                return t.set_column(
                    t.schema.get_field_index("weight"), "weight", pa.array(w * nq)
                )
            return RayGraph(s.map_batches(_v2, batch_format="pyarrow"), "V")

        if callable(code):
            fn = code
            def _c(t: pa.Table) -> pa.Table:
                w = t.column("weight").to_numpy(zero_copy_only=False)
                out = np.asarray(fn(w), dtype=np.float64)
                return t.set_column(
                    t.schema.get_field_index("weight"), "weight", pa.array(out)
                )
            return RayGraph(
                ds.groupby("focal").map_groups(_c, batch_format="pyarrow"), "C"
            )

        raise ValueError(f"Transformation '{code}' is not supported.")

    # ------------------------------------------------------------- lag
    def lag(
        self,
        attr_ids: np.ndarray,
        attr_values: np.ndarray,
        broadcast: bool = True,
        num_partitions: int = 16,
    ) -> ray.data.Dataset:
        """Numeric spatial lag: (Wy)_i = sum_j w_ij * y_j.

        Semantics: weights/spatial_lag.py:16-88 / graph/base.py:2357-2413.
        Plan: attach y on ``neighbor`` (broadcast lookup or hash join), then
        ``groupby(focal).sum(weight*y)``. Returns Dataset (focal, lag).
        """
        if broadcast:
            withy = J.broadcast_lookup(
                self._edges,
                np.asarray(attr_ids, dtype=np.int64),
                np.asarray(attr_values, dtype=np.float64),
                key_col="neighbor",
                out_col="__y",
                default=0.0,
            )
        else:
            attrs = ray.data.from_arrow(
                pa.table(
                    {
                        "neighbor": pa.array(np.asarray(attr_ids, np.int64)),
                        "__y": pa.array(np.asarray(attr_values, np.float64)),
                    }
                )
            )
            withy = J.hash_join(
                self._edges, attrs, on=("neighbor",), num_partitions=num_partitions
            )

        def _wy(t: pa.Table) -> pa.Table:
            w = t.column("weight").to_numpy(zero_copy_only=False)
            y = t.column("__y").to_numpy(zero_copy_only=False)
            return pa.table(
                {"focal": t.column("focal"), "__wy": pa.array(w * y)}
            )

        return (
            withy.map_batches(_wy, batch_format="pyarrow")
            .groupby("focal")
            .sum("__wy")
            .rename_columns({"sum(__wy)": "lag"})
        )

    def lag_categorical(
        self,
        attr_ids: np.ndarray,
        attr_codes: np.ndarray,
        ties: str = "raise",
        seed: int = 42,
    ) -> ray.data.Dataset:
        """Categorical lag: weighted modal neighbor label (int codes).

        Semantics: weights/spatial_lag.py:91-241 (tie policies). Plan:
        attach code on neighbor → groupby(focal) → per-group weighted
        bincount argmax. ``ties``: 'raise' | 'random' (seeded by focal id —
        cluster-size independent) | 'tryself' is approximated by including
        the focal's own label with weight 0 (reference adds self weight).
        Returns Dataset (focal, lag_code).
        """
        withc = J.broadcast_lookup(
            self._edges,
            np.asarray(attr_ids, dtype=np.int64),
            np.asarray(attr_codes, dtype=np.float64),
            key_col="neighbor",
            out_col="__c",
            default=np.nan,
        )

        def _modal(t: pa.Table) -> pa.Table:
            f = int(t.column("focal")[0].as_py())
            w = t.column("weight").to_numpy(zero_copy_only=False)
            c = t.column("__c").to_numpy(zero_copy_only=False)
            ok = ~np.isnan(c) & (w != 0.0)
            if not ok.any():
                return pa.table({"focal": pa.array([f], pa.int64()),
                                 "lag_code": pa.array([-1], pa.int64())})
            codes = c[ok].astype(np.int64)
            ww = w[ok]
            tot = np.zeros(codes.max() + 1)
            np.add.at(tot, codes, ww)
            best = np.flatnonzero(tot == tot.max())
            if len(best) > 1:
                if ties == "raise":
                    raise ValueError(f"tie in categorical lag for focal {f}")
                if ties == "random":
                    rng = np.random.default_rng(seed + f)
                    best = best[rng.integers(0, len(best), 1)]
            return pa.table({"focal": pa.array([f], pa.int64()),
                             "lag_code": pa.array([int(best[0])], pa.int64())})

        return withc.groupby("focal").map_groups(_modal, batch_format="pyarrow")

    # ------------------------------------------------------ graph algebra
    def _real_edges(self) -> ray.data.Dataset:
        return self._edges.map_batches(
            E.drop_isolate_markers, batch_format="pyarrow"
        )

    def higher_order(
        self,
        k: int = 2,
        shortest_path: bool = True,
        lower_order: bool = False,
        diagonal: bool = False,
        num_partitions: int = 16,
    ) -> "RayGraph":
        """k-order neighbors (semantics: weights/util.py:442-553,
        graph/base.py:2274-2355). Binary matrix powers re-expressed as k−1
        distributed hash self-joins with per-batch dedup before each shuffle.
        """
        ids = ids_dataset(self._edges)
        adj = E.dedup(
            self._real_edges().map_batches(
                lambda t: _binarize(t), batch_format="pyarrow"
            )
        )
        if lower_order:
            shortest_path = True  # union of exact orders 1..k

        # seen = diagonal ∪ order-1 (excluded from "exactly k")
        diag = ids.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("focal"), t.column("focal"),
                 pa.array(np.ones(t.num_rows))],
                schema=E.EDGE_SCHEMA,
            ),
            batch_format="pyarrow",
        )
        seen = adj.union(diag)
        orders = [adj]
        cur = adj
        for _step in range(2, k + 1):
            left = cur.select_columns(["focal", "neighbor"]).rename_columns(
                {"neighbor": "mid"}
            )
            right = adj.select_columns(["focal", "neighbor"]).rename_columns(
                {"focal": "mid"}
            )
            joined = J.hash_join(
                left, right, on=("mid",), num_partitions=num_partitions
            ).select_columns(["focal", "neighbor"])
            cand = joined.map_batches(
                lambda t: E.batch_dedup(
                    t.append_column("weight", pa.array(np.ones(t.num_rows)))
                ),
                batch_format="pyarrow",
            )
            cand = E.dedup(cand)
            if shortest_path:
                nxt = J.anti_join_keys(cand, seen, ["focal", "neighbor"])
                seen = seen.union(cand)
            else:
                # path-of-length-k semantics: only remove the diagonal
                nxt = J.anti_join_keys(cand, diag, ["focal", "neighbor"])
            orders.append(nxt)
            cur = nxt

        if lower_order:
            out = orders[0]
            for o in orders[1:]:
                out = out.union(o)
            out = E.dedup(out)
        else:
            out = orders[-1]
        if not diagonal:
            out = out.filter(lambda r: r["focal"] != r["neighbor"])
        return RayGraph(E.resolve_isolates(out, ids))

    def symmetrize(self, method: str = "union", reduction: str = "max") -> "RayGraph":
        """make_symmetric (weights.py:1254-1274 / graph/base.py:2187-2272).

        union: W ∨ Wᵀ; intersection: keep only mutual links. ``reduction``
        resolves conflicting weights (max/min/sum/mean).
        """
        ids = ids_dataset(self._edges)
        real = self._real_edges()
        both = real.union(E.reverse(real))
        if method == "union":
            out = E.dedup(both, keep=reduction)
        elif method == "intersection":
            cnt = both.groupby(["focal", "neighbor"]).count()
            keep = cnt.filter(lambda r: r["count()"] >= 2).select_columns(
                ["focal", "neighbor"]
            )
            ded = E.dedup(both, keep=reduction)
            out = _semi_join_pairs(ded, keep)
        else:
            raise ValueError(method)
        return RayGraph(E.resolve_isolates(out, ids))

    def asymmetries(self) -> ray.data.Dataset:
        """Directed pairs where w_ij != w_ji (weights.py:1186-1252).

        Cogroup of W with Wᵀ on (focal, neighbor); emit keys present on one
        side only or with differing weights."""
        real = self._real_edges()
        a = E.tag(real, 0)
        b = E.tag(E.reverse(real), 1)

        def _check(t: pa.Table) -> pa.Table:
            side = t.column("side").to_numpy(zero_copy_only=False)
            w = t.column("weight").to_numpy(zero_copy_only=False)
            w0 = w[side == 0]
            w1 = w[side == 1]
            sym = len(w0) == 1 and len(w1) == 1 and w0[0] == w1[0]
            if sym:
                return t.slice(0, 0).select(["focal", "neighbor"])
            return t.slice(0, 1).select(["focal", "neighbor"])

        return (
            a.union(b)
            .groupby(["focal", "neighbor"])
            .map_groups(_check, batch_format="pyarrow")
        )

    # ------------------------------------------------------------- set ops
    def _setop(self, other: "RayGraph", mode: str) -> "RayGraph":
        """union/intersection/difference/symmetric_difference — binary
        results (set_operations.py:29-334 / graph/_set_ops.py). One cogroup
        shuffle on (focal, neighbor)."""
        ids_self = ids_dataset(self._edges)
        ids_other = ids_dataset(other._edges)
        a = E.tag(self._real_edges(), 0)
        b = E.tag(other._real_edges(), 1)

        keep_masks = {
            "union": (1, 2, 3),
            "intersection": (3,),
            "difference": (1,),
            "symmetric_difference": (1, 2),
        }
        keep = keep_masks[mode]

        def _op(t: pa.Table) -> pa.Table:
            side = t.column("side").to_numpy(zero_copy_only=False)
            mask = (1 if (side == 0).any() else 0) | (2 if (side == 1).any() else 0)
            if mask in keep:
                return pa.Table.from_arrays(
                    [t.column("focal").slice(0, 1), t.column("neighbor").slice(0, 1),
                     pa.array([1.0])],
                    schema=E.EDGE_SCHEMA,
                )
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], pa.float64())],
                schema=E.EDGE_SCHEMA,
            )

        out = (
            a.union(b)
            .groupby(["focal", "neighbor"])
            .map_groups(_op, batch_format="pyarrow")
        )
        # id universe per reference defaults: union/sym-diff → union of ids;
        # intersection/difference → ids of self (set_operations.py defaults)
        if mode in ("union", "symmetric_difference"):
            ids = E.dedup(
                ids_self.union(ids_other).map_batches(
                    lambda t: pa.Table.from_arrays(
                        [t.column("focal"), t.column("focal"),
                         pa.array(np.ones(t.num_rows))],
                        schema=E.EDGE_SCHEMA,
                    ),
                    batch_format="pyarrow",
                )
            ).select_columns(["focal"])
        else:
            ids = ids_self
        return RayGraph(E.resolve_isolates(out, ids))

    def union_g(self, other: "RayGraph") -> "RayGraph":
        return self._setop(other, "union")

    def intersection_g(self, other: "RayGraph") -> "RayGraph":
        return self._setop(other, "intersection")

    def difference_g(self, other: "RayGraph") -> "RayGraph":
        return self._setop(other, "difference")

    def symmetric_difference_g(self, other: "RayGraph") -> "RayGraph":
        return self._setop(other, "symmetric_difference")

    def w_clip(self, mask: "RayGraph") -> "RayGraph":
        """Keep self's weights only where mask has a (nonzero) link
        (set_operations.py:389-513)."""
        keep = mask._real_edges().filter(lambda r: r["weight"] != 0.0)
        out = _semi_join_pairs(self._real_edges(), keep.select_columns(["focal", "neighbor"]))
        return RayGraph(E.resolve_isolates(out, ids_dataset(self._edges)))

    def subgraph(self, keep_ids: np.ndarray) -> "RayGraph":
        """w_subset / Graph.subgraph (set_operations.py:337-386,
        base.py:2708-2770): broadcast id-set semi-join + isolate re-resolve."""
        keep = np.asarray(keep_ids, dtype=np.int64)
        out = E.filter_ids(self._real_edges(), keep, mode="both")
        return RayGraph(E.resolve_isolates(out, keep))

    def fill_diagonal(self, value: float = 1.0) -> "RayGraph":
        """Set self-loop weights (util.py:830-892 / base.py:2795-2872)."""
        ids = ids_dataset(self._edges)
        no_diag = self._edges.filter(lambda r: r["focal"] != r["neighbor"])
        diag = ids.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("focal"), t.column("focal"),
                 pa.array(np.full(t.num_rows, float(value)))],
                schema=E.EDGE_SCHEMA,
            ),
            batch_format="pyarrow",
        )
        return RayGraph(no_diag.union(diag))

    def eliminate_zeros(self) -> "RayGraph":
        """Drop zero-weight edges that are not isolate markers
        (base.py:2772-2793)."""
        ids = ids_dataset(self._edges)
        nz = self._edges.filter(lambda r: r["weight"] != 0.0)
        return RayGraph(E.resolve_isolates(nz, ids))

    # --------------------------------------------------------- descriptive
    def cardinalities(self) -> ray.data.Dataset:
        """Dataset (focal, cardinality) — marker rows count as 0
        (weights.py:747-756)."""

        def _card(t: pa.Table) -> pa.Table:
            f = t.column("focal").to_numpy(zero_copy_only=False)
            n = t.column("neighbor").to_numpy(zero_copy_only=False)
            w = t.column("weight").to_numpy(zero_copy_only=False)
            real = ~((f == n) & (w == 0.0))
            return pa.table(
                {"focal": pa.array(f[:1]),
                 "cardinality": pa.array([int(real.sum())], pa.int64())}
            )

        return self._edges.groupby("focal").map_groups(_card, batch_format="pyarrow")

    def isolates(self) -> ray.data.Dataset:
        return self.cardinalities().filter(lambda r: r["cardinality"] == 0).select_columns(["focal"])

    def summary(self) -> dict:
        """n, s0, s1, s2, trcW2/WtW/WtW_WW, pct_nonzero, mean/max card.

        All computed as distributed groupby/aggregate pipelines
        (semantics: weights.py:610-828, graph/_summary.py)."""
        real = self._real_edges().materialize()
        n = self.n()
        s0 = float(real.sum("weight") or 0.0)
        nnz = real.count()

        # s1 = 1/2 Σ_ij (w_ij + w_ji)^2 ; trcW2 = Σ_ij w_ij w_ji  — one cogroup
        a = E.tag(real, 0)
        b = E.tag(E.reverse(real), 1)

        def _pair(t: pa.Table) -> pa.Table:
            side = t.column("side").to_numpy(zero_copy_only=False)
            w = t.column("weight").to_numpy(zero_copy_only=False)
            wf = float(w[side == 0].sum())
            wr = float(w[side == 1].sum())
            sq = (wf + wr) ** 2
            f = t.column("focal")[0].as_py()
            nb = t.column("neighbor")[0].as_py()
            tr = wf * wr if f != nb else wf * wr  # diagonal included
            return pa.table({"sq": pa.array([sq]), "tr": pa.array([tr])})

        pair = (
            a.union(b)
            .groupby(["focal", "neighbor"])
            .map_groups(_pair, batch_format="pyarrow")
            .materialize()
        )
        s1 = float(pair.sum("sq") or 0.0) / 2.0
        trcW2 = float(pair.sum("tr") or 0.0)

        # s2 = Σ_i (rowsum_i + colsum_i)^2 — two groupbys unioned
        rows = real.groupby("focal").sum("weight").rename_columns(
            {"sum(weight)": "v"}
        )
        cols = (
            E.reverse(real)
            .groupby("focal")
            .sum("weight")
            .rename_columns({"sum(weight)": "v"})
        )
        rc = rows.union(cols).groupby("focal").sum("v")

        def _sq(t: pa.Table) -> pa.Table:
            v = t.column("sum(v)").to_numpy(zero_copy_only=False)
            return pa.table({"sq": pa.array(v * v)})

        s2 = float(
            rc.map_batches(_sq, batch_format="pyarrow").sum("sq") or 0.0
        )

        # trcWtW = Σ w^2
        def _w2(t: pa.Table) -> pa.Table:
            w = t.column("weight").to_numpy(zero_copy_only=False)
            return pa.table({"w2": pa.array(w * w)})

        trcWtW = float(real.map_batches(_w2, batch_format="pyarrow").sum("w2") or 0.0)

        return {
            "n": n,
            "s0": s0,
            "s1": s1,
            "s2": s2,
            "nonzero": nnz,
            "pct_nonzero": 100.0 * nnz / (n * n) if n else 0.0,
            "trcW2": trcW2,
            "trcWtW": trcWtW,
            "trcWtW_WW": trcWtW + trcW2,
        }

    def describe(
        self,
        attr_ids: np.ndarray,
        attr_values: np.ndarray,
        stats: tuple[str, ...] = ("count", "sum", "mean", "min", "max", "std", "median", "nunique", "mode"),
    ) -> ray.data.Dataset:
        """Per-focal stats over neighbor attribute values
        (base.py:2874-2989). Join attr on neighbor → groupby(focal) →
        vectorized numpy reducers per group."""
        withy = J.broadcast_lookup(
            self._real_edges(),
            np.asarray(attr_ids, np.int64),
            np.asarray(attr_values, np.float64),
            key_col="neighbor",
            out_col="__y",
            default=np.nan,
        )

        def _stats(t: pa.Table) -> pa.Table:
            f = t.column("focal")[0].as_py()
            y = t.column("__y").to_numpy(zero_copy_only=False)
            y = y[~np.isnan(y)]
            out: dict = {"focal": pa.array([f], pa.int64())}
            for s in stats:
                if s == "count":
                    v = float(len(y))
                elif s == "nunique":
                    v = float(len(np.unique(y)))
                elif s == "mode":
                    if len(y) == 0:
                        v = float("nan")
                    else:
                        vals, cnt = np.unique(y, return_counts=True)
                        v = float(vals[np.argmax(cnt)])
                elif len(y) == 0:
                    v = float("nan")
                elif s == "std":
                    v = float(np.std(y, ddof=1)) if len(y) > 1 else float("nan")
                else:
                    v = float(getattr(np, s)(y))
                out[s] = pa.array([v], pa.float64())
            return pa.table(out)

        return withy.groupby("focal").map_groups(_stats, batch_format="pyarrow")

    def n_components(self, max_driver_edges: int = 5_000_000) -> tuple[int, ray.data.Dataset]:
        """(n_components, labels Dataset (focal, component)).

        Driver-side union-find streamed over edge batches for graphs up to
        ``max_driver_edges``; the 100-TB path is iterative min-label
        propagation (hash joins until fixpoint) — not needed for the
        reference-parity layer sizes (reference itself calls scipy's
        connected_components on a CSR, weights.py:549-569).
        """
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        cnt = 0
        for batch in self._edges.iter_batches(batch_format="pyarrow"):
            cnt += batch.num_rows
            if cnt > max_driver_edges:
                raise RuntimeError("graph too large for driver components; use label propagation")
            f = batch.column("focal").to_numpy(zero_copy_only=False)
            n = batch.column("neighbor").to_numpy(zero_copy_only=False)
            w = batch.column("weight").to_numpy(zero_copy_only=False)
            for i in range(len(f)):
                a_, b_ = int(f[i]), int(n[i])
                parent.setdefault(a_, a_)
                if (a_ == b_) and w[i] == 0.0:
                    continue
                parent.setdefault(b_, b_)
                ra, rb = find(a_), find(b_)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        labels = {x: find(x) for x in parent}
        ncomp = len(set(labels.values()))
        lab = ray.data.from_arrow(
            pa.table(
                {
                    "focal": pa.array(list(labels.keys()), pa.int64()),
                    "component": pa.array(list(labels.values()), pa.int64()),
                }
            )
        )
        return ncomp, lab


def _binarize(t: pa.Table) -> pa.Table:
    w = t.column("weight").to_numpy(zero_copy_only=False)
    return t.set_column(
        t.schema.get_field_index("weight"), "weight",
        pa.array((w != 0.0).astype(np.float64)),
    )


def _semi_join_pairs(
    edges: ray.data.Dataset, keys: ray.data.Dataset
) -> ray.data.Dataset:
    """Keep edges whose (focal, neighbor) appears in keys — cogroup semi-join."""

    def _tagk(side):
        def f(t: pa.Table) -> pa.Table:
            if "weight" not in t.schema.names:
                t = t.append_column("weight", pa.nulls(t.num_rows, pa.float64()))
            return t.select(["focal", "neighbor", "weight"]).append_column(
                "side", pa.array(np.full(t.num_rows, side, dtype=np.int8))
            )
        return f

    a = edges.map_batches(_tagk(0), batch_format="pyarrow")
    b = keys.map_batches(_tagk(1), batch_format="pyarrow")

    def _keep(t: pa.Table) -> pa.Table:
        side = t.column("side").to_numpy(zero_copy_only=False)
        if (side == 1).any() and (side == 0).any():
            return t.filter(pa.array(side == 0)).drop_columns(["side"])
        return t.slice(0, 0).drop_columns(["side"])

    return (
        a.union(b)
        .groupby(["focal", "neighbor"])
        .map_groups(_keep, batch_format="pyarrow")
    )

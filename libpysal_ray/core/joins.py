"""Join strategies over edge/attribute Datasets.

Two physical strategies, chosen by the caller per the scale of the small side:

* **broadcast** — ``ray.put`` the small side once; every ``map_batches`` task
  reads it zero-copy from the object store and does a vectorized numpy
  lookup. This is the right plan whenever one side fits in a worker heap
  (attribute vectors, polygon layers, id subsets) — it avoids an all-to-all
  shuffle entirely.
* **hash join** — ``Dataset.join`` (Ray's distributed hash join) for
  large×large, e.g. higher-order self-joins of the edge table.

The cogroup pattern (tag sides → union → groupby key) implements set ops and
anti-joins without a dedicated join operator; it costs one shuffle, same as
a hash join, but composes with arbitrary per-group logic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def broadcast_lookup(
    ds: ray.data.Dataset,
    keys: np.ndarray,
    values: np.ndarray,
    key_col: str,
    out_col: str,
    default: float = np.nan,
) -> ray.data.Dataset:
    """Append ``out_col`` by mapping ``ds[key_col]`` through a broadcast map.

    keys must be unique; lookup is vectorized via np.searchsorted.
    The (keys, values) pair is put in the object store ONCE and read
    zero-copy by every task — never re-shipped per batch.
    """
    order = np.argsort(keys, kind="stable")
    k_sorted = np.ascontiguousarray(keys[order])
    v_sorted = np.ascontiguousarray(values[order])
    ref = ray.put((k_sorted, v_sorted))

    def _lookup(t: pa.Table) -> pa.Table:
        ks, vs = ray.get(ref)
        q = t.column(key_col).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ks, q)
        idx = np.clip(idx, 0, len(ks) - 1)
        hit = ks[idx] == q
        out = np.full(len(q), default, dtype=vs.dtype if vs.dtype.kind == "f" else np.float64)
        out[hit] = vs[idx[hit]]
        return t.append_column(out_col, pa.array(out))

    return ds.map_batches(_lookup, batch_format="pyarrow")


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: tuple[str, ...],
    right_on: tuple[str, ...] | None = None,
    join_type: str = "inner",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Distributed hash join (Ray Data native)."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )


def anti_join_keys(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_cols: list[str],
) -> ray.data.Dataset:
    """Rows of ``left`` whose key is absent from ``right`` (cogroup anti-join).

    ``right`` needs only the key columns. One shuffle on the key.
    """

    def _tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__side", pa.array(np.full(t.num_rows, side, dtype=np.int8))
            )

        return f

    lt = left.map_batches(_tag(0), batch_format="pyarrow")
    # normalize right to key cols + pad missing value columns with nulls so
    # union schemas align
    left_schema_cols = left.schema().names
    rt = right.select_columns(key_cols).map_batches(
        lambda t: _pad_to(t, left_schema_cols), batch_format="pyarrow"
    )
    rt = rt.map_batches(_tag(1), batch_format="pyarrow")

    def _keep_left_only(t: pa.Table) -> pa.Table:
        side = t.column("__side").to_numpy(zero_copy_only=False)
        if (side == 1).any():
            return t.slice(0, 0).drop_columns(["__side"])
        return t.drop_columns(["__side"])

    return (
        lt.union(rt)
        .groupby(key_cols)
        .map_groups(_keep_left_only, batch_format="pyarrow")
    )


def _pad_to(t: pa.Table, cols: list[str]) -> pa.Table:
    for c in cols:
        if c not in t.schema.names:
            t = t.append_column(c, pa.nulls(t.num_rows, pa.float64()))
    return t.select(cols)

"""Distributed prefix sum (scan) and order-dependent packing.

The scan is THE data-parallel primitive behind order-dependent pipeline
stages (sequence packing, running totals, offset assignment for
concatenated outputs). Ray Data has no native scan; the classic
two-phase formulation maps cleanly:

1. sort by the order column (one range shuffle — blocks come out
   range-partitioned and internally sorted);
2. per-block partials: one (block_min_order, block_sum) row per block —
   the driver sees #blocks rows, never data rows;
3. exclusive offsets per block from a driver-side scan over the
   partials, broadcast once via ``ray.put``;
4. second pass: local cumulative sum + the block's offset, looked up by
   the block's min order value (unique because the order column is
   unique and blocks are range-partitioned).

At 100 TB the driver state is O(#blocks) scalars and every data pass is
vectorized numpy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def prefix_sum(
    ds: ray.data.Dataset,
    order_col: str,
    val_col: str,
    out_col: str = "cumsum",
    inclusive: bool = True,
) -> ray.data.Dataset:
    """Append ``out_col`` = running sum of ``val_col`` in ``order_col``
    order. ``order_col`` values must be unique (they key the per-block
    offset lookup)."""
    sch = ds.schema().base_schema
    for c, what in ((order_col, "order_col"), (val_col, "val_col")):
        if not pa.types.is_integer(sch.field(c).type):
            raise TypeError(
                f"prefix_sum {what} {c!r} must be integer-typed "
                f"(got {sch.field(c).type}); int64 sums are exact and "
                "order-independent — scale float values to integer units "
                "(e.g. cents, token counts) first"
            )
    s = ds.sort(order_col).materialize()

    def _partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "mo": pa.array([], pa.int64()),
                "bs": pa.array([], pa.int64()),
            })
        o = t.column(order_col).to_numpy(zero_copy_only=False)
        v = t.column(val_col).to_numpy(zero_copy_only=False)
        return pa.table({
            "mo": pa.array([np.int64(o.min())]),
            "bs": pa.array([np.int64(v.sum())]),
        })

    parts = s.map_batches(
        _partials, batch_size=None, batch_format="pyarrow"
    ).take_all()
    parts.sort(key=lambda r: r["mo"])
    mos = np.array([r["mo"] for r in parts], dtype=np.int64)
    sums = np.array([r["bs"] for r in parts], dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))
    ref = ray.put((mos, offsets))

    def _apply(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        mos_, offs_ = ray.get(ref)
        o = t.column(order_col).to_numpy(zero_copy_only=False)
        v = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # the batch is one sorted block; its min order keys its offset.
        # Both passes map batch_size=None over the SAME materialized
        # dataset, so batching is identical — but if Ray ever re-splits
        # the blocks between passes, fail LOUDLY instead of mis-basing.
        j = int(np.searchsorted(mos_, np.int64(o.min())))
        if j >= len(mos_) or mos_[j] != np.int64(o.min()):
            raise RuntimeError(
                "prefix_sum: pass-2 batch boundary does not match the "
                "pass-1 block partials — Ray re-batched a materialized "
                "dataset between passes; offsets would be silently wrong"
            )
        base = offs_[j]
        run = np.cumsum(v) + base
        if not inclusive:
            run = run - v
        return t.append_column(out_col, pa.array(run.astype(np.int64)))

    return s.map_batches(_apply, batch_size=None, batch_format="pyarrow")


def pack_bins(
    ds: ray.data.Dataset,
    order_col: str,
    size_col: str,
    capacity: int,
    bin_col: str = "bin_id",
) -> ray.data.Dataset:
    """Order-dependent greedy packing: walking items in ``order_col``
    order, item i goes to bin floor(exclusive_cumsum(size) / capacity) —
    the sequence-packing manifest for fixed-token training shards.
    Deterministic at any cluster size; one sort + two vectorized passes
    (the scan above)."""
    withs = prefix_sum(ds, order_col, size_col, out_col="__cs",
                       inclusive=False)

    def _bin(t: pa.Table) -> pa.Table:
        cs = t.column("__cs").to_numpy(zero_copy_only=False)
        b = (cs // np.int64(capacity)).astype(np.int64)
        return t.drop_columns(["__cs"]).append_column(bin_col, pa.array(b))

    return withs.map_batches(_bin, batch_format="pyarrow")

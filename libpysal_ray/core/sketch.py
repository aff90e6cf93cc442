"""Mergeable cardinality sketches — the 100 TB count-distinct path.

HyperLogLog (Flajolet et al. 2007) over the engine's splitmix64 hash:
the accumulator is the 2^p register array, combine = elementwise max —
order-independent and mergeable, so it runs as a Ray-native AggregateFnV2
(one combiner pass per block, tiny merge tree, never a distinct shuffle).

Register derivation (shared by the exact oracle):
    h    = splitmix64(int64 value)
    reg  = h >> (64 - p)                      (top p bits)
    rest = h & (2^(64-p) - 1)                 (low 64-p bits)
    rho  = (64 - p) - bitlen(rest) + 1        (rho = 64-p+1 when rest = 0)

For p ≤ 12 ``rest`` fits float64 exactly (≤ 52 bits), so bitlen comes
from one vectorized ``np.frexp`` — and DuckDB reproduces it with
``length(format('{:b}', rest))``: the register table itself is
hash-compare EXACT (see the ``hll_registers`` query); only the final
cardinality ESTIMATE is approximate (standard error ≈ 1.04/sqrt(2^p)),
verified by pytest accuracy/merge tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from libpysal_ray.core.hashing import splitmix64
from libpysal_ray.core.joins import _aggfn_v2_base


def _registers(vals: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(reg indices int64, rho uint8) per value — vectorized."""
    if p < 4 or p > 12:
        raise ValueError("p must be in [4, 12] (float64-exact bitlen)")
    h = splitmix64(vals.astype(np.int64).view(np.uint64))
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h & np.uint64((1 << (64 - p)) - 1)).astype(np.float64)
    # bitlen via frexp: frexp(r) = (m, e) with r = m * 2^e, 0.5 <= m < 1
    _, e = np.frexp(rest)
    rho = ((64 - p) - e + 1).astype(np.uint8)  # rest=0 -> e=0 -> 64-p+1
    return reg, rho


def _estimate(regs: np.ndarray, p: int) -> float:
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = float(np.sum(np.exp2(-regs.astype(np.float64))))
    e = alpha * m * m / s
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:
        return m * float(np.log(m / zeros))  # linear counting
    return e


class HllAgg(_aggfn_v2_base()):
    """HyperLogLog count-distinct AggregateFnV2 over an int64 column:
    accumulator = the 2^p uint8 register array, combine = elementwise
    max, finalize = the HLL estimate (float). Use inside any
    ``groupby(...).aggregate(HllAgg(col))`` — one combiner pass per
    block, no distinct shuffle at any scale."""

    def __init__(self, on: str, p: int = 12):
        self._on = on
        self._p = p
        m = 1 << p
        super().__init__(
            f"hll({on})",
            zero_factory=lambda: np.zeros(m, dtype=np.uint8),
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block):
        on = self._on
        if hasattr(block, "column"):
            v = block.column(on).to_numpy(zero_copy_only=False)
        else:  # pandas block
            v = block[on].to_numpy()
        regs = np.zeros(1 << self._p, dtype=np.uint8)
        if len(v):
            reg, rho = _registers(np.asarray(v, dtype=np.int64), self._p)
            np.maximum.at(regs, reg, rho)
        return regs

    def combine(self, a, b):
        return np.maximum(np.asarray(a, dtype=np.uint8),
                          np.asarray(b, dtype=np.uint8))

    def finalize(self, accumulator):
        return _estimate(np.asarray(accumulator, dtype=np.uint8), self._p)


def hll_registers(
    ds: ray.data.Dataset, col: str, p: int = 12
) -> ray.data.Dataset:
    """The EXACT register table (reg, rho) of the HLL sketch of ``col``
    — a deterministic function of the value SET, so it is both the
    mergeable distributed state and an oracle-checkable artifact.
    Per-batch max-combine shrinks the ONE groupby(reg) shuffle to ≤ 2^p
    rows per block."""

    def _partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False)
        if len(v) == 0:
            return pa.table({
                "reg": pa.array([], pa.int64()),
                "rho": pa.array([], pa.int64()),
            })
        reg, rho = _registers(np.asarray(v, dtype=np.int64), p)
        regs = np.zeros(1 << p, dtype=np.uint8)
        np.maximum.at(regs, reg, rho)
        nz = np.flatnonzero(regs)
        return pa.table({
            "reg": pa.array(nz.astype(np.int64)),
            "rho": pa.array(regs[nz].astype(np.int64)),
        })

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("reg")
        .max("rho")
        .rename_columns({"max(rho)": "rho"})
    )


def hll_distinct(ds: ray.data.Dataset, col: str, p: int = 12) -> float:
    """Scalar HLL cardinality estimate of ``col`` (standard error
    ≈ 1.04/sqrt(2^p); p=12 → ~1.6%)."""
    regs = np.zeros(1 << p, dtype=np.uint8)
    for r in hll_registers(ds, col, p).take_all():
        regs[r["reg"]] = r["rho"]
    return _estimate(regs, p)

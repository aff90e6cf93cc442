"""Size-aware Parquet reads.

Ray's default read parallelism has a ~200-block floor, so a kilobyte-scale
table becomes hundreds of near-empty blocks — and every downstream
sort/aggregate/union inherits that block count, paying per-task scheduling
overhead on every shuffle (a single groupby over a 5k-row table was taking
>30 s at 32 CPUs). This helper sizes the read to the data instead:

* big inputs: one block per ~8 MiB on disk (≈32 MiB in memory) — the
  100-TB path keeps full parallelism;
* small inputs: a low floor (CPUs/4) — for tables this small the per-task
  scheduling cost of a wide fan-out exceeds the compute it buys, and every
  downstream shuffle stage inherits the block count.
"""

from __future__ import annotations

import os

import numpy as np
import ray
import ray.data

_DISK_BYTES_PER_BLOCK = 8 << 20


def _ncpus() -> int:
    try:
        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        pass
    return 8


def read_parquet_sized(path: str, columns=None, **kwargs) -> ray.data.Dataset:
    try:
        if os.path.isdir(path):
            size = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path)
                for f in fs
            )
        else:
            size = os.path.getsize(path)
        floor = max(2, _ncpus() // 4)
        nb = max(floor, int(np.ceil(size / _DISK_BYTES_PER_BLOCK)))
        kwargs.setdefault("override_num_blocks", nb)
    except OSError:
        pass  # non-local paths: let Ray decide
    return ray.data.read_parquet(path, columns=columns, **kwargs)

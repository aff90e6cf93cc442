#!/usr/bin/env python
"""Benchmark harness — runs the engine's headline pipelines over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) and prints ONE JSON line.

Modes:
  python bench.py                 # all queries, one session
  python bench.py --scaling      # flagship at 8 and 32 CPUs in FRESH
                                  # processes → throughput + scaling efficiency
  python bench.py --only a,b,c   # subset (internal / debugging)

Owns its Ray session (ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS));
nothing in libpysal_ray calls ray.init.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32") or "32")


def _consume(res) -> int:
    """Execute a query result and return its row count (never a driver
    materialize of the data itself)."""
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.count()
    if isinstance(res, pa.Table):
        return res.num_rows
    return len(res)


def run(sf_dir: str, num_cpus: int, only: list[str] | None = None):
    import logging
    import warnings

    warnings.filterwarnings("ignore")
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            log_to_driver=False,
        )
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from libpysal_ray.pipelines.queries import QUERIES

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rows[name] = _consume(fn(sf_dir))
        timings[name] = round(time.time() - t0, 3)
    return timings, rows


def main() -> None:
    argv = sys.argv[1:]
    if "--scaling" in argv:
        # Same input, two parallelism levels, FRESH processes — the
        # in-sandbox stand-in for the north rule's N vs 4N cluster sizes.
        results = {}
        for cpus in (8, 32):
            env = dict(os.environ)
            env["RAY_GRAFT_CPUS"] = str(cpus)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--only", "flagship"],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")][-1]
            results[cpus] = json.loads(line)
        t8 = results[8]["queries"]["flagship"]
        t32 = results[32]["queries"]["flagship"]
        n_rows = results[32]["rows"]["flagship"]
        thr8 = n_rows / t8
        thr32 = n_rows / t32
        eff = (thr32 / thr8) / (32 / 8)
        print(json.dumps({
            "metric": "flagship_scaling_efficiency_8cpu_to_32cpu",
            "value": round(eff, 3),
            "unit": "ratio",
            "sf": SF_DIR,
            "num_cpus": [8, 32],
            "rows": n_rows,
            "seconds": {"cpus8": t8, "cpus32": t32},
            "rows_per_sec": {"cpus8": round(thr8, 1),
                             "cpus32": round(thr32, 1)},
        }))
        return

    only = None
    if "--only" in argv:
        only = argv[argv.index("--only") + 1].split(",")
    timings, rows = run(SF_DIR, NUM_CPUS, only)
    total = round(sum(timings.values()), 3)
    flag_t = timings.get("flagship")
    flag_rps = (
        round(rows["flagship"] / flag_t, 1)
        if flag_t and rows.get("flagship")
        else None
    )
    print(json.dumps({
        "metric": "total_pipeline_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "rows": rows,
        "flagship_rows_per_sec": flag_rps,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }))
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()

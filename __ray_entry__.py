"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in libpysal_ray) calls ray.init()/ray.shutdown().

- ``entry()``       — flagship spatial-join + tiling pipeline on sf0.001.
- ``queries()``     — 50+ callables, one per implemented operator
  (SURVEY.md §2 / §8 coverage map).
- ``oracle_sql()``  — DuckDB-equivalent SQL for every SQL-expressible query
  (~85%% of queries; column names and float derivations match bit-for-bit —
  see libpysal_ray/pipelines/queries.py for the exactness discipline).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: pages → digest →
    geocode → quadcells → salted shuffle → PIP join → per-partition verify
    + neighbor sets. Returns the result Dataset."""
    from libpysal_ray.pipelines.flagship import flagship

    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from libpysal_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from libpysal_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)

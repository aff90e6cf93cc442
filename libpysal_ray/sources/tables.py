"""Attribute-table text sources (reference ``io/tables.DataTable``).

GeoDa text export (``io/iohandlers/geoda_txt.py:10-85``): first line
``n,k``, a quoted comma-separated header line of k field names, then n
comma-separated rows. The reference infers a per-column type spec
(int → float → str, ``_determineSpec``); this reader does the same and
returns a typed Arrow-backed ``ray.data.Dataset`` ready to join against
graphs (e.g. as a ``describe``/``lag`` attribute side).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _infer(col: list[str]):
    try:
        vals = [int(v) for v in col]
        return pa.array(np.asarray(vals, np.int64))
    except ValueError:
        pass
    try:
        vals = [float(v) for v in col]
        return pa.array(np.asarray(vals, np.float64))
    except ValueError:
        return pa.array(col)


def read_geoda_txt(path: str) -> ray.data.Dataset:
    with open(path) as f:
        n, k = (int(v) for v in f.readline().strip().split(","))
        header = [h.replace('"', "") for h in f.readline().strip().split(",")]
        if len(header) != k:
            raise TypeError("not a valid geoda_txt file (header width ≠ k)")
        rows = [f.readline().strip().split(",") for _ in range(n)]
    cols = {
        name: _infer([r[j] for r in rows]) for j, name in enumerate(header)
    }
    return ray.data.from_arrow(pa.table(cols))


def write_geoda_txt(ds: ray.data.Dataset, path: str) -> None:
    """Writer counterpart (the reference is read-only; provided so the
    engine can round-trip its own exports)."""
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    names = t.schema.names
    with open(path, "w") as out:
        out.write(f"{t.num_rows},{len(names)}\n")
        out.write(",".join(f'"{n}"' for n in names) + "\n")
        cols = [t.column(n).to_pylist() for n in names]
        for i in range(t.num_rows):
            out.write(",".join(str(c[i]) for c in cols) + "\n")

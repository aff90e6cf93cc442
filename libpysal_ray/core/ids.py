"""Id handling — the engine's edge relation is int64-keyed; arbitrary
(string) observation ids are supported through an explicit codec step at
the boundary, mirroring the reference's id remapping
(/root/reference/libpysal/weights/weights.py:868-925 and the Graph's
support for str indices, graph/base.py:68-141).

Two codecs:

* ``dense_codec`` — exact: distinct ids, canonically sorted, mapped to
  0..n-1. The mapping table is the SMALL side (one row per observation),
  broadcast via ray.put. Decode restores the originals exactly.
* ``hash_ids`` — scale path: stateless 64-bit string hash
  (core.hashing.hash_string_array_u64 — fully vectorized over the flat
  Arrow buffer); no mapping table, no driver state, but
  no decode and a (negligible, checkable) collision probability — the
  right choice for url-keyed web corpora.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from libpysal_ray.core.hashing import hash_string_array_u64


class DenseIdCodec:
    """Bidirectional string-id ↔ dense-int codec built from a Dataset."""

    def __init__(self, values: np.ndarray):
        self.values = np.asarray(values)  # sorted unique originals
        self._ref = ray.put(self.values)
        # Arrow value_set converted ONCE (index_in consumes it per batch;
        # rebuilding pa.array(values) every batch is O(universe) each time)
        self._ref_arrow = ray.put(pa.array(self.values))

    @classmethod
    def from_dataset(cls, ds: ray.data.Dataset, col: str) -> "DenseIdCodec":
        # distributed distinct (per-batch combiner + one groupby), then the
        # (small) id universe comes to the driver once for the sorted map
        def _uniq(t: pa.Table) -> pa.Table:
            u = pc.unique(t.column(col).combine_chunks()
                          if isinstance(t.column(col), pa.ChunkedArray)
                          else t.column(col))
            return pa.table({col: u})

        parts = (
            ds.select_columns([col])
            .map_batches(_uniq, batch_format="pyarrow")
            .groupby(col)
            .count()
            .select_columns([col])
            .take_all()
        )
        vals = np.sort(np.asarray([r[col] for r in parts]))
        return cls(vals)

    def encode(self, ds: ray.data.Dataset, col: str,
               out_col: str | None = None) -> ray.data.Dataset:
        ref = self._ref_arrow
        oc = out_col or col

        def _enc(t: pa.Table) -> pa.Table:
            vals = ray.get(ref)
            idx = pc.index_in(t.column(col), value_set=vals)
            if idx.null_count:
                raise KeyError("id not in codec universe")
            t = t.drop_columns([col])
            return t.append_column(
                oc, pc.cast(idx, pa.int64())
            )

        return ds.map_batches(_enc, batch_format="pyarrow")

    def decode(self, ds: ray.data.Dataset, cols: tuple[str, ...]) -> ray.data.Dataset:
        ref = self._ref

        def _dec(t: pa.Table) -> pa.Table:
            vals = ray.get(ref)
            for c in cols:
                code = t.column(c).to_numpy(zero_copy_only=False)
                i = t.schema.get_field_index(c)
                t = t.set_column(i, c, pa.array(vals[code]))
            return t

        return ds.map_batches(_dec, batch_format="pyarrow")


def hash_ids(ds: ray.data.Dataset, col: str, seed: int = 0,
             out_col: str | None = None) -> ray.data.Dataset:
    """Stateless string → int63 id hashing (url-scale corpora)."""
    oc = out_col or col

    def _h(t: pa.Table) -> pa.Table:
        h = (hash_string_array_u64(t.column(col), seed)
             >> np.uint64(1)).astype(np.int64)
        t = t.drop_columns([col])
        return t.append_column(oc, pa.array(h))

    return ds.map_batches(_h, batch_format="pyarrow")

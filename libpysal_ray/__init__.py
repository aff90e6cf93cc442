"""libpysal_ray — a Ray-Data-native spatial weights + tiling engine.

A from-scratch rebuild of the weights-construction semantics of
pysal/libpysal (reference: /root/reference) on top of ``ray.data.Dataset``
pipelines. The one canonical relation is the Arrow edge table
``(focal: int64, neighbor: int64, weight: float64)`` — the same layout the
reference's own ``Graph`` serializes to Parquet
(reference: graph/io/_parquet.py:27-36). Every builder is a
``flat_map``/``map_batches`` + shuffle pipeline; every transform is a
groupby / join over the edge Dataset; stateful stages (STRtree-like PIP
index, per-tile neighbor search) are actor pools.

Nothing here calls ``ray.init()`` — the caller owns the Ray session.
"""

from libpysal_ray.core.graph import RayGraph

__all__ = ["RayGraph"]
__version__ = "0.1.0"

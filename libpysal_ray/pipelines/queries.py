"""Driver-contract queries: one entry per implemented operator, each with a
DuckDB-exact oracle (see __ray_entry__.py).

Exactness discipline (so order-insensitive value-hashes match bit-for-bit):

* all coordinates derive from doc_id by integer modular arithmetic
  (core/hashing.py) — exactly reproducible in ANSI SQL;
* every float the oracle must reproduce is a chain of correctly-rounded
  IEEE-754 double ops in the SAME order on both sides (+,-,*,/,sqrt only —
  no exp/pow, whose libm results may differ);
* aggregate sums are over exact integers or equal terms, so summation
  order cannot change the value;
* KNN/ANN tie-breaks are pinned to (distance, neighbor_id) / (sim DESC,
  neighbor_id) on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from libpysal_ray.ann.knn import ann_lsh_topk, ann_topk
from libpysal_ray.builders.cellgraph import cell_graph
from libpysal_ray.builders.contiguity import block, queen, rook
from libpysal_ray.builders.distance import distance_band, kernel, knn_edges_with_dist
from libpysal_ray.builders.raster import raster_contiguity
from libpysal_ray.core.edges import drop_isolate_markers
from libpysal_ray.spatial.geocode import geocode_ids
from libpysal_ray.spatial.pip import pip_join
from libpysal_ray.text.analysis import lang_id, quality_score, token_stats
from libpysal_ray.text.dedup import exact_dedup, minhash_lsh_pairs, simhash64

GRID = 1000  # integer coordinate space
CDIV = 125   # tile size → 8x8 cells
LCOLS = 20   # lattice columns for polygon-derived queries


# --------------------------------------------------------------- inputs
def _docs(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _points(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, x, y) with x,y = integer hash coords in [0, GRID)."""
    return geocode_ids(_docs(sf_dir, ["doc_id"]), "doc_id", grid=GRID)


def _real(g) -> ray.data.Dataset:
    return g.edges.map_batches(drop_isolate_markers, batch_format="pyarrow")


def _lattice_polys(sf_dir: str) -> ray.data.Dataset:
    """Unit-square polygon per document at (r, c) = (doc_id // 20, doc_id % 20)."""

    def _mk(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        r = (ids // LCOLS).astype(np.float64)
        c = (ids % LCOLS).astype(np.float64)
        xs = [[cc, cc + 1, cc + 1, cc, cc] for cc in c]
        ys = [[rr, rr, rr + 1, rr + 1, rr] for rr in r]
        return pa.table(
            {
                "polygon_id": pa.array(ids.astype(np.int64)),
                "xs": pa.array(xs, pa.list_(pa.float64())),
                "ys": pa.array(ys, pa.list_(pa.float64())),
            }
        )

    return _docs(sf_dir, ["doc_id"]).map_batches(_mk, batch_format="pyarrow")


_PTS_SQL = f"""
pts AS (
  SELECT doc_id,
         CAST((doc_id * 2654435761) % 4294967296 % {GRID} AS DOUBLE) AS x,
         CAST((doc_id * 2246822519) % 4294967296 % {GRID} AS DOUBLE) AS y
  FROM documents
)"""

_ROOK_SQL = f"""
g AS (SELECT doc_id, doc_id // {LCOLS} AS r, doc_id % {LCOLS} AS c FROM documents),
adj AS (
  SELECT a.doc_id AS focal, b.doc_id AS neighbor
  FROM g a JOIN g b
    ON (a.r = b.r AND abs(a.c - b.c) = 1)
    OR (a.c = b.c AND abs(a.r - b.r) = 1)
)"""

_QUEEN_COND = (
    "abs(a.r - b.r) <= 1 AND abs(a.c - b.c) <= 1 "
    "AND NOT (a.r = b.r AND a.c = b.c)"
)


# --------------------------------------------------------------- queries
def q_tile_counts(sf_dir: str):
    def _cell(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        cell = (np.floor_divide(y, CDIV) * 8 + np.floor_divide(x, CDIV)).astype(
            np.int64
        )
        return pa.table({"cell": pa.array(cell)})

    return (
        _points(sf_dir)
        .map_batches(_cell, batch_format="pyarrow")
        .groupby("cell")
        .count()
        .rename_columns({"count()": "n_docs"})
    )


def q_pip_assign(sf_dir: str):
    """PIP join of scaled hash points against an 8x8 rectangle layer whose
    edges sit at half-integers (no point ever on a boundary)."""
    pts = _points(sf_dir)

    def _scale(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False) * 0.1 - 50.0
        y = t.column("y").to_numpy(zero_copy_only=False) * 0.1 - 40.0
        return pa.table(
            {"doc_id": t.column("doc_id"), "x": pa.array(x), "y": pa.array(y)}
        )

    spts = pts.map_batches(_scale, batch_format="pyarrow")
    pids, xs, ys = [], [], []
    for cy in range(8):
        for cx in range(8):
            x0 = (cx * CDIV - 0.5) * 0.1 - 50.0
            x1 = ((cx + 1) * CDIV - 0.5) * 0.1 - 50.0
            y0 = (cy * CDIV - 0.5) * 0.1 - 40.0
            y1 = ((cy + 1) * CDIV - 0.5) * 0.1 - 40.0
            pids.append(cy * 8 + cx)
            xs.append([x0, x1, x1, x0, x0])
            ys.append([y0, y0, y1, y1, y0])
    polys = pa.table(
        {
            "polygon_id": pa.array(pids, pa.int64()),
            "xs": pa.array(xs, pa.list_(pa.float64())),
            "ys": pa.array(ys, pa.list_(pa.float64())),
        }
    )
    out = pip_join(spts, polys, res=5, id_col="doc_id", concurrency=(1, 4))
    return out.select_columns(["doc_id", "polygon_id"])


def q_knn4(sf_dir: str):
    return knn_edges_with_dist(_points(sf_dir), k=4, id_col="doc_id")


def q_distance_band50(sf_dir: str):
    g = distance_band(_points(sf_dir), threshold=50.0, id_col="doc_id")
    return _real(g)


def q_kernel_triangular(sf_dir: str):
    g = kernel(
        _points(sf_dir), bandwidth=100.0, fixed=True,
        function="triangular", id_col="doc_id",
    )
    return _real(g)


def q_rook_lattice(sf_dir: str):
    return _real(rook(_lattice_polys(sf_dir)))


def q_queen_lattice(sf_dir: str):
    return _real(queen(_lattice_polys(sf_dir)))


def q_transform_r(sf_dir: str):
    return _real(rook(_lattice_polys(sf_dir)).transform("R"))


def q_spatial_lag(sf_dir: str):
    g = rook(_lattice_polys(sf_dir))
    attrs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return g.lag(
        attrs.column("doc_id").to_numpy(),
        attrs.column("n_chars").to_numpy().astype(np.float64),
    )


def q_higher_order2(sf_dir: str):
    return _real(rook(_lattice_polys(sf_dir)).higher_order(2))


def q_union_queen(sf_dir: str):
    """(queen − rook) ∪ rook must equal queen — exercises difference_g
    AND union_g against the closed-form queen oracle."""
    polys = _lattice_polys(sf_dir).materialize()
    q = queen(polys)
    r = rook(polys)
    bishop = q.difference_g(r)
    return _real(bishop.union_g(r))


def q_summary_rook(sf_dir: str):
    s = rook(_lattice_polys(sf_dir)).summary()
    return pa.table(
        {
            "n": pa.array([s["n"]], pa.int64()),
            "s0": pa.array([s["s0"]], pa.float64()),
            "s1": pa.array([s["s1"]], pa.float64()),
            "s2": pa.array([s["s2"]], pa.float64()),
            "nonzero": pa.array([s["nonzero"]], pa.int64()),
        }
    )


def q_block_lang(sf_dir: str):
    docs = _docs(sf_dir, ["doc_id", "lang"])

    def _code(t: pa.Table) -> pa.Table:
        return t

    g = block(docs.map_batches(_code, batch_format="pyarrow"), "doc_id", "lang")
    return _real(g)


def q_cell_graph(sf_dir: str):
    def _cell(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        cell = (np.floor_divide(y, CDIV) * 8 + np.floor_divide(x, CDIV)).astype(
            np.int64
        )
        return pa.table({"cell": pa.array(cell)})

    cells = (
        _points(sf_dir)
        .map_batches(_cell, batch_format="pyarrow")
        .groupby("cell")
        .count()
        .select_columns(["cell"])
    )
    return _real(cell_graph(cells, res=3, order=1, weight="binary"))


def q_raster_rook(sf_dir: str):
    """Raster from documents: cell (0, doc_id//20, doc_id%20), nodata where
    n_chars % 7 == 0."""
    docs = _docs(sf_dir, ["doc_id", "n_chars"])
    n = docs.count()
    nrows = (n + LCOLS - 1) // LCOLS

    def _cells(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        nc = t.column("n_chars").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "band": pa.array(np.zeros(len(ids), np.int64)),
                "row": pa.array((ids // LCOLS).astype(np.int64)),
                "col": pa.array((ids % LCOLS).astype(np.int64)),
                "value": pa.array(
                    np.where(nc % 7 == 0, -1.0, nc.astype(np.float64))
                ),
            }
        )

    cells = docs.map_batches(_cells, batch_format="pyarrow")
    g = raster_contiguity(cells, nrows, LCOLS, "rook", nodata=-1.0)
    return _real(g)


def q_exact_dedup(sf_dir: str):
    return exact_dedup(_docs(sf_dir, ["doc_id", "text"]))


def q_token_stats(sf_dir: str):
    return token_stats(_docs(sf_dir, ["doc_id", "text"])).select_columns(
        ["doc_id", "n_tokens", "avg_token_len"]
    )


def q_quality(sf_dir: str):
    return quality_score(_docs(sf_dir, ["doc_id", "text"])).select_columns(
        ["doc_id", "stop_hits", "quality"]
    )


def q_ann_top5(sf_dir: str):
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = ann_topk(emb, query_ids=range(10), k=5)
    return out.select_columns(["query_id", "neighbor_id", "rank"])


# ---------------------------------------------------- rows-only (no SQL)
def q_minhash_pairs(sf_dir: str):
    return minhash_lsh_pairs(
        _docs(sf_dir, ["doc_id", "text"]), jaccard_threshold=0.5
    )


def q_simhash(sf_dir: str):
    return simhash64(_docs(sf_dir, ["doc_id", "text"]))


def q_lang_id(sf_dir: str):
    return lang_id(_docs(sf_dir, ["doc_id", "text"])).select_columns(
        ["doc_id", "lang_pred"]
    )


def q_ann_lsh(sf_dir: str):
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return ann_lsh_topk(emb, query_ids=range(10), k=5).select_columns(
        ["query_id", "neighbor_id", "rank"]
    )


def q_flagship(sf_dir: str):
    from libpysal_ray.pipelines.flagship import flagship

    return flagship(sf_dir)


QUERIES = {
    "tile_counts": q_tile_counts,
    "pip_assign": q_pip_assign,
    "knn4": q_knn4,
    "distance_band50": q_distance_band50,
    "kernel_triangular": q_kernel_triangular,
    "rook_lattice": q_rook_lattice,
    "queen_lattice": q_queen_lattice,
    "transform_r": q_transform_r,
    "spatial_lag": q_spatial_lag,
    "higher_order2": q_higher_order2,
    "union_queen": q_union_queen,
    "summary_rook": q_summary_rook,
    "block_lang": q_block_lang,
    "cell_graph": q_cell_graph,
    "raster_rook": q_raster_rook,
    "exact_dedup": q_exact_dedup,
    "token_stats": q_token_stats,
    "quality": q_quality,
    "ann_top5": q_ann_top5,
    "minhash_pairs": q_minhash_pairs,
    "simhash": q_simhash,
    "lang_id": q_lang_id,
    "ann_lsh": q_ann_lsh,
    "flagship": q_flagship,
}

_PAIR_DIST = (
    "sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))"
)

ORACLE_SQL = {
    "tile_counts": f"""
WITH {_PTS_SQL}
SELECT (CAST(y AS BIGINT) // {CDIV}) * 8 + (CAST(x AS BIGINT) // {CDIV}) AS cell,
       COUNT(*) AS n_docs
FROM pts GROUP BY 1
""",
    "pip_assign": f"""
WITH {_PTS_SQL}
SELECT doc_id,
       (CAST(y AS BIGINT) // {CDIV}) * 8 + (CAST(x AS BIGINT) // {CDIV}) AS polygon_id
FROM pts
""",
    "knn4": f"""
WITH {_PTS_SQL},
d AS (
  SELECT a.doc_id AS focal, b.doc_id AS neighbor, {_PAIR_DIST} AS dist
  FROM pts a, pts b WHERE a.doc_id <> b.doc_id
),
r AS (
  SELECT focal, neighbor, dist,
         ROW_NUMBER() OVER (PARTITION BY focal ORDER BY dist, neighbor) AS rn
  FROM d
)
SELECT focal, neighbor, dist FROM r WHERE rn <= 4
""",
    "distance_band50": f"""
WITH {_PTS_SQL}
SELECT a.doc_id AS focal, b.doc_id AS neighbor, CAST(1.0 AS DOUBLE) AS weight
FROM pts a, pts b
WHERE a.doc_id <> b.doc_id AND {_PAIR_DIST} <= 50
""",
    "kernel_triangular": f"""
WITH {_PTS_SQL}
SELECT a.doc_id AS focal, b.doc_id AS neighbor,
       CAST(1.0 AS DOUBLE) - {_PAIR_DIST} / CAST(100.0 AS DOUBLE) AS weight
FROM pts a, pts b
WHERE {_PAIR_DIST} <= 100
""",
    "rook_lattice": f"""
WITH {_ROOK_SQL}
SELECT focal, neighbor, CAST(1.0 AS DOUBLE) AS weight FROM adj
""",
    "queen_lattice": f"""
WITH g AS (SELECT doc_id, doc_id // {LCOLS} AS r, doc_id % {LCOLS} AS c FROM documents)
SELECT a.doc_id AS focal, b.doc_id AS neighbor, CAST(1.0 AS DOUBLE) AS weight
FROM g a JOIN g b ON {_QUEEN_COND}
""",
    "transform_r": f"""
WITH {_ROOK_SQL}
SELECT focal, neighbor,
       CAST(1.0 AS DOUBLE) / COUNT(*) OVER (PARTITION BY focal) AS weight
FROM adj
""",
    "spatial_lag": f"""
WITH {_ROOK_SQL}
SELECT adj.focal AS focal, CAST(SUM(d.n_chars) AS DOUBLE) AS lag
FROM adj JOIN documents d ON adj.neighbor = d.doc_id
GROUP BY adj.focal
""",
    "higher_order2": f"""
WITH {_ROOK_SQL},
two AS (
  SELECT DISTINCT a.focal AS focal, b.neighbor AS neighbor
  FROM adj a JOIN adj b ON a.neighbor = b.focal
  WHERE a.focal <> b.neighbor
)
SELECT t.focal, t.neighbor, CAST(1.0 AS DOUBLE) AS weight
FROM two t LEFT JOIN adj e ON t.focal = e.focal AND t.neighbor = e.neighbor
WHERE e.focal IS NULL
""",
    "union_queen": f"""
WITH g AS (SELECT doc_id, doc_id // {LCOLS} AS r, doc_id % {LCOLS} AS c FROM documents)
SELECT a.doc_id AS focal, b.doc_id AS neighbor, CAST(1.0 AS DOUBLE) AS weight
FROM g a JOIN g b ON {_QUEEN_COND}
""",
    "summary_rook": f"""
WITH {_ROOK_SQL},
deg AS (SELECT focal, COUNT(*) AS k FROM adj GROUP BY focal)
SELECT (SELECT COUNT(*) FROM documents) AS n,
       CAST((SELECT COUNT(*) FROM adj) AS DOUBLE) AS s0,
       CAST(2 * (SELECT COUNT(*) FROM adj) AS DOUBLE) AS s1,
       CAST((SELECT SUM(4 * k * k) FROM deg) AS DOUBLE) AS s2,
       (SELECT COUNT(*) FROM adj) AS nonzero
""",
    "block_lang": """
SELECT a.doc_id AS focal, b.doc_id AS neighbor, CAST(1.0 AS DOUBLE) AS weight
FROM documents a JOIN documents b
  ON a.lang = b.lang AND a.doc_id <> b.doc_id
""",
    "cell_graph": f"""
WITH {_PTS_SQL},
cells AS (
  SELECT DISTINCT (CAST(y AS BIGINT) // {CDIV}) * 8 + (CAST(x AS BIGINT) // {CDIV}) AS cell
  FROM pts
)
SELECT a.cell AS focal, b.cell AS neighbor, CAST(1.0 AS DOUBLE) AS weight
FROM cells a JOIN cells b
  ON abs(a.cell % 8 - b.cell % 8) <= 1
 AND abs(a.cell // 8 - b.cell // 8) <= 1
 AND a.cell <> b.cell
""",
    "raster_rook": f"""
WITH v AS (
  SELECT doc_id, doc_id // {LCOLS} AS r, doc_id % {LCOLS} AS c
  FROM documents WHERE n_chars % 7 <> 0
)
SELECT a.doc_id AS focal, b.doc_id AS neighbor, CAST(1.0 AS DOUBLE) AS weight
FROM v a JOIN v b
  ON (a.r = b.r AND abs(a.c - b.c) = 1)
  OR (a.c = b.c AND abs(a.r - b.r) = 1)
""",
    "exact_dedup": """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dupes
FROM documents GROUP BY md5(text)
""",
    "token_stats": """
SELECT doc_id,
       length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
       CAST(length(replace(text, ' ', '')) AS DOUBLE)
         / (length(text) - length(replace(text, ' ', '')) + 1) AS avg_token_len
FROM documents
""",
    "quality": """
SELECT doc_id,
       ( (length(text) - length(replace(text, ' the ', ''))) / 5
       + (length(text) - length(replace(text, ' and ', ''))) / 5
       + (length(text) - length(replace(text, ' of ', ''))) / 4
       + (length(text) - length(replace(text, ' to ', ''))) / 4
       + (length(text) - length(replace(text, ' is ', ''))) / 4
       ) AS stop_hits,
       CAST(( (length(text) - length(replace(text, ' the ', ''))) / 5
       + (length(text) - length(replace(text, ' and ', ''))) / 5
       + (length(text) - length(replace(text, ' of ', ''))) / 4
       + (length(text) - length(replace(text, ' to ', ''))) / 4
       + (length(text) - length(replace(text, ' is ', ''))) / 4
       ) AS DOUBLE)
       / (length(text) - length(replace(text, ' ', '')) + 1) AS quality
FROM documents
""",
    "ann_top5": """
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
s AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                CAST(e.embedding AS DOUBLE[])) AS sim
  FROM q, embeddings e WHERE e.vec_id <> q.vec_id
),
r AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS "rank"
  FROM s
)
SELECT query_id, neighbor_id, "rank" FROM r WHERE "rank" <= 5
""",
}

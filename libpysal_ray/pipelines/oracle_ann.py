"""DuckDB oracle SQL for the approximate-ANN, multimodal and flagship
queries — the operators whose randomness is a fixed-seed constant set.

* ann_lsh / emb_neardup_lsh: the random-hyperplane matrix (seed 5,
  ``np.random.default_rng`` ``standard_normal((64, 16))``) is embedded as
  SQL double literals via ``repr`` (shortest-roundtrip — DuckDB parses the
  decimal back to the identical IEEE double). Sign bits and cosine ranks
  are compared, not raw sums, so summation-order rounding (numpy pairwise
  vs SQL sequential) is immaterial away from measure-zero ties — the same
  argument the ``ann_top5`` oracle already relies on.
* ann_ivf: the centroid sample is the ``n_centroids`` smallest
  ``splitmix64(vec_id ^ seed)`` — reproduced with the sm64 macro from
  ``oracle_hash``; assignment/probe order ties broken by centroid index
  exactly as the engine's lexsort/argmax do.
* image_features: the fake codec (multimodal/stages.py) is deterministic
  in doc_id; every pixel is an exact dyadic rational m/2^24, so f_mean is
  an EXACT sum and f_std / f_p95 replicate numpy's evaluation order
  bit-for-bit (8-accumulator pairwise sum for the 64 squares; the
  ``b - (b-a)*(1-g)`` lerp branch numpy takes for t >= 0.5). Pinned by a
  2000-trial simulation in tests/test_oracle_ann.py.
* flagship: geocode/quadcell/PIP/queen all have closed forms on the 12x12
  lon-lat coverage (boundary-exact analysis: hash lon/lats land >= 1e-8
  from any box edge except exact-equality cases, which both the even-odd
  ray cast and the floor-division oracle assign to the upper/right box).
"""

from __future__ import annotations

import numpy as np

N_PLANES = 16
DIM = 64
LSH_SEED = 5
IVF_SEED = 11


def _planes_values_sql() -> str:
    """The (dim, n_planes) hyperplane matrix as a VALUES list — SAME rng
    calls as ann/knn.py ann_lsh_topk / cosine_dup_pairs_lsh (seed 5)."""
    rng = np.random.default_rng(LSH_SEED)
    planes = rng.standard_normal((DIM, N_PLANES))
    rows = ",".join(
        f"({i},{j},{planes[i, j]!r})"
        for i in range(DIM)
        for j in range(N_PLANES)
    )
    return f"planes(pi, pj, pv) AS (SELECT * FROM (VALUES {rows}) _pl)"


# Shared: per-vector 4-bit band values from raw-embedding hyperplane signs
# (sign(dot(normalized, p)) == sign(dot(raw, p)) — positive scale).
_BANDS_SQL = f"""
{_planes_values_sql()},
emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
dots AS (
  SELECT m.vec_id, p.pj, SUM(m.e[p.pi + 1] * p.pv) AS d
  FROM emb m, planes p GROUP BY m.vec_id, p.pj
),
bandv AS (
  SELECT vec_id, pj // 4 AS band,
         SUM(CASE WHEN d > 0 THEN
               CASE pj % 4 WHEN 0 THEN 1 WHEN 1 THEN 2
                           WHEN 2 THEN 4 ELSE 8 END
             ELSE 0 END) AS bucket
  FROM dots GROUP BY vec_id, pj // 4
)"""

ANN_LSH_SQL = f"""
WITH {_BANDS_SQL},
q AS (SELECT vec_id, e FROM emb WHERE vec_id < 10),
cand AS (
  SELECT DISTINCT qb.vec_id AS query_id, db.vec_id AS neighbor_id
  FROM bandv qb JOIN bandv db
    ON qb.band = db.band AND qb.bucket = db.bucket
   AND qb.vec_id < 10 AND db.vec_id <> qb.vec_id
),
s AS (
  SELECT c.query_id, c.neighbor_id,
         list_cosine_similarity(q.e, d.e) AS sim
  FROM cand c
  JOIN q ON q.vec_id = c.query_id
  JOIN emb d ON d.vec_id = c.neighbor_id
),
r AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS "rank"
  FROM s
)
SELECT query_id, neighbor_id, "rank" FROM r WHERE "rank" <= 5
"""

EMB_NEARDUP_LSH_SQL = f"""
WITH {_BANDS_SQL},
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bandv a JOIN bandv b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id <> b.vec_id
)
SELECT c.id_a, c.id_b
FROM cand c
JOIN emb x ON x.vec_id = c.id_a
JOIN emb y ON y.vec_id = c.id_b
WHERE list_cosine_similarity(x.e, y.e) >= 0.4
"""

# IVF: 16 centroids = smallest sm64(vec_id ^ 11); nprobe = 4. Assignment
# tie-break = lowest centroid index (the engine's np.argmax first-hit).
ANN_IVF_SQL = """
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
h AS (SELECT vec_id, e, sm64(xoru(vec_id, 11)) AS hh FROM emb),
cent AS (
  SELECT vec_id AS cvid, e AS ce,
         ROW_NUMBER() OVER (ORDER BY hh) - 1 AS cidx
  FROM h QUALIFY ROW_NUMBER() OVER (ORDER BY hh) <= 16
),
asg AS (
  SELECT vec_id, cidx FROM (
    SELECT m.vec_id, c.cidx,
           ROW_NUMBER() OVER (
             PARTITION BY m.vec_id
             ORDER BY list_cosine_similarity(m.e, c.ce) DESC, c.cidx
           ) AS rn
    FROM emb m, cent c
  ) WHERE rn = 1
),
qprobe AS (
  SELECT vec_id AS query_id, cidx FROM (
    SELECT q.vec_id, c.cidx,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.e, c.ce) DESC, c.cidx
           ) AS rn
    FROM emb q, cent c WHERE q.vec_id < 10
  ) WHERE rn <= 4
),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
  FROM qprobe p JOIN asg a ON a.cidx = p.cidx
  WHERE a.vec_id <> p.query_id
),
s AS (
  SELECT c.query_id, c.neighbor_id,
         list_cosine_similarity(q.e, d.e) AS sim
  FROM cand c
  JOIN emb q ON q.vec_id = c.query_id
  JOIN emb d ON d.vec_id = c.neighbor_id
),
r AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS "rank"
  FROM s
)
SELECT query_id, neighbor_id, "rank" FROM r WHERE "rank" <= 5
"""


def _std64_expr(s: str) -> str:
    """numpy pairwise sum of 64 squares, written out: 8 accumulators of 8
    sequential adds each, combined ((r0+r1)+(r2+r3))+((r4+r5)+(r6+r7))."""
    accs = []
    for j in range(8):
        e = f"{s}[{j + 1}]"
        for i in range(8, 64, 8):
            e = f"({e} + {s}[{i + j + 1}])"
        accs.append(e)
    return (
        f"((({accs[0]} + {accs[1]}) + ({accs[2]} + {accs[3]})) + "
        f"(({accs[4]} + {accs[5]}) + ({accs[6]} + {accs[7]})))"
    )


# g = frac(0.95 * 63); numpy's lerp takes the b-form branch for t >= 0.5
_P95 = (
    "sv[61] - (sv[61] - sv[60]) * "
    "(1.0 - ((95.0/100.0)*63.0 - floor((95.0/100.0)*63.0)))"
)

IMAGE_FEATURES_SQL = f"""
WITH dims AS (
  SELECT doc_id, 16 + doc_id % 17 AS h, 16 + doc_id % 13 AS w
  FROM documents
),
px AS (
  SELECT doc_id, r, c,
         (r * h // 8) * w + (c * w // 8) AS src
  FROM dims,
       unnest(generate_series(0, 7)) AS ur(r),
       unnest(generate_series(0, 7)) AS uc(c)
),
pv AS (
  SELECT doc_id, r, c,
         CAST(shru(sm64(wrap64(src + doc_id * 4294967296)), 40) AS DOUBLE)
           / 16777216.0 AS v
  FROM px
),
agg AS (
  SELECT doc_id,
         SUM(v) / 64.0 AS f_mean,
         list(v ORDER BY r, c) AS ov,
         list(v ORDER BY v) AS sv
  FROM pv GROUP BY doc_id
),
sq AS (
  SELECT doc_id, f_mean, sv,
         list_transform(ov, x -> (x - f_mean) * (x - f_mean)) AS s
  FROM agg
)
SELECT doc_id, f_mean,
       sqrt({_std64_expr('s')} / 64.0) AS f_std,
       {_P95} AS f_p95
FROM sq
"""

# Flagship: url synth, lonlat geocode, res-5 quadcell, PIP into the 12x12
# coverage (floor semantics == the engine's even-odd ray cast on these
# boxes), queen neighbor explode (empty sets emit neighbor = -1).
FLAGSHIP_SQL = """
WITH geo AS (
  SELECT doc_id,
         'https://site' || lpad(CAST(doc_id % 1000 AS VARCHAR), 6, '0')
           || '.example/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
         CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE)
           / 4294967296.0 * 360.0 - 180.0 AS lon,
         CAST((doc_id * 2246822519) % 4294967296 AS DOUBLE)
           / 4294967296.0 * 170.0 - 85.0 AS lat
  FROM documents
),
asg AS (
  SELECT doc_id, url,
         CAST(floor((lat + 85.0) / 170.0 * 32) AS BIGINT) * 32
           + CAST(floor((lon + 180.0) / 360.0 * 32) AS BIGINT) AS cell,
         CAST(floor((lat + 85.0) / 170.0 * 12) AS BIGINT) * 12
           + CAST(floor((lon + 180.0) / 360.0 * 12) AS BIGINT) AS polygon_id
  FROM geo
),
grid AS (
  SELECT i AS pid, i // 12 AS r, i % 12 AS c
  FROM unnest(generate_series(0, 143)) AS u(i)
),
nbr AS (
  SELECT a.pid AS pid, b.pid AS neighbor
  FROM grid a JOIN grid b
    ON abs(a.r - b.r) <= 1 AND abs(a.c - b.c) <= 1
   AND NOT (a.r = b.r AND a.c = b.c)
)
SELECT asg.url, asg.cell, asg.polygon_id,
       coalesce(nbr.neighbor, -1) AS neighbor,
       TRUE AS digest_ok
FROM asg LEFT JOIN nbr ON nbr.pid = asg.polygon_id
"""

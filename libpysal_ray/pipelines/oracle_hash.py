"""DuckDB oracle SQL for the hash-chain text/ANN operators.

The engine's text operators (minhash, simhash, fingerprint, near-dedup)
bottom out in two deterministic integer mixers — ``splitmix64`` and the
position-mixed byte hash of ``core.hashing.hash_string_array_u64`` — so
their results are reproducible in ANSI-ish SQL: DuckDB HUGEINT carries the
u64 domain (values in [0, 2^64)), multiplication wraps via ``% 2^64``, and
xor/shift run through UBIGINT casts. Every macro mirrors the numpy op
bit-for-bit (verified in tests/test_oracle_hash.py).

The ANN oracles embed the fixed-seed random-hyperplane / permutation
constants as SQL literals: the constants are generated HERE at import time
with the same ``np.random.default_rng(seed)`` calls as the operators, so
the SQL string is self-contained and the driver's DuckDB run needs no
Python state.

Exactness notes (same discipline as pipelines/queries.py):
* token hashing is byte-exact because the documents corpus is ASCII and
  single-space-joined (asserted in tests) — ``unicode(ch)`` == the utf-8
  byte;
* minhash permutation math replicates numpy's uint64 WRAPPING semantics:
  ``(a*h mod 2^64 + b mod 2^64) mod (2^61-1)`` — not the textbook
  Mersenne hash;
* jaccard estimates are exact multiples of 1/64 → float-equal on both
  sides.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- macros
# u64 domain = HUGEINT in [0, 2^64). All inputs to these are non-negative.
U64 = 18446744073709551616  # 2^64
MACROS = """
CREATE OR REPLACE MACRO wrap64(x) AS (x % 18446744073709551616);
CREATE OR REPLACE MACRO xoru(a, b) AS
  CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT);
CREATE OR REPLACE MACRO shru(a, s) AS
  CAST(CAST(a AS UBIGINT) >> CAST(s AS UBIGINT) AS HUGEINT);
CREATE OR REPLACE MACRO mulwrap(a, b) AS
  wrap64((a % 4294967296) * b
         + (((a // 4294967296) * (b % 4294967296)) % 4294967296)
           * 4294967296);
CREATE OR REPLACE MACRO sm64a(x) AS wrap64(x + 11400714819323198485);
CREATE OR REPLACE MACRO sm64b(z) AS
  mulwrap(xoru(z, shru(z, 30)), 13787848793156543929);
CREATE OR REPLACE MACRO sm64c(z) AS
  mulwrap(xoru(z, shru(z, 27)), 10723151780598845931);
CREATE OR REPLACE MACRO sm64(x) AS (
  WITH _s AS (SELECT sm64c(sm64b(sm64a(x))) AS z)
  SELECT xoru(z, shru(z, 31)) FROM _s
);
CREATE OR REPLACE MACRO toi64(x) AS
  CAST(CASE WHEN x >= 9223372036854775808
            THEN x - 18446744073709551616 ELSE x END AS BIGINT);
"""

# ------------------------------------------------- token-hash CTE chain
# Mirrors core.hashing.tokenize_hash + hash_string_array_u64 (seed 0):
# per-byte term = sm64((byte<<8) ^ wrap64(bpos * 0x9E3779B97F4A7C15)),
# per-token sum mod 2^64, then sm64(sum ^ len).
TOKH_SQL = """
toksrc AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
toks AS (
  SELECT doc_id, i - 1 AS tpos, tk[i] AS tok, length(tk[i]) AS L
  FROM toksrc, unnest(generate_series(1, len(tk))) AS u(i)
),
tterm AS (
  SELECT doc_id, tpos, L,
         sm64(xoru(unicode(tok[p]) * 256,
                   wrap64((p - 1) * 11400714819323198485))) AS term
  FROM toks, unnest(generate_series(1, L)) AS q(p)
),
tokh AS (
  SELECT doc_id, tpos, L,
         sm64(xoru(wrap64(SUM(term)), L)) AS th
  FROM tterm GROUP BY doc_id, tpos, L
)"""

FINGERPRINT_SQL = f"""
WITH {TOKH_SQL},
fpterm AS (
  SELECT doc_id, sm64(xoru(th, wrap64(tpos * 1000003))) AS term FROM tokh
),
ndoc AS (SELECT doc_id, COUNT(*) AS n FROM tokh GROUP BY doc_id)
SELECT f.doc_id,
       CAST(shru(sm64(xoru(wrap64(SUM(f.term)), d.n)), 1) AS BIGINT) AS fp
FROM fpterm f JOIN ndoc d USING (doc_id)
GROUP BY f.doc_id, d.n
"""

_POW2 = ",".join(f"({j},{1 << j})" for j in range(64))

SIMHASH_SQL = f"""
WITH {TOKH_SQL},
pw(j, p) AS (SELECT * FROM (VALUES {_POW2}) _pw),
dt AS (SELECT DISTINCT doc_id, th FROM tokh),
bits AS (
  SELECT doc_id, pw.j,
         CASE WHEN SUM(CASE WHEN (CAST(th AS UBIGINT) >> CAST(pw.j AS UBIGINT))
                                 & 1 = 1
                            THEN 1 ELSE -1 END) > 0
              THEN CAST(ANY_VALUE(pw.p) AS HUGEINT) ELSE 0 END AS pv
  FROM dt, pw
  GROUP BY doc_id, pw.j
),
sh AS (SELECT doc_id, SUM(pv) AS h FROM bits GROUP BY doc_id)
SELECT doc_id, toi64(h) AS simhash,
       CAST((CAST(h AS UBIGINT) >> 0)  & 65535 AS BIGINT) AS band0,
       CAST((CAST(h AS UBIGINT) >> 16) & 65535 AS BIGINT) AS band1,
       CAST((CAST(h AS UBIGINT) >> 32) & 65535 AS BIGINT) AS band2,
       CAST((CAST(h AS UBIGINT) >> 48) & 65535 AS BIGINT) AS band3
FROM sh
"""


def _perm_values_sql(m: int = 64, seed: int = 13) -> str:
    """The minhash permutation constants as a VALUES list — generated with
    the SAME rng calls as text.dedup._perm_params."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, m, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, (1 << 61) - 1, m, dtype=np.int64).astype(np.uint64)
    rows = ",".join(
        f"({i},{int(a[i])},{int(b[i])})" for i in range(m)
    )
    return f"perm(pi, pa, pb) AS (SELECT * FROM (VALUES {rows}) _pv)"


# minhash LSH candidate pairs + signature-estimated jaccard verify,
# defaults of text.dedup.minhash_lsh_pairs (k=3, m=64, bands=16, seed=13).
# Numpy uint64 wrap semantics: v = ((a * (sh mod 2^61)) mod 2^64 + b) mod
# 2^64, then mod (2^61 - 1).
_MINHASH_CORE = f"""
{TOKH_SQL},
dl AS (
  SELECT doc_id, list(th ORDER BY tpos) AS ths, COUNT(*) AS n
  FROM tokh GROUP BY doc_id
),
-- window starts: one per k=3 window (short docs fold all tokens into one
-- shingle). Chained splitmix is staged across CTEs because DuckDB's macro
-- binder caps nesting at 2 sm64 expansions per expression.
wst AS (
  SELECT doc_id, n, ths, i
  FROM dl, unnest(generate_series(1, CASE WHEN n >= 3 THEN n - 2
                                          WHEN n >= 1 THEN 1
                                          ELSE 0 END)) AS u(i)
),
ws1 AS (SELECT doc_id, n, ths, i, sm64(xoru(0, ths[i])) AS acc FROM wst),
ws2 AS (
  SELECT doc_id, n, ths, i,
         CASE WHEN n >= 2 THEN sm64(xoru(acc, ths[i+1])) ELSE acc END AS acc
  FROM ws1
),
shg AS (
  SELECT doc_id,
         CASE WHEN n >= 3 THEN sm64(xoru(acc, ths[i+2])) ELSE acc END AS sh
  FROM ws2
),
{_perm_values_sql()},
sigv AS (
  SELECT doc_id, pi,
         MIN(wrap64(wrap64(pa * (sh % 2305843009213693952)) + pb)
             % 2305843009213693951) AS s
  FROM shg, perm GROUP BY doc_id, pi
),
sigl AS (SELECT doc_id, list(s ORDER BY pi) AS sig FROM sigv GROUP BY doc_id),
bb0 AS (
  SELECT doc_id, sig, bnd
  FROM sigl, unnest(generate_series(0, 15)) AS u(bnd)
),
bb1 AS (SELECT doc_id, sig, bnd,
               sm64(xoru(bnd + 1, sig[bnd*4+1])) AS acc FROM bb0),
bb2 AS (SELECT doc_id, sig, bnd,
               sm64(xoru(acc, sig[bnd*4+2])) AS acc FROM bb1),
bb3 AS (SELECT doc_id, sig, bnd,
               sm64(xoru(acc, sig[bnd*4+3])) AS acc FROM bb2),
br  AS (SELECT doc_id, bnd,
               sm64(xoru(acc, sig[bnd*4+4])) AS acc FROM bb3),
bk AS (SELECT doc_id, bnd, CAST(shru(acc, 1) AS BIGINT) AS bucket FROM br),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bk x JOIN bk y
    ON x.bnd = y.bnd AND x.bucket = y.bucket AND x.doc_id < y.doc_id
),
jac AS (
  SELECT a, b,
         CAST(list_sum(list_transform(generate_series(1, 64),
              i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
              AS DOUBLE) / 64.0 AS jaccard
  FROM cand
  JOIN sigl sa ON sa.doc_id = cand.a
  JOIN sigl sb ON sb.doc_id = cand.b
),
mh_pairs AS (SELECT a, b, jaccard FROM jac WHERE jaccard >= 0.5)"""

MINHASH_PAIRS_SQL = f"""
WITH {_MINHASH_CORE}
SELECT a, b, jaccard FROM mh_pairs
"""

NEAR_DEDUP_SQL = f"""
WITH RECURSIVE {_MINHASH_CORE},
und AS (
  SELECT a AS f, b AS nb FROM mh_pairs
  UNION ALL SELECT b, a FROM mh_pairs
),
reach(ra, rb) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.ra, u.nb FROM reach r JOIN und u ON u.f = r.rb
)
SELECT ra AS doc_id, MIN(rb) AS cluster, ra = MIN(rb) AS keep
FROM reach GROUP BY ra
"""


def with_macros(sql: str) -> str:
    """Prefix the macro definitions — the driver executes the oracle with
    ``con.execute(sql)``, which runs all semicolon-separated statements and
    returns the last result set."""
    return MACROS + sql

"""The DuckDB hash-oracle macros mirror core.hashing bit-for-bit.

These tests need no Ray: they drive the SQL macros directly against the
numpy mixers so the minhash/simhash/fingerprint/near-dedup oracles'
foundation (pipelines/oracle_hash.py) is pinned independently of the
driver's end-to-end gate.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa

from libpysal_ray.core.hashing import hash_string_array_u64, splitmix64
from libpysal_ray.pipelines import oracle_hash as oh


def _con():
    con = duckdb.connect()
    con.execute(oh.MACROS)
    return con


def test_sm64_matches_splitmix64():
    con = _con()
    rng = np.random.default_rng(7)
    xs = np.concatenate(
        [
            np.array([0, 1, (1 << 64) - 1, (1 << 63)], np.uint64),
            rng.integers(0, 1 << 63, 32, dtype=np.int64).astype(np.uint64),
        ]
    )
    want = splitmix64(xs)
    got = np.array(
        [
            con.execute(f"SELECT sm64({int(x)})").fetchone()[0]
            for x in xs
        ],
        dtype=np.uint64,
    )
    np.testing.assert_array_equal(got, want)


def test_mulwrap_is_u64_product():
    con = _con()
    rng = np.random.default_rng(11)
    a = rng.integers(0, 1 << 63, 16, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, 1 << 63, 16, dtype=np.int64).astype(np.uint64)
    want = a * b  # numpy uint64 wraps mod 2^64
    got = np.array(
        [
            con.execute(
                f"SELECT mulwrap(CAST({int(x)} AS HUGEINT), "
                f"CAST({int(y)} AS HUGEINT))"
            ).fetchone()[0]
            for x, y in zip(a, b)
        ],
        dtype=np.uint64,
    )
    np.testing.assert_array_equal(got, want)


def test_token_hash_chain_matches_engine():
    """The TOKH CTE = tokenize_hash + hash_string_array_u64 on ASCII,
    single-space-joined text (the documents-table contract)."""
    texts = [
        "the quick brown fox",
        "a",
        "xyzzy xyzzy xyzzy",
        "one two three four five six seven",
    ]
    con = _con()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") AS t(doc_id, text)"
    )
    rows = con.execute(
        f"WITH {oh.TOKH_SQL} SELECT doc_id, tpos, th FROM tokh "
        "ORDER BY doc_id, tpos"
    ).fetchall()
    for doc_id, tpos, th in rows:
        tok = texts[doc_id].split(" ")[tpos]
        want = int(hash_string_array_u64(pa.array([tok]))[0])
        assert int(th) == want, (doc_id, tpos, tok)


def test_minhash_permutation_constants_are_stable():
    """_perm_values_sql embeds the SAME constants _perm_params draws."""
    from libpysal_ray.text.dedup import _perm_params

    a, b = _perm_params(64, seed=13)
    sql = oh._perm_values_sql(64, seed=13)
    con = _con()
    rows = con.execute(
        f"WITH {sql} SELECT pi, pa, pb FROM perm ORDER BY pi"
    ).fetchall()
    assert len(rows) == 64
    for pi, pa_, pb_ in rows:
        assert int(pa_) == int(a[pi]) and int(pb_) == int(b[pi])

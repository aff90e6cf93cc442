"""Token-window operators: chunking, bigrams, co-occurrence, tf-idf."""

import numpy as np
import pyarrow as pa
import ray.data


DOCS = [
    (1, "a b c d e f g"),
    (2, "x y z"),
    (3, "a a b a"),
    (4, ""),
]


def _ds():
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
        "text": pa.array([t for _, t in DOCS]),
    }))


def _tokens(text):
    return text.split(" ")  # '' splits to [''] like pc.split_pattern


def test_chunk_documents_matches_reference():
    from libpysal_ray.text.ngrams import chunk_documents

    W, S = 3, 2
    got = chunk_documents(_ds(), window=W, stride=S).to_pandas()
    got = got.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    exp = []
    for did, text in DOCS:
        toks = _tokens(text)
        n = len(toks)
        c = 0
        while c * S < n:
            sel = toks[c * S: min(c * S + W, n)]
            exp.append((did, c, len(sel), " ".join(sel)))
            c += 1
    assert list(map(tuple, got.itertuples(index=False))) == exp


def test_chunk_stride_larger_than_window_drops_tokens():
    from libpysal_ray.text.ngrams import chunk_documents

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["t0 t1 t2 t3 t4 t5"]),
    }))
    out = chunk_documents(ds, window=2, stride=4).to_pandas()
    assert list(out["chunk_text"]) == ["t0 t1", "t4 t5"]


def test_bigram_counts():
    from libpysal_ray.text.ngrams import bigram_counts

    got = bigram_counts(_ds()).to_pandas()
    m = dict(zip(got["bigram"], got["n"]))
    exp: dict = {}
    for _, text in DOCS:
        toks = _tokens(text)
        for i in range(len(toks) - 1):
            key = toks[i] + " " + toks[i + 1]
            exp[key] = exp.get(key, 0) + 1
    assert m == exp


def test_cooccurrence_graph_window2():
    from libpysal_ray.text.ngrams import cooccurrence_graph

    got = cooccurrence_graph(_ds(), window=2).to_pandas()
    m = {(a, b): n for a, b, n in got.itertuples(index=False)}
    exp: dict = {}
    for _, text in DOCS:
        toks = _tokens(text)
        for i in range(len(toks)):
            for d in (1, 2):
                if i + d < len(toks):
                    k = (toks[i], toks[i + d])
                    exp[k] = exp.get(k, 0) + 1
    assert m == exp


def test_tfidf_top_terms_ordering():
    from libpysal_ray.text.ngrams import tfidf_top_terms

    # doc 3: tf(a)=3 > tf(b)=1; doc 1: all tf=1 → ties break by df
    # then term asc. df: a→2 docs, others→1 doc ('' from doc 4 counts).
    got = tfidf_top_terms(_ds(), k=2, max_vocab=100).to_pandas()
    got = got.sort_values(["doc_id", "tf", "df", "term"],
                          ascending=[True, False, True, True])
    d3 = got[got.doc_id == 3]
    assert list(d3["term"]) == ["a", "b"]
    assert list(d3["tf"]) == [3, 1]
    d1 = got[got.doc_id == 1]
    # every doc-1 term has tf=1; 'a' and 'b' (df=2, both also in doc 3)
    # sort AFTER the df=1 terms 'c'..'g' → term asc picks 'c', 'd'
    assert list(d1["term"]) == ["c", "d"]


def test_tfidf_max_vocab_bounds_terms():
    from libpysal_ray.text.ngrams import tfidf_top_terms

    got = tfidf_top_terms(_ds(), k=5, max_vocab=1).to_pandas()
    # only the single most document-frequent term ('a', df=2) is in vocab
    assert set(got["term"]) == {"a"}


def test_chunks_oracle_parity_duckdb():
    """The chunks byte-gather matches DuckDB's list-slice + join."""
    import duckdb

    from libpysal_ray.text.ngrams import chunk_documents

    got = chunk_documents(_ds(), window=4, stride=3).to_pandas()
    got = got.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    exp = con.execute("""
        WITH t AS (SELECT doc_id, string_split(text,' ') AS toks,
                          len(string_split(text,' ')) AS n FROM documents),
         i AS (SELECT doc_id, toks, n,
                      unnest(range(0, CAST(CEIL(n/3.0) AS BIGINT))) AS ci
               FROM t)
        SELECT doc_id, ci AS chunk_id,
               least(ci*3+4, n) - ci*3 AS n_tokens,
               array_to_string(toks[ci*3+1 : least(ci*3+4, n)], ' ')
                 AS chunk_text
        FROM i ORDER BY doc_id, ci
    """).df()
    assert got.equals(exp.astype(got.dtypes.to_dict()))


def test_collocations_exact_ratio():
    from libpysal_ray.text.ngrams import collocations

    # "a b" occurs 3x; unigrams: a=4, b=3; T=10
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b a b c", "a b a c d"]),
    }))
    got = collocations(ds, min_count=2).to_pandas()
    row = got[(got.term_a == "a") & (got.term_b == "b")].iloc[0]
    assert int(row["n_ab"]) == 3
    assert row["ratio"] == (3.0 * 10.0) / (4.0 * 3.0)


def test_collocations_min_count_filters():
    from libpysal_ray.text.ngrams import collocations

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["a b c"]),
    }))
    assert collocations(ds, min_count=2).count() == 0


def test_bigram_familiarity_closed_form():
    from libpysal_ray.text.ngrams import bigram_familiarity

    # corpus bigrams: "a b"x3, "b a"x2, "b c"x1, "a c"x1
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b a b c", "a b a c"]),
    }))
    got = {r["doc_id"]: (r["n_bigrams"], r["fam_sum"])
           for r in bigram_familiarity(ds).take_all()}
    # doc1: a b, b a, a b, b c -> 3+2+3+1 = 9 over 4
    # doc2: a b, b a, a c     -> 3+2+1 = 6 over 3
    assert got == {1: (4, 9), 2: (3, 6)}


def test_bigram_familiarity_short_docs_absent():
    from libpysal_ray.text.ngrams import bigram_familiarity

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["solo", "a b"]),
    }))
    got = {r["doc_id"] for r in bigram_familiarity(ds).take_all()}
    assert got == {2}

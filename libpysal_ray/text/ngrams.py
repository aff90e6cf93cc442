"""Token-window operators: chunking, n-gram counting, co-occurrence.

The operators a training-data pipeline runs right before tokenization:
split documents into fixed token windows (context packing / RAG
chunking), count word n-grams, and build the windowed co-occurrence
graph (the GloVe / PMI input — literally a spatial weights matrix whose
"space" is token position; cf. libpysal's W over planar neighbours,
reference graph/base.py adjacency table semantics).

100 TB shape shared by all three: one ``map_batches`` pass does an
Arrow whitespace split, then every per-batch kernel works on the FLAT
token buffer with numpy segment arithmetic — zero Python per row or
per token. Chunk / n-gram TEXT is never re-joined token by token:
because tokens are single-space separated, any token window is a
contiguous byte range of the original string, so output strings are
one vectorized multi-range gather from the raw Arrow data buffer.
Counting operators emit per-batch (key, partial-count) combiners so
the ONE shuffle moves batch-distinct keys, not corpus tokens.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from libpysal_ray.core.hashing import _string_array_parts

__all__ = [
    "chunk_documents",
    "bigram_counts",
    "cooccurrence_graph",
    "tfidf_top_terms",
    "collocations",
    "bigram_familiarity",
]


def _multirange_gather(data: np.ndarray, starts: np.ndarray,
                       stops: np.ndarray) -> pa.Array:
    """Build a large_string array whose i-th value is
    ``data[starts[i]:stops[i]]`` — one vectorized gather, no per-string
    Python. Classic segmented-index construction: a ones vector with
    jump corrections at segment boundaries, cumsum → flat gather index."""
    lens = (stops - starts).astype(np.int64)
    total = int(lens.sum())
    n = len(lens)
    new_off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    if total == 0:
        values = np.empty(0, dtype=np.uint8)
    else:
        ne = lens > 0
        s, e = starts[ne], stops[ne]
        seg = np.concatenate([[0], np.cumsum(e - s)])
        idx = np.ones(total, dtype=np.int64)
        idx[0] = s[0]
        idx[seg[1:-1]] = s[1:] - e[:-1] + 1
        values = data[np.cumsum(idx)]
    return pa.Array.from_buffers(
        pa.large_string(), n,
        [None, pa.py_buffer(new_off), pa.py_buffer(values)],
    )


def _token_layout(col):
    """Flat-token layout of a single-space-separated string column:
    (doc_count, tokens_per_doc, flat token array, ORIGINAL data buffer,
    absolute token byte starts INTO THE ORIGINAL buffer, token byte
    lens). The split's own values buffer concatenates tokens WITHOUT
    separators, so window text must be gathered from the original
    buffer — token j of doc i starts at doc_start[i] + Σ_{t<j}(len_t+1)
    (the +1 is the single space). Empty docs split to one empty token —
    n is always ≥ 1."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lists = pc.split_pattern(col, " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    n = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    n = n.astype(np.int64)
    _tok_data, _tok_starts, tlens = _string_array_parts(flat)
    data, dstarts, _dlens = _string_array_parts(col)
    if len(n) == 0:
        return 0, n, flat, data, np.empty(0, np.int64), tlens
    gaps = np.concatenate([[0], np.cumsum(tlens + 1)[:-1]])
    doc_first = np.concatenate([[0], np.cumsum(n)])[:-1]
    within = gaps - np.repeat(gaps[doc_first], n)
    tstarts = np.repeat(dstarts, n) + within
    return len(n), n, flat, data, tstarts, tlens


def chunk_documents(
    ds: ray.data.Dataset,
    window: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Split each document into token windows of ``window`` tokens every
    ``stride`` tokens (starts 0, S, 2S, … < n_tokens; the final chunk may
    be short) — context packing for training / RAG chunking. Output:
    (doc_id, chunk_id, n_tokens, chunk_text). Purely batch-local: no
    shuffle at any scale; output rows ≈ input tokens / stride."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")

    def _f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        ndoc, n, _flat, data, tstarts, tlens = _token_layout(
            t.column(text_col))
        if ndoc == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "chunk_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.large_string()),
            })
        nchunks = (n + stride - 1) // stride
        doc_first = np.concatenate([[0], np.cumsum(n)])[:-1]
        total = int(nchunks.sum())
        cdoc = np.repeat(np.arange(ndoc), nchunks)
        cbase = np.repeat(np.concatenate([[0], np.cumsum(nchunks)])[:-1],
                          nchunks)
        cid = np.arange(total, dtype=np.int64) - cbase
        a = cid * stride                       # first token (per doc)
        b = np.minimum(a + window, n[cdoc]) - 1  # last token, inclusive
        af = doc_first[cdoc] + a
        bf = doc_first[cdoc] + b
        text = _multirange_gather(data, tstarts[af],
                                  tstarts[bf] + tlens[bf])
        return pa.table({
            id_col: pa.array(ids[cdoc]),
            "chunk_id": pa.array(cid),
            "n_tokens": pa.array((b - a + 1).astype(np.int64)),
            "chunk_text": text,
        })

    return ds.map_batches(_f, batch_format="pyarrow")


def bigram_counts(
    ds: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """Corpus word-bigram frequency table (bigram, n). Bigram text is the
    original two-token byte span (one gather, never a join); a per-batch
    ``value_counts`` combiner shrinks the ONE groupby(bigram) shuffle to
    batch-distinct bigrams."""

    def _partial(t: pa.Table) -> pa.Table:
        ndoc, n, _flat, data, tstarts, tlens = _token_layout(
            t.column(text_col))
        empty = pa.table({
            "bigram": pa.array([], pa.large_string()),
            "n": pa.array([], pa.int64()),
        })
        if ndoc == 0:
            return empty
        # flat token j starts a bigram iff it is not the last of its doc
        doc_last = np.cumsum(n) - 1
        first = np.ones(int(n.sum()), dtype=bool)
        first[doc_last] = False
        j = np.flatnonzero(first)
        if len(j) == 0:
            return empty
        big = _multirange_gather(data, tstarts[j],
                                 tstarts[j + 1] + tlens[j + 1])
        vc = big.value_counts()
        return pa.table({
            "bigram": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("bigram")
        .sum("n")
        .rename_columns({"sum(n)": "n"})
    )


def cooccurrence_graph(
    ds: ray.data.Dataset, window: int = 2, text_col: str = "text"
) -> ray.data.Dataset:
    """Windowed co-occurrence graph: ordered pair (term_a, term_b) counted
    once per occurrence of term_b within ``window`` positions AFTER
    term_a in the same document — the PMI / GloVe co-occurrence input,
    and structurally a libpysal W over token positions (distance-band
    weights on the line; cf. reference weights/distance.py DistanceBand
    semantics, graph/base.py adjacency table).

    Per batch: dictionary-encode the flat tokens once, form pair codes
    a·K+b for each offset 1..window with pure numpy shifts, one
    ``np.unique`` combiner — the ONE groupby(term_a, term_b) shuffle
    moves batch-distinct pairs, bounded by vocab², not corpus tokens."""
    if window < 1:
        raise ValueError("window must be ≥ 1")

    def _partial(t: pa.Table) -> pa.Table:
        ndoc, n, flat, _data, _ts, _tl = _token_layout(t.column(text_col))
        empty = pa.table({
            "term_a": pa.array([], pa.large_string()),
            "term_b": pa.array([], pa.large_string()),
            "n": pa.array([], pa.int64()),
        })
        if ndoc == 0 or len(flat) == 0:
            return empty
        d = flat.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        K = len(d.dictionary)
        doc_id = np.repeat(np.arange(ndoc), n)
        keys = []
        for off in range(1, window + 1):
            if off >= len(codes):
                break
            ok = doc_id[:-off] == doc_id[off:]
            keys.append(codes[:-off][ok] * K + codes[off:][ok])
        if not keys:
            return empty
        pair, cnt = np.unique(np.concatenate(keys), return_counts=True)
        dic = pa.table({"t": d.dictionary}).column("t")
        return pa.table({
            "term_a": pc.cast(dic.take(pa.array(pair // K)),
                              pa.large_string()),
            "term_b": pc.cast(dic.take(pa.array(pair % K)),
                              pa.large_string()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["term_a", "term_b"])
        .sum("n")
        .rename_columns({"sum(n)": "n"})
    )


def tfidf_top_terms(
    ds: ray.data.Dataset,
    k: int = 3,
    max_vocab: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Top-``k`` most distinctive terms per document: rank by
    (tf DESC, df ASC, term ASC) over the ``max_vocab`` most document-
    frequent terms. Output (doc_id, term, tf, df).

    100 TB shape: document frequency is ONE pre-aggregated shuffle
    (vocab-sized result, capped at ``max_vocab`` by df — the standard
    min-df/top-V vocabulary bound), broadcast once via ``ray.put``; the
    per-doc ranking is then a single batch-local pass — documents never
    shuffle. The string tie-break is exact without string sorts: the
    broadcast vocab is pre-sorted lexicographically, so its index IS the
    lexicographic rank."""
    from libpysal_ray.text.analysis import doc_term_stats

    df_tbl = (
        doc_term_stats(ds.select_columns([id_col, text_col]),
                       text_col=text_col)
        .sort(["df", "word"], descending=[True, False])
        .limit(max_vocab)
        .take_all()
    )
    vocab = sorted((r["word"], int(r["df"])) for r in df_tbl)
    vwords = pa.array([w for w, _ in vocab], pa.large_string())
    vdf = np.array([d for _, d in vocab], dtype=np.int64)
    ref = ray.put((vwords, vdf))

    def _f(t: pa.Table) -> pa.Table:
        vwords, vdf = ray.get(ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        ndoc, n, flat, _data, _ts, _tl = _token_layout(t.column(text_col))
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "term": pa.array([], pa.large_string()),
            "tf": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
        })
        if ndoc == 0 or len(flat) == 0:
            return empty
        # vocab index = lexicographic rank; out-of-vocab tokens drop
        vi = pc.index_in(pc.cast(flat, pa.large_string()),
                         value_set=vwords)
        vi = vi.to_numpy(zero_copy_only=False).astype(np.float64)
        doc = np.repeat(np.arange(ndoc), n).astype(np.float64)
        ok = ~np.isnan(vi)
        vi, doc = vi[ok].astype(np.int64), doc[ok].astype(np.int64)
        if len(vi) == 0:
            return empty
        # tf per (doc, vocab term): one lexsort + run-length
        order = np.lexsort((vi, doc))
        dd, vv = doc[order], vi[order]
        new = np.ones(len(dd), bool)
        new[1:] = (dd[1:] != dd[:-1]) | (vv[1:] != vv[:-1])
        starts = np.flatnonzero(new)
        tf = np.diff(np.append(starts, len(dd))).astype(np.int64)
        dh, vh = dd[starts], vv[starts]
        # top-k per doc by (tf desc, df asc, vocab-rank asc)
        sel = np.lexsort((vh, vdf[vh], -tf, dh))
        ds_, = (dh[sel],)
        grp_new = np.ones(len(ds_), bool)
        grp_new[1:] = ds_[1:] != ds_[:-1]
        gstarts = np.flatnonzero(grp_new)
        gid = np.cumsum(grp_new) - 1
        rank = np.arange(len(ds_)) - gstarts[gid]
        keep = sel[rank < k]
        return pa.table({
            id_col: pa.array(ids[dh[keep]]),
            "term": vwords.take(pa.array(vh[keep])),
            "tf": pa.array(tf[keep]),
            "df": pa.array(vdf[vh[keep]]),
        })

    return ds.map_batches(_f, batch_format="pyarrow")


def collocations(
    ds: ray.data.Dataset,
    min_count: int = 5,
    text_col: str = "text",
    max_vocab: int = 65536,
) -> ray.data.Dataset:
    """Collocation scores: adjacent word pairs ranked by the PMI ratio
    r = (n_ab · T) / (n_a · n_b) (T = corpus tokens; log is monotone so
    the ratio ranks identically and stays IEEE-exact for the oracle).
    Output (term_a, term_b, n_ab, ratio) for pairs with
    n_ab ≥ min_count.

    100 TB shape: pair and unigram tables are the already-combined
    vocab-bounded aggregates; the unigram side is capped at
    ``max_vocab`` by count (the standard top-V collocation bound) and
    broadcast ONCE via ray.put — attaching n_a/n_b to the pair table is
    a batch-local lookup, not a join shuffle."""
    from libpysal_ray.text.analysis import word_counts

    pairs = cooccurrence_graph(ds, window=1, text_col=text_col)
    # materialize: Ray shares no subplans — the vocab-bounded table
    # feeds both the exact total and the capped broadcast
    wc_full = word_counts(ds, text_col=text_col).materialize()
    total = int(wc_full.sum("n"))  # exact T from the UNCAPPED table
    wc = (
        wc_full.sort(["n", "word"], descending=[True, False])
        .limit(max_vocab)
        .take_all()
    )
    words = pa.array([r["word"] for r in wc], pa.large_string())
    counts = np.array([int(r["n"]) for r in wc], dtype=np.int64)
    ref = ray.put((words, counts, total))

    def _score(t: pa.Table) -> pa.Table:
        words, counts, total = ray.get(ref)
        if t.num_rows == 0:
            return pa.table({
                "term_a": pa.array([], pa.large_string()),
                "term_b": pa.array([], pa.large_string()),
                "n_ab": pa.array([], pa.int64()),
                "ratio": pa.array([], pa.float64()),
            })
        nab = t.column("n_ab").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ia = pc.index_in(pc.cast(t.column("term_a"), pa.large_string()),
                         value_set=words).to_numpy(zero_copy_only=False)
        ib = pc.index_in(pc.cast(t.column("term_b"), pa.large_string()),
                         value_set=words).to_numpy(zero_copy_only=False)
        ok = (~np.isnan(ia.astype(np.float64))
              & ~np.isnan(ib.astype(np.float64))
              & (nab >= min_count))
        idx = np.flatnonzero(ok)
        na = counts[ia[idx].astype(np.int64)].astype(np.float64)
        nb = counts[ib[idx].astype(np.int64)].astype(np.float64)
        # op order pinned: (n_ab·T) / (n_a·n_b), all float64 — the oracle
        # writes the identical expression
        ratio = (nab[idx].astype(np.float64) * np.float64(total)
                 / (na * nb))
        sub = t.take(pa.array(idx))
        return pa.table({
            "term_a": sub.column("term_a"),
            "term_b": sub.column("term_b"),
            "n_ab": pa.array(nab[idx]),
            "ratio": pa.array(ratio),
        })

    return pairs.rename_columns({"n": "n_ab"}).map_batches(
        _score, batch_format="pyarrow"
    )


def bigram_familiarity(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Count-based language-model familiarity score (the CCNet-style
    "how typical is this document of the corpus" signal, kept in exact
    integers instead of smoothed log-probs): for every document, the sum
    of CORPUS-WIDE occurrence counts of its adjacent word bigrams plus
    its bigram total — (id, n_bigrams, fam_sum). fam_sum/n_bigrams is
    the mean transition frequency; rare-transition (low-familiarity)
    docs rank last. Documents with fewer than two tokens emit no row.

    100 TB shape: ONE tokenization pass emits per-doc DISTINCT bigram
    hashes with multiplicity (batch combiner) and is materialized (it is
    consumed twice and is far narrower than the text); corpus counts are
    a groupby(hash) over that stream, attached back with one distributed
    ``bucket_join``, and reduced per document with batch partials into a
    final groupby(id). Joining on the 64-bit bigram hash (not the
    string) keeps the shuffle narrow; a cross-bigram hash collision
    (~2^-64 birthday terms) would merge two transition counts."""
    from libpysal_ray.core.hashing import hash_string_array_u64
    from libpysal_ray.core.joins import bucket_join

    def _docgrams(t: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "bgh": pa.array([], pa.int64()),
            "k": pa.array([], pa.int64()),
        })
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ndoc, n, _flat, data, tstarts, tlens = _token_layout(
            t.column(text_col))
        if ndoc == 0:
            return empty
        doc_last = np.cumsum(n) - 1
        first = np.ones(int(n.sum()), dtype=bool)
        first[doc_last] = False
        j = np.flatnonzero(first)
        if len(j) == 0:
            return empty
        big = _multirange_gather(data, tstarts[j],
                                 tstarts[j + 1] + tlens[j + 1])
        docof = np.repeat(np.arange(ndoc, dtype=np.int64),
                          np.maximum(n - 1, 0))
        enc = pc.dictionary_encode(big)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        dh = hash_string_array_u64(enc.dictionary).view(np.int64)
        K = np.int64(max(len(enc.dictionary), 1))
        uk, cnt = np.unique(docof * K + codes, return_counts=True)
        d_i = (uk // K).astype(np.int64)
        c_i = (uk % K).astype(np.int64)
        return pa.table({
            id_col: pa.array(ids[d_i]),
            "bgh": pa.array(dh[c_i]),
            "k": pa.array(cnt.astype(np.int64)),
        })

    stream = ds.map_batches(
        _docgrams, batch_format="pyarrow"
    ).materialize()  # consumed twice; Ray shares no subplans
    counts = (
        stream.map_batches(
            lambda t: t.select(["bgh", "k"]), batch_format="pyarrow"
        )
        .groupby("bgh")
        .sum("k")
        .rename_columns({"sum(k)": "n"})
    )
    joined = bucket_join(stream, counts, on="bgh",
                         num_buckets=num_buckets)

    def _partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        k = t.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        si, sk, sn = ids[order], k[order], n[order]
        new = np.ones(len(si), bool)
        new[1:] = si[1:] != si[:-1]
        starts = np.flatnonzero(new)
        if len(starts) == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                "fam_sum": pa.array([], pa.int64()),
            })
        return pa.table({
            id_col: pa.array(si[starts]),
            "n_bigrams": pa.array(np.add.reduceat(sk, starts)),
            "fam_sum": pa.array(np.add.reduceat(sk * sn, starts)),
        })

    part = joined.map_batches(_partial, batch_format="pyarrow")
    out = part.groupby(id_col).sum(["n_bigrams", "fam_sum"])

    def _shape(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t.column(id_col),
            "n_bigrams": pc.cast(t.column("sum(n_bigrams)"), pa.int64()),
            "fam_sum": pc.cast(t.column("sum(fam_sum)"), pa.int64()),
        })

    return out.map_batches(_shape, batch_format="pyarrow")


def familiarity_buckets(
    ds: ray.data.Dataset,
    n_buckets: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """CCNet-style familiarity bucketing (Wenzek et al. 2020 split the
    corpus into head/middle/tail by LM perplexity; here the integer
    mean transition frequency of :func:`bigram_familiarity` plays the
    perplexity role, keeping every step exact): per document,
    mean_fam = fam_sum // n_bigrams, bucketed by VALUE thresholds at
    the exact k-th order statistics t_c = smallest value whose
    cumulative count reaches (c+1)·n // B,

        bucket = Σ_c [mean_fam > t_c]     (0 = tail … B−1 = head)

    Value thresholds (not row ranks) mean boundary TIES share a bucket
    — deterministic at any layout with no id tie-break machinery.
    Output (doc_id, mean_fam, bucket); docs with no bigram emit no row
    (inherited from bigram_familiarity).

    100 TB shape: one bigram_familiarity pass, ONE distinct-value
    histogram groupby (the ``select_top_fraction`` integer-score
    contract, loud 4M guard), B−1 cuts broadcast in the closure of a
    stateless per-row pass."""
    if n_buckets < 2:
        raise ValueError("familiarity_buckets needs n_buckets >= 2")
    fam = bigram_familiarity(ds, id_col=id_col, text_col=text_col)
    mean = fam.map_batches(
        lambda t: pa.table({
            id_col: t.column(id_col),
            "mean_fam": pc.cast(
                pc.divide(t.column("fam_sum"), t.column("n_bigrams")),
                pa.int64(),
            ),
        }),
        batch_format="pyarrow",
    ).materialize()
    hist = mean.groupby("mean_fam").count().take_all()
    if len(hist) > 4_000_000:
        raise ValueError("familiarity_buckets: too many distinct "
                         "values; rescale the score")
    vs = np.array(sorted(int(r["mean_fam"]) for r in hist),
                  dtype=np.int64)
    cm = {int(r["mean_fam"]): int(r["count()"]) for r in hist}
    cnt = np.array([cm[int(v)] for v in vs], dtype=np.int64)
    cum = np.cumsum(cnt)
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return mean.map_batches(
            lambda t: t.append_column(
                "bucket", pa.array([], pa.int64())),
            batch_format="pyarrow",
        )
    cuts = np.array([
        vs[int(np.searchsorted(cum, (c + 1) * n // n_buckets))]
        for c in range(n_buckets - 1)
    ], dtype=np.int64)

    def _bucket(t: pa.Table) -> pa.Table:
        v = t.column("mean_fam").to_numpy(zero_copy_only=False)
        b = (v[:, None] > cuts[None, :]).sum(axis=1).astype(np.int64)
        return pa.table({
            id_col: t.column(id_col),
            "mean_fam": pa.array(v.astype(np.int64)),
            "bucket": pa.array(b),
        })

    return mean.map_batches(_bucket, batch_format="pyarrow")

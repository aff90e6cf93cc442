"""Text-analysis stages for large-scale training-data pipelines.

All are stateless vectorized ``map_batches`` stages over the documents
table (pyarrow.compute / numpy kernels — no per-row Python in any hot
path).

Ops: token counting (whitespace), quality scoring (stopword/length ratios),
language-ID (stopword-hit heuristic over ~8 languages), document
fingerprinting (order-sensitive positional token hash, fully vectorized
via core.hashing.tokenize_hash).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# tiny per-language function-word lists (public knowledge)
_LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "und", "die", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "los", "que", "es"),
    "it": ("il", "la", "che", "di", "è"),
    "pt": ("o", "a", "os", "que", "é"),
    "nl": ("de", "het", "en", "van", "is"),
    "sv": ("och", "det", "att", "en", "är"),
}

_FP_BASE = np.uint64(1000003)


def token_stats(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(…, n_tokens, avg_token_len): whitespace token count via a vectorized
    substring count (n_spaces + 1 — exact for single-space-joined text)."""

    def _f(t: pa.Table) -> pa.Table:
        txt = t.column(text_col)
        spaces = pc.count_substring(txt, " ").to_numpy(zero_copy_only=False)
        length = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        n_tokens = spaces + 1
        avg = (length - spaces).astype(np.float64) / n_tokens.astype(np.float64)
        t = t.append_column("n_tokens", pa.array(n_tokens.astype(np.int64)))
        return t.append_column("avg_token_len", pa.array(avg))

    return ds.map_batches(_f, batch_format="pyarrow")


def quality_score(
    ds: ray.data.Dataset,
    text_col: str = "text",
    stopwords: tuple[str, ...] = _LANG_STOPWORDS["en"],
) -> ray.data.Dataset:
    """(…, stop_hits, quality): stopword-occurrence count (substring,
    vectorized) over token count — a cheap fluency proxy."""

    def _f(t: pa.Table) -> pa.Table:
        txt = t.column(text_col)
        spaces = pc.count_substring(txt, " ").to_numpy(zero_copy_only=False)
        hits = np.zeros(t.num_rows, dtype=np.int64)
        for w in stopwords:
            hits += pc.count_substring(txt, f" {w} ").to_numpy(
                zero_copy_only=False
            )
        n_tokens = (spaces + 1).astype(np.float64)
        t = t.append_column("stop_hits", pa.array(hits))
        return t.append_column("quality", pa.array(hits / n_tokens))

    return ds.map_batches(_f, batch_format="pyarrow")


def lang_id(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(…, lang_pred): argmax of per-language stopword hit counts."""
    langs = sorted(_LANG_STOPWORDS)

    def _f(t: pa.Table) -> pa.Table:
        txt = t.column(text_col)
        scores = np.zeros((t.num_rows, len(langs)), dtype=np.int64)
        for j, lg in enumerate(langs):
            for w in _LANG_STOPWORDS[lg]:
                scores[:, j] += pc.count_substring(txt, f" {w} ").to_numpy(
                    zero_copy_only=False
                )
        pred = [langs[j] for j in np.argmax(scores, axis=1)]
        return t.append_column("lang_pred", pa.array(pred))

    return ds.map_batches(_f, batch_format="pyarrow")


def fingerprint(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(…, fp): order-sensitive 63-bit document fingerprint — FULLY
    vectorized positional hash: each token hash is mixed with its
    position, summed per document (np.add.reduceat over the flat token
    array), and finalized. Order sensitivity comes from the position
    term; equal token multisets in different orders fingerprint
    differently, same contract as the previous rolling-hash form."""

    def _f(t: pa.Table) -> pa.Table:
        from libpysal_ray.core.hashing import splitmix64, tokenize_hash

        n_docs = t.num_rows
        th, off = tokenize_hash(t.column(text_col))
        out = np.zeros(n_docs, dtype=np.uint64)
        if len(th):
            lens = np.diff(off)
            seg = off[:-1]
            pos = np.arange(len(th), dtype=np.uint64) - np.repeat(
                seg.astype(np.uint64), lens
            )
            term = splitmix64(th ^ (pos * _FP_BASE))
            ne = lens > 0
            out[ne] = np.add.reduceat(term, seg[ne])
            out = splitmix64(out ^ lens.astype(np.uint64))
            out[~ne] = 0
        return t.append_column(
            "fp", pa.array((out >> np.uint64(1)).astype(np.int64))
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def _dup2_occurrences(col) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc (dup-2gram occurrence count, 2-gram total) — the shared
    Gopher repetition kernel: flat token hashes → chained-splitmix
    window hashes → duplicate-run accounting via one lexsort."""
    from libpysal_ray.core.hashing import splitmix64, tokenize_hash

    th, off = tokenize_hash(col)
    n_docs = len(off) - 1
    lens = np.diff(off)
    n2 = np.maximum(lens - 1, 0).astype(np.int64)
    dupocc = np.zeros(n_docs, dtype=np.int64)
    if len(th) >= 2:
        acc0 = splitmix64(th.astype(np.uint64))
        g = splitmix64(acc0[:-1] ^ th[1:])
        doc_of = np.repeat(np.arange(n_docs), lens)
        valid = doc_of[:-1] == doc_of[1:]
        g, gd = g[valid], doc_of[:-1][valid]
        order = np.lexsort((g, gd))
        gs, ds_ = g[order], gd[order]
        change = np.r_[True, (ds_[1:] != ds_[:-1]) | (gs[1:] != gs[:-1])]
        starts = np.flatnonzero(change)
        runs = np.diff(np.append(starts, len(gs)))
        dup_runs = runs >= 2
        np.add.at(dupocc, ds_[starts[dup_runs]], runs[dup_runs])
    return dupocc, n2


def rep_stats(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """(doc_id, n_2grams, dup_frac): Gopher-style repetition signal — the
    fraction of 2-gram OCCURRENCES belonging to a 2-gram that appears ≥2
    times in the document (Rae et al. 2021 repetition filters). Fully
    vectorized via the shared ``_dup2_occurrences`` kernel."""

    def _f(t: pa.Table) -> pa.Table:
        dupocc, n2 = _dup2_occurrences(t.column(text_col))
        frac = np.zeros(len(n2))
        nz = n2 > 0
        frac[nz] = dupocc[nz] / n2[nz]
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_2grams": pa.array(n2),
                "dup_frac": pa.array(frac),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _f, batch_format="pyarrow"
    )


def domain_stats(
    pages: ray.data.Dataset, url_col: str = "url", text_col: str = "text"
) -> ray.data.Dataset:
    """(domain, n_pages, total_chars): per-domain page count and text
    volume — the standard web-corpus budget/aggregation reduction. Domain
    is parsed from the url with Arrow string kernels; the groupby uses
    native partial aggregates (combiner before the one shuffle)."""
    import pyarrow.compute as pc2
    from ray.data.aggregate import Count, Sum

    def _f(t: pa.Table) -> pa.Table:
        dom = pc2.list_element(
            pc2.split_pattern(t.column(url_col), "/"), 2
        )
        ln = pc2.utf8_length(t.column(text_col))
        return pa.table({"domain": dom, "chars": pc2.cast(ln, pa.int64())})

    g = pages.select_columns([url_col, text_col]).map_batches(
        _f, batch_format="pyarrow"
    ).groupby("domain").aggregate(Count(), Sum("chars"))
    return g.rename_columns(
        {"count()": "n_pages", "sum(chars)": "total_chars"}
    )


def word_counts(
    ds: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """Corpus word-frequency table (word, n) — the wordcount shuffle done
    the 100 TB way: per-batch flat tokenization (Arrow split + list
    flatten, zero Python per row) feeds a LOCAL ``value_counts`` combiner,
    so the ONE ``groupby(word)`` shuffle moves per-batch distinct words,
    not corpus tokens."""

    def _partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(t.column(text_col), " ")
        )
        vc = toks.combine_chunks().value_counts() if isinstance(
            toks, pa.ChunkedArray
        ) else toks.value_counts()
        return pa.table(
            {
                "word": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("word")
        .sum("n")
        .rename_columns({"sum(n)": "n"})
    )


def length_quantiles(
    ds: ray.data.Dataset,
    value_col: str = "n_chars",
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
) -> ray.data.Dataset:
    """EXACT order statistics of an integer column without a global sort:
    per-batch value_counts combiner → one small groupby(value) sum → the
    driver cumsums the (distinct-value, count) table and picks the
    ceil(q·n)-th smallest. Distinct-value cardinality, not corpus size,
    bounds driver memory — the pre-aggregate-instead-of-sort discipline
    (SURVEY §7.3)."""

    def _partial(t: pa.Table) -> pa.Table:
        vc = t.column(value_col).combine_chunks().value_counts()
        return pa.table(
            {
                "v": pc.cast(vc.field("values"), pa.int64()),
                "c": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    counts = (
        ds.select_columns([value_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("v")
        .sum("c")
        .rename_columns({"sum(c)": "c"})
        .sort("v")
    )
    rows = counts.take_all()
    vals = np.array([r["v"] for r in rows], dtype=np.int64)
    cum = np.cumsum([r["c"] for r in rows])
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return ray.data.from_arrow(
            pa.table({"q": pa.array([], pa.float64()),
                      "value": pa.array([], pa.int64())})
        )
    out_q, out_v = [], []
    for q in qs:
        k = max(1, int(np.ceil(q * n)))
        out_q.append(q)
        out_v.append(int(vals[np.searchsorted(cum, k)]))
    return ray.data.from_arrow(
        pa.table({"q": pa.array(out_q, pa.float64()),
                  "value": pa.array(out_v, pa.int64())})
    )


def stratified_sample(
    ds: ray.data.Dataset,
    strata_col: str,
    rates: dict[str, int],
    default_rate: int,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic per-stratum downsampling — the corpus-rebalancing
    primitive (e.g. keep 10% of the head language, 50% of the tail).

    Keeps a row iff splitmix64(id) % 100 < rate(stratum). Purely
    stateless and reproducible: the SAME rows survive at any cluster
    size, block layout, or re-run — no RNG state, no global pass.
    ``rates`` maps stratum value → percent kept; others use
    ``default_rate``."""
    from libpysal_ray.core.hashing import splitmix64

    keys = list(rates.keys())
    vals = np.array([rates[k] for k in keys] + [default_rate],
                    dtype=np.int64)
    vset = pa.array(keys, pa.string())

    def _f(t: pa.Table) -> pa.Table:
        i = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        idx = pc.index_in(t.column(strata_col), value_set=vset)
        idx_np = idx.to_numpy(zero_copy_only=False)
        idx_np = np.where(np.isnan(idx_np.astype(np.float64)), len(keys),
                          idx_np).astype(np.int64)
        rate = vals[idx_np]
        keep = (splitmix64(i.view(np.uint64)) % np.uint64(100)).astype(
            np.int64
        ) < rate
        return t.filter(pa.array(keep))

    return ds.map_batches(_f, batch_format="pyarrow")


def doc_term_stats(
    ds: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """(word, df, tf): document frequency and total term frequency per
    word — the vocabulary/quality-filter primitive behind TF-IDF.

    100 TB shape: each document is one row, so distinct (doc, word)
    pairs are BATCH-LOCAL; a per-batch vectorized combiner (Arrow split
    + dictionary-encode + one lexsort) emits per-batch (word, df, tf)
    partials and the ONE groupby(word) shuffle moves per-batch distinct
    words, not corpus tokens. No Python per row or per token."""

    def _partial(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(t.column(text_col), " ")
        flat = pc.list_flatten(lists)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        rid = np.repeat(np.arange(len(lens)), lens)
        d = flat.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((codes, rid))
        rc, cc = rid[order], codes[order]
        n = len(rc)
        if n == 0:
            return pa.table({
                "word": pa.array([], flat.type),
                "df": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
            })
        new = np.ones(n, bool)
        new[1:] = (rc[1:] != rc[:-1]) | (cc[1:] != cc[:-1])
        starts = np.flatnonzero(new)
        tf_pairs = np.diff(np.append(starts, n))     # tf per (doc, word)
        heads = cc[starts]
        o2 = np.argsort(heads, kind="stable")
        ch, tfh = heads[o2], tf_pairs[o2]
        new2 = np.ones(len(ch), bool)
        new2[1:] = ch[1:] != ch[:-1]
        s2 = np.flatnonzero(new2)
        return pa.table({
            "word": d.dictionary.take(pa.array(ch[s2])),
            "df": pa.array(np.diff(np.append(s2, len(ch))).astype(np.int64)),
            "tf": pa.array(np.add.reduceat(tfh, s2).astype(np.int64)),
        })

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("word")
        .sum(["df", "tf"])
        .rename_columns({"sum(df)": "df", "sum(tf)": "tf"})
    )


def inverted_index_digest(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> ray.data.Dataset:
    """(word, df, dxor): the posting-SET digest of an inverted index —
    df = document frequency, dxor = bit_xor of splitmix64(doc_id) over
    the word's distinct documents. The xor digest identifies the exact
    posting set (collision odds ~2^-64) without materializing list
    columns; it is order-independent and mergeable, so the global
    aggregate is ONE groupby(word) over per-batch partials (docs are
    row-local, so batch-local distinct (doc, word) pairs are globally
    distinct). The distributed path uses the engine's custom XorAgg."""
    from libpysal_ray.core.hashing import splitmix64
    from libpysal_ray.core.joins import grouped_agg

    def _partial(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(t.column(text_col), " ")
        flat = pc.list_flatten(lists)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        rid = np.repeat(np.arange(len(lens)), lens)
        d = flat.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((rid, codes))
        cc, rc = codes[order], rid[order]
        n = len(cc)
        if n == 0:
            return pa.table({
                "word": pa.array([], flat.type),
                "df": pa.array([], pa.int64()),
                "dxor": pa.array([], pa.int64()),
            })
        new = np.ones(n, bool)
        new[1:] = (cc[1:] != cc[:-1]) | (rc[1:] != rc[:-1])
        cc, rc = cc[new], rc[new]          # distinct (word, doc)
        dig = splitmix64(ids[rc].view(np.uint64)).view(np.int64)
        neww = np.ones(len(cc), bool)
        neww[1:] = cc[1:] != cc[:-1]
        starts = np.flatnonzero(neww)
        return pa.table({
            "word": d.dictionary.take(pa.array(cc[starts])),
            "df": pa.array(
                np.diff(np.append(starts, len(cc))).astype(np.int64)
            ),
            "dxor": pa.array(np.bitwise_xor.reduceat(dig, starts)),
        })

    agg = grouped_agg(
        ds.map_batches(_partial, batch_format="pyarrow"),
        ("word",),
        ("df", "dxor"),
        ("sum", "xor"),
    ).rename_columns({"sum(df)": "df", "xor(dxor)": "dxor"})
    if min_df > 1:
        agg = agg.filter(expr=f"df >= {min_df}")
    return agg


def select_top_fraction(
    ds: ray.data.Dataset,
    score_col: str,
    frac: float,
    id_col: str = "doc_id",
    max_boundary_ids: int = 5_000_000,
) -> ray.data.Dataset:
    """Corpus curation: keep EXACTLY ceil(frac·n) rows — the highest
    integer scores, ties at the boundary score broken by LOWEST id
    (deterministic at any cluster size / block layout).

    Physical plan (no global sort): the distinct-score histogram (per-
    batch value_counts combiner → one small groupby) gives the boundary
    score s* AND the exact tie count at s*; the boundary id cutoff (the
    k'-th smallest id among the ties) comes from a driver gather when
    the tie set is provably small (≤ ``max_boundary_ids``, known from
    the histogram before any pull) and otherwise from a distributed
    ``prefix_sum`` rank over ONLY the tied rows — one range sort of the
    tie stream, O(#blocks) driver partials, ONE cutoff row pulled. A
    final stateless filter keeps score > s* or (score == s* and
    id ≤ cutoff). Driver memory is bounded by distinct-score
    cardinality + min(tie count, #blocks), never corpus size — a
    coarse score (0–100 over 10^12 docs) with ~1% of the corpus tied
    at the boundary stays off the driver."""
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")

    def _partial(t: pa.Table) -> pa.Table:
        vc = t.column(score_col).combine_chunks().value_counts()
        return pa.table(
            {
                "v": pc.cast(vc.field("values"), pa.int64()),
                "c": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    rows = (
        ds.select_columns([score_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("v")
        .sum("c")
        .rename_columns({"sum(c)": "c"})
        .sort("v", descending=True)
        .take_all()
    )
    n = int(sum(r["c"] for r in rows))
    if n == 0:
        return ds
    k = max(1, int(np.ceil(frac * n)))
    cum = 0
    s_star, keep_at_star = None, 0
    for r in rows:
        if cum + r["c"] >= k:
            s_star = int(r["v"])
            keep_at_star = k - cum
            break
        cum += int(r["c"])
    if s_star is None:  # frac == 1.0 exactly
        return ds

    n_star = next(int(r["c"]) for r in rows if int(r["v"]) == s_star)

    def _at_star(t: pa.Table) -> pa.Table:
        v = t.column(score_col).to_numpy(zero_copy_only=False)
        m = v == s_star
        return pa.table(
            {"i": pa.array(
                t.column(id_col).to_numpy(zero_copy_only=False)[m]
                .astype(np.int64)
            )}
        )

    star = ds.select_columns([id_col, score_col]).map_batches(
        _at_star, batch_format="pyarrow"
    )
    # keep_at_star >= 1 always: k = max(1, ceil(frac·n)) and cum < k at
    # the breaking histogram bucket, so no "keep none at s*" leg exists
    if keep_at_star == n_star:
        # k falls exactly at the end of the s* bucket: every tied row
        # survives, no cutoff needed (and no tie-rank pass at all).
        id_cut = np.iinfo(np.int64).max
    elif n_star <= max_boundary_ids:
        # tie set provably small (exact count from the histogram):
        # one driver gather is cheaper than a distributed rank.
        star_ids = np.sort(
            np.array([r["i"] for r in star.take_all()], dtype=np.int64)
        )
        id_cut = int(star_ids[keep_at_star - 1])
    else:
        # tie set too large for the driver: rank the tied ids with the
        # distributed prefix sum (ONE range sort over only the tied
        # rows + O(#blocks) partials) and pull the single cutoff row.
        from libpysal_ray.core.scan import prefix_sum

        ranked = prefix_sum(
            star.map_batches(
                lambda t: t.append_column(
                    "one", pa.array(np.ones(t.num_rows, dtype=np.int64))
                ),
                batch_format="pyarrow",
            ),
            "i",
            "one",
            out_col="rk",
        )
        hit = ranked.filter(expr=f"rk == {keep_at_star}").take_all()
        id_cut = int(hit[0]["i"])

    def _filter(t: pa.Table) -> pa.Table:
        v = t.column(score_col).to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        keep = (v > s_star) | ((v == s_star) & (ids <= id_cut))
        return t.filter(pa.array(keep))

    return ds.map_batches(_filter, batch_format="pyarrow")


def token_budget_select(
    ds: ray.data.Dataset,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Select the most lexically diverse documents until a global token
    budget is filled — the "pick the best N-token corpus" curation step.
    Documents are ranked by distinct-token count descending (doc id
    ascending breaks ties), then kept while the running token total stays
    within ``budget``. Output (id, n_tokens, cum_tokens).

    100 TB shape: per-doc stats are one stateless pass; the global order
    is a single packed-int64 key through ``core.scan.prefix_sum`` (ONE
    range sort + an O(#blocks) driver scan of per-block partials) and the
    budget cut is a stateless filter — no driver-side data loop."""
    from libpysal_ray.core.scan import prefix_sum

    _MAXD = (1 << 22) - 1  # distinct-count field width in the packed key

    def _stats(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if len(ids) and (ids.max() >= (1 << 41) or ids.min() < 0):
            raise ValueError(
                f"{id_col} must fit 41 bits for the packed order key"
            )
        toks = pc.split_pattern(t.column(text_col), " ")
        ntok = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        K = len(enc.dictionary)
        docof = np.repeat(np.arange(len(ids), dtype=np.int64), ntok)
        uk = np.unique(docof * np.int64(max(K, 1)) + codes)
        nd = np.bincount(
            (uk // np.int64(max(K, 1))).astype(np.int64),
            minlength=len(ids),
        ).astype(np.int64)
        if len(nd) and nd.max() > _MAXD:
            raise ValueError("distinct-token count exceeds key width")
        qkey = (np.int64(_MAXD) - nd) * np.int64(1 << 41) + ids
        return pa.table({
            id_col: pa.array(ids),
            "n_tokens": pa.array(ntok),
            "qkey": pa.array(qkey),
        })

    stats = ds.map_batches(_stats, batch_format="pyarrow")
    run = prefix_sum(stats, "qkey", "n_tokens", out_col="cum_tokens",
                     inclusive=True)

    def _cut(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("cum_tokens"),
                                   pa.scalar(int(budget))))
        return t.select([id_col, "n_tokens", "cum_tokens"])

    return run.map_batches(_cut, batch_format="pyarrow")


def _source_token_totals(
    ds: ray.data.Dataset, source_col: str, text_col: str
) -> dict:
    """{source: total whitespace tokens} — the tiny per-source aggregate
    shared by domain_balance and upsample_domains (#sources rows reach
    the driver by definition)."""

    def _tok(t: pa.Table) -> pa.Table:
        spaces = pc.count_substring(t.column(text_col), " ").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return pa.table({
            source_col: t.column(source_col),
            "tok": pa.array(spaces + 1),
        })

    return {
        r[source_col]: int(r["sum(tok)"])
        for r in ds.map_batches(_tok, batch_format="pyarrow")
        .groupby(source_col)
        .sum("tok")
        .take_all()
    }


def domain_balance(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Token-weighted domain rebalancing: deterministically downsample
    every source to (about) the token mass of the SMALLEST source —
    keep-rate per source = floor(100·min_total/total_s) percent, member-
    ship by splitmix64(id) % 100. Returns the per-source manifest
    (source, rate_pct, n_docs, tok_kept, id_xor).

    100 TB shape: pass 1 is a per-batch combiner into a groupby(source)
    whose result is #sources rows (driver-safe by definition); the rates
    dict is broadcast in the filter closure; pass 2 is a stateless
    filter + the same tiny aggregate. Two scans, one all-to-all of
    #sources rows each."""
    from libpysal_ray.core.hashing import splitmix64
    from libpysal_ray.core.joins import XorAgg

    totals = _source_token_totals(ds, source_col, text_col)
    if not totals:
        return ray.data.from_arrow(pa.table({
            source_col: pa.array([], pa.large_string()),
            "rate_pct": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "tok_kept": pa.array([], pa.int64()),
            "id_xor": pa.array([], pa.int64()),
        }))
    mn = min(totals.values())
    srcs = sorted(totals)
    src_arr = pa.array(srcs, pa.large_string())
    rate_arr = np.array([(mn * 100) // totals[s] for s in srcs],
                        dtype=np.uint64)

    def _keep(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        si = pc.index_in(
            pc.cast(t.column(source_col), pa.large_string()),
            value_set=src_arr,
        ).to_numpy(zero_copy_only=False)
        rate = rate_arr[si.astype(np.int64)]
        h = splitmix64(ids.view(np.uint64))
        keep = (h % np.uint64(100)) < rate
        spaces = pc.count_substring(t.column(text_col), " ").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        mask = pa.array(keep)
        return pa.table({
            source_col: pc.cast(t.column(source_col),
                                pa.large_string()).filter(mask),
            "rate_pct": pa.array(rate[keep].astype(np.int64)),
            "tok": pa.array(spaces[keep] + 1),
            "h": pa.array(h[keep].view(np.int64)),
        })

    kept = ds.map_batches(_keep, batch_format="pyarrow")
    out = kept.groupby(source_col).aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("tok"),
        ray.data.aggregate.Max("rate_pct"),
        XorAgg("h"),
    )

    def _shape(t: pa.Table) -> pa.Table:
        return pa.table({
            source_col: t.column(source_col),
            "rate_pct": pc.cast(t.column("max(rate_pct)"), pa.int64()),
            "n_docs": pc.cast(t.column("count()"), pa.int64()),
            "tok_kept": pc.cast(t.column("sum(tok)"), pa.int64()),
            "id_xor": pc.cast(t.column("xor(h)"), pa.int64()),
        })

    return out.map_batches(_shape, batch_format="pyarrow")


def upsample_domains(
    ds: ray.data.Dataset,
    max_factor: int = 16,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Deterministic domain upsampling — the data-mix counterpart of
    ``domain_balance``: every source is REPEATED toward the largest
    source's token mass, factor_s = min(max_factor,
    ceil(max_total/total_s)) epochs. Emits one row per replica:
    (id, source, replica) with replica in [0, factor_s).

    100 TB shape: pass 1 is the tiny per-source token aggregate; pass 2
    is a stateless batch fanout (marked size-expanding for the plan
    walk) — replication happens at read time downstream, no data is
    copied here beyond the id/source columns."""
    if not (1 <= max_factor <= 64):
        raise ValueError("max_factor must be in [1, 64]")

    totals = _source_token_totals(ds, source_col, text_col)
    if not totals:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            source_col: pa.array([], pa.large_string()),
            "replica": pa.array([], pa.int64()),
        }))
    mx = max(totals.values())
    srcs = sorted(totals)
    src_arr = pa.array(srcs, pa.large_string())
    fac_arr = np.array(
        [min(max_factor, -((-mx) // totals[s])) for s in srcs],
        dtype=np.int64,
    )

    def _fan(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        si = pc.index_in(
            pc.cast(t.column(source_col), pa.large_string()),
            value_set=src_arr,
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        f = fac_arr[si]
        rep = np.repeat(np.arange(len(ids), dtype=np.int64), f)
        base = np.repeat(np.cumsum(f) - f, f)
        replica = np.arange(len(rep), dtype=np.int64) - base
        return pa.table({
            id_col: pa.array(ids[rep]),
            source_col: pc.cast(t.column(source_col),
                                pa.large_string()).take(pa.array(rep)),
            "replica": pa.array(replica),
        })

    _fan._size_expanding = True  # per-row factor fanout
    return ds.map_batches(_fan, batch_format="pyarrow")


def gopher_filter(
    ds: ray.data.Dataset,
    min_tokens: int = 30,
    max_tokens: int = 100_000,
    min_mwl: int = 3,
    max_mwl: int = 10,
    min_stop_hits: int = 1,
    max_dup_pct: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = _LANG_STOPWORDS["en"],
) -> ray.data.Dataset:
    """Gopher-style composite quality filter (Rae et al. 2021 §A1.1) in
    EXACT integer arithmetic — every rule is a cross-multiplied integer
    comparison, so the verdict is bit-reproducible and SQL-checkable:

    * token count in [min_tokens, max_tokens]
    * mean word length in [min_mwl, max_mwl]
      (min_mwl·n_tokens ≤ n_word_chars ≤ max_mwl·n_tokens)
    * ≥ min_stop_hits stopword occurrences
    * duplicate-2-gram occupancy ≤ max_dup_pct %
      (100·dup_occ ≤ max_dup_pct·n_2grams)

    Emits the integer signals plus keep ∈ {0,1}. Stateless one-pass
    map_batches — the 100 TB shape of every per-doc quality rule."""

    def _f(t: pa.Table) -> pa.Table:
        txt = t.column(text_col)
        spaces = pc.count_substring(txt, " ").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        length = pc.utf8_length(txt).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_tok = spaces + 1
        n_chars = length - spaces
        hits = np.zeros(t.num_rows, dtype=np.int64)
        for w in stopwords:
            hits += pc.count_substring(txt, f" {w} ").to_numpy(
                zero_copy_only=False
            )
        dup_occ, n2 = _dup2_occurrences(txt)
        keep = (
            (n_tok >= min_tokens)
            & (n_tok <= max_tokens)
            & (min_mwl * n_tok <= n_chars)
            & (n_chars <= max_mwl * n_tok)
            & (hits >= min_stop_hits)
            & (100 * dup_occ <= max_dup_pct * n2)
        )
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": pa.array(n_tok),
            "n_word_chars": pa.array(n_chars),
            "stop_hits": pa.array(hits),
            "dup_occ": pa.array(dup_occ),
            "n_2grams": pa.array(n2),
            "keep": pa.array(keep.astype(np.int64)),
        })

    return ds.map_batches(_f, batch_format="pyarrow")


def _minhash_topk_partial(
    t: pa.Table, id_col: str, k: int,
    value_col: str | None = None,
) -> pa.Table:
    """Per-batch min-hash top-k partial shared by ``uniform_sample`` and
    ``sample_quantiles``: keep the k rows with smallest splitmix64(id),
    keyed by the sign-flipped hash so the global int64 sort and the SQL
    oracle's unsigned sm64 order agree. Emits (hkey[, v])."""
    from libpysal_ray.core.hashing import splitmix64

    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    h = splitmix64(ids.view(np.uint64))
    v = (t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
         if value_col is not None else None)
    if len(ids) > k:
        sel = np.argpartition(h, k)[:k]
        ids, h = ids[sel], h[sel]
        if v is not None:
            v = v[sel]
    key = (h ^ np.uint64(1 << 63)).view(np.int64)
    cols = {id_col: pa.array(ids), "hkey": pa.array(key)}
    if v is not None:
        cols["v"] = pa.array(v)
    return pa.table(cols)


def uniform_sample(
    ds: ray.data.Dataset,
    k: int,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic uniform k-sample: the k ids with the SMALLEST
    splitmix64(id) — the min-hash sample. Unlike reservoir sampling it
    is order-independent and mergeable, so the sample is identical at
    any cluster size, batch layout, or re-run, and a SQL oracle can
    reproduce it exactly. Output (id, h) with h the signed hash key.

    100 TB shape: per-batch local top-k (np.partition) shrinks the
    stream to k rows per block; the global merge sorts only
    k × #blocks partial rows."""
    if k < 1:
        raise ValueError("k must be >= 1")

    part = ds.map_batches(
        lambda t: _minhash_topk_partial(t, id_col, k),
        batch_format="pyarrow",
    )
    out = part.sort("hkey").limit(k)

    def _shape(t: pa.Table) -> pa.Table:
        key = t.column("hkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        h = (key.view(np.uint64) ^ np.uint64(1 << 63)).view(np.int64)
        return pa.table({id_col: t.column(id_col), "h": pa.array(h)})

    return out.map_batches(_shape, batch_format="pyarrow")


def sample_quantiles(
    ds: ray.data.Dataset,
    value_col: str,
    qs: tuple[int, ...] = (25, 50, 75),
    k_sample: int = 100,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Approximate quantiles from the DETERMINISTIC min-hash sample: the
    k_sample rows with the smallest splitmix64(id) (see
    ``uniform_sample``), quantile q = sample value at sorted index
    floor((n-1)·q/100). Mergeable and layout-invariant, so unlike a
    streaming sketch the whole estimator is oracle-exact; the ±O(1/√k)
    statistical error is the standard sample-quantile bound. For EXACT
    corpus quantiles see ``length_quantiles``. Output (q, value).

    100 TB shape: per-batch top-k by hash (np.partition) → a k×#blocks
    global merge → one k-row driver step."""
    if not qs or any(not (0 <= q <= 100) for q in qs):
        raise ValueError("qs must be percentages in [0, 100]")

    part = ds.map_batches(
        lambda t: _minhash_topk_partial(t, id_col, k_sample,
                                        value_col=value_col),
        batch_format="pyarrow",
    )
    rows = part.sort("hkey").limit(k_sample).take_all()
    vals = np.sort(np.array([r["v"] for r in rows], dtype=np.int64))
    n = len(vals)
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "q": pa.array([], pa.int64()),
            "value": pa.array([], pa.int64()),
        }))
    out_q = np.array(sorted(qs), dtype=np.int64)
    idx = (n - 1) * out_q // 100
    return ray.data.from_arrow(pa.table({
        "q": pa.array(out_q),
        "value": pa.array(vals[idx]),
    }))


def target_affinity(
    ds: ray.data.Dataset,
    target_lang: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """DSIR-style hashed-feature importance score (the Data Selection
    via Importance Resampling pattern, arXiv:2302.03169, with an EXACT
    integer rational in place of the paper's log-likelihood ratio —
    distributed float log sums are order-dependent, integer count sums
    are not): score every document by how target-like its unigram
    feature distribution is,

        aff_num_i = Σ_{tokens w of doc i} t(w)   (target corpus count)
        aff_den_i = Σ_{tokens w of doc i} r(w)   (raw corpus count)

    where t(w) counts occurrences of w inside ``target_lang`` documents
    and r(w) over the whole corpus. aff_f = aff_num/aff_den is one
    pinned float per doc — the expected target-vs-raw frequency ratio
    under the document's own token distribution; resample/select on it
    exactly like DSIR's importance weight. Documents with no tokens
    emit no row; aff_den ≥ own length > 0 always.

    100 TB shape: the ``bigram_familiarity`` plan on unigrams — ONE
    tokenization pass emits per-doc DISTINCT token hashes with
    multiplicity (batch combiner, materialized: consumed twice), corpus
    counts are one groupby(hash) carrying BOTH sums (raw and
    target-flagged), attached back with one distributed bucket_join,
    reduced per document with segmented batch partials. Joining on the
    64-bit token hash keeps the shuffle narrow; a cross-token collision
    (~2^-64 birthday terms) would merge two counts — same declared
    caveat as bigram_familiarity. Overflow is pre-checked loudly:
    max_doc_tokens × total_tokens < 2^62."""
    from libpysal_ray.core.hashing import tokenize_hash
    from libpysal_ray.core.joins import bucket_join

    def _doctoks(t: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "wh": pa.array([], pa.int64()),
            "k": pa.array([], pa.int64()),
            "kt": pa.array([], pa.int64()),
            "dl": pa.array([], pa.int64()),
        })
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        is_t = pc.equal(
            t.column(lang_col), pa.scalar(target_lang)
        ).to_numpy(zero_copy_only=False)
        th, doc_off = tokenize_hash(t.column(text_col))
        if len(th) == 0:
            return empty
        perdoc = np.diff(doc_off)
        docof = np.repeat(np.arange(len(perdoc), dtype=np.int64), perdoc)
        u, inv = np.unique(th, return_inverse=True)
        K = np.int64(max(len(u), 1))
        key = docof * K + inv.astype(np.int64)
        uk, cnt = np.unique(key, return_counts=True)
        d_i = (uk // K).astype(np.int64)
        c_i = (uk % K).astype(np.int64)
        k = cnt.astype(np.int64)
        return pa.table({
            id_col: pa.array(ids[d_i]),
            "wh": pa.array(u[c_i].view(np.int64)),
            "k": pa.array(k),
            "kt": pa.array(np.where(is_t[d_i], k, 0).astype(np.int64)),
            # per-doc token total, for the overflow guard (repeated per
            # distinct token; Max-aggregated, never summed)
            "dl": pa.array(perdoc[d_i].astype(np.int64)),
        })

    stream = ds.map_batches(
        _doctoks, batch_format="pyarrow"
    ).materialize()  # consumed twice; Ray shares no subplans
    agg = stream.aggregate(
        ray.data.aggregate.Sum("k"), ray.data.aggregate.Max("dl")
    )
    total_toks = int(agg["sum(k)"] or 0)
    dl_max = int(agg["max(dl)"] or 0)
    # every per-doc product term k·r ≤ dl·T and their per-doc sum
    # Σ k·r ≤ dl·T as well (Σk = dl, r ≤ T) — bound it before any
    # int64 product exists anywhere
    if dl_max * total_toks >= (1 << 62):
        raise ValueError(
            "target_affinity: max_doc_tokens x total_tokens exceeds "
            "2^62; shard the corpus first"
        )
    counts = (
        stream.map_batches(
            lambda t: t.select(["wh", "k", "kt"]), batch_format="pyarrow"
        )
        .groupby("wh")
        .sum(["k", "kt"])
        .map_batches(
            lambda t: pa.table({
                "wh": t.column("wh"),
                "r": pc.cast(t.column("sum(k)"), pa.int64()),
                "tt": pc.cast(t.column("sum(kt)"), pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )
    joined = bucket_join(
        stream.map_batches(
            lambda t: t.select([id_col, "wh", "k"]),
            batch_format="pyarrow",
        ),
        counts, on="wh", num_buckets=num_buckets,
    )

    def _partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        k = t.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
        r = t.column("r").to_numpy(zero_copy_only=False).astype(np.int64)
        tt = t.column("tt").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.argsort(ids, kind="stable")
        si = ids[order]
        new = np.ones(len(si), bool)
        new[1:] = si[1:] != si[:-1]
        starts = np.flatnonzero(new)
        if len(starts) == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "num": pa.array([], pa.int64()),
                "den": pa.array([], pa.int64()),
            })
        kn, ko = (k * tt)[order], (k * r)[order]
        return pa.table({
            id_col: pa.array(si[starts]),
            "num": pa.array(np.add.reduceat(kn, starts)),
            "den": pa.array(np.add.reduceat(ko, starts)),
        })

    out = joined.map_batches(
        _partial, batch_format="pyarrow"
    ).groupby(id_col).sum(["num", "den"])

    def _shape(t: pa.Table) -> pa.Table:
        num = pc.cast(t.column("sum(num)"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        den = pc.cast(t.column("sum(den)"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table({
            id_col: t.column(id_col),
            "aff_num": pa.array(num),
            "aff_den": pa.array(den),
            "aff_f": pa.array(
                num.astype(np.float64) / den.astype(np.float64)
            ),
        })

    return out.map_batches(_shape, batch_format="pyarrow")


def group_rank(
    ds: ray.data.Dataset,
    group_col: str,
    score_col: str,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-group RANK of an integer score (SQL RANK() semantics: ties
    share rank = 1 + count of strictly-smaller scores in the group) and
    its percentile — the per-domain quality-threshold primitive of a
    curation pipeline ("keep each domain's top X%"). Output one row per
    input row: (id, group, score, rank, n_group, pct_f) with pct_f =
    rank / n_group the one pinned float.

    100 TB shape: NO global sort and NO per-group materialization — a
    per-batch (group, score) value-count combiner feeds ONE small
    groupby, the distinct-score histogram (bounded by #groups ×
    #distinct integer scores, the ``select_top_fraction`` contract —
    integer scores keep it small; raises loudly past 4M cells) turns
    into exclusive prefix sums on the driver and broadcasts once via
    ray.put; ranks then attach in one stateless per-row pass."""

    def _partial(t: pa.Table) -> pa.Table:
        sub = t.select([group_col, score_col])
        return pa.TableGroupBy(sub, [group_col, score_col]).aggregate(
            [([], "count_all")]
        ).rename_columns([group_col, score_col, "cnt"])

    hist = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby([group_col, score_col])
        .sum("cnt")
        .take_all()
    )
    if len(hist) > 4_000_000:
        raise ValueError(
            "group_rank: #groups x #distinct scores exceeds the "
            "histogram budget; bucketize the score first"
        )
    by_g: dict = {}
    for r in hist:
        by_g.setdefault(r[group_col], []).append(
            (int(r[score_col]), int(r["sum(cnt)"]))
        )
    # vectorizable broadcast state: groups indexed 0..G-1, a SORTED
    # packed (group_idx, score) key array with parallel rank/size
    # arrays — the per-batch attach is then one index_in + one
    # searchsorted, no per-row Python
    groups = sorted(by_g)
    hkeys, hranks = [], []
    sizes = np.zeros(len(groups), dtype=np.int64)
    for gi, gk in enumerate(groups):
        pairs = sorted(by_g[gk])
        c = 0
        for s, nn in pairs:
            hkeys.append((gi, s))
            hranks.append(c + 1)
            c += nn
        sizes[gi] = c
    hg = np.array([k[0] for k in hkeys], dtype=np.int64)
    hs = np.array([k[1] for k in hkeys], dtype=np.int64)
    hr = np.array(hranks, dtype=np.int64)
    smin = int(hs.min())
    K = int(hs.max()) - smin + 1
    if len(groups) * K >= (1 << 62):
        raise ValueError("group_rank: packed (group, score) key space "
                         "exceeds int64; bucketize the score first")
    hkey = hg * np.int64(K) + (hs - np.int64(smin))  # lexsorted already
    ref = ray.put((pa.array(groups), hkey, hr, sizes))

    def _attach(t: pa.Table) -> pa.Table:
        gvals, hkey_, hr_, sz = ray.get(ref)
        gi = pc.index_in(
            t.column(group_col), value_set=gvals
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        sv = t.column(score_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        # every (group, score) of the batch exists in the histogram by
        # construction; one packed-key searchsorted per batch
        pos = np.searchsorted(hkey_,
                              gi * np.int64(K) + (sv - np.int64(smin)))
        rr = hr_[pos]
        ng = sz[gi]
        return pa.table({
            id_col: t.column(id_col),
            "grp": t.column(group_col),
            "score": pa.array(sv),
            "rnk": pa.array(rr),
            "n_group": pa.array(ng),
            "pct_f": pa.array(
                rr.astype(np.float64) / ng.astype(np.float64)
            ),
        })

    return ds.map_batches(_attach, batch_format="pyarrow")


def contingency_chi2(
    ds: ray.data.Dataset,
    a_col: str,
    b_col: str,
) -> ray.data.Dataset:
    """Chi-square independence decomposition of a two-way contingency
    table (the corpus-composition test: is language independent of
    source?): one row per (a, b) cell of the OBSERVED-margin cross
    product — zero cells included, they carry the full (0 − E)² term —
    with the EXACT integer fraction of the classic statistic,

        term_ij = (n_ij·N − r_i·c_j)² / (N·r_i·c_j)

    so χ² = Σ term_f and dof = (#a−1)(#b−1) derive directly. Output
    (a, b, n_ij, r_tot, c_tot, term_num, term_den, term_f) with
    term_num/term_den decimal strings (they exceed int64 at corpus
    scale) and term_f the one pinned float per cell.

    100 TB shape: ONE groupby(a, b) count (vocab-bounded like
    :func:`group_rank`'s histogram — raises loudly past 4M cells);
    margins and terms are #cells-bounded driver work in unbounded
    ints."""
    hist = ds.groupby([a_col, b_col]).count().take_all()
    if not hist:
        raise ValueError("contingency_chi2: empty input")
    if len(hist) > 4_000_000:
        raise ValueError("contingency_chi2: too many cells; bucketize")
    counts = {(r[a_col], r[b_col]): int(r["count()"]) for r in hist}
    avals = sorted({k[0] for k in counts})
    bvals = sorted({k[1] for k in counts})
    r_tot = {a: sum(v for k, v in counts.items() if k[0] == a)
             for a in avals}
    c_tot = {b: sum(v for k, v in counts.items() if k[1] == b)
             for b in bvals}
    N = sum(counts.values())
    out_a, out_b, nij, rt, ct = [], [], [], [], []
    tn, td, tf = [], [], []
    for a in avals:
        for b in bvals:
            n = counts.get((a, b), 0)
            num = (n * N - r_tot[a] * c_tot[b]) ** 2
            den = N * r_tot[a] * c_tot[b]
            out_a.append(a)
            out_b.append(b)
            nij.append(n)
            rt.append(r_tot[a])
            ct.append(c_tot[b])
            tn.append(str(num))
            td.append(str(den))
            tf.append(float(np.float64(num) / np.float64(den)))
    return ray.data.from_arrow(pa.table({
        "a": pa.array(out_a),
        "b": pa.array(out_b),
        "n_ij": pa.array(np.array(nij, dtype=np.int64)),
        "r_tot": pa.array(np.array(rt, dtype=np.int64)),
        "c_tot": pa.array(np.array(ct, dtype=np.int64)),
        "term_num": pa.array(tn),
        "term_den": pa.array(td),
        "term_f": pa.array(np.array(tf, dtype=np.float64)),
    }))


def weighted_sample(
    ds: ray.data.Dataset,
    weight_col: str,
    pct: int,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic weight-proportional sampling — the quality-biased
    corpus downsample (keep ~pct% of rows with inclusion probability
    proportional to an integer weight, e.g. a quality score): keep row
    i iff

        splitmix64(id) % 2^32  <  w_i · K,
        K = pct · 2^32 · n // (100 · Σw)

    so P(keep) = min(1, w_i·K/2^32) ∝ w_i (clamped at 1 for heavy rows
    — the standard weighted-Bernoulli cap) and E[#kept] ≈ pct%·n for
    unclamped weights. Like :func:`stratified_sample` this is
    stateless and layout-invariant: the SAME rows survive at any
    cluster size or re-run, no RNG state. Weights must be non-negative
    integers (w = 0 never survives).

    100 TB shape: one streaming aggregate pass (n, Σw, max w) for K,
    one stateless filter pass; overflow pre-checked loudly."""
    from libpysal_ray.core.hashing import splitmix64

    if not (0 <= int(pct) <= 100):
        raise ValueError("weighted_sample: pct must be in [0, 100]")
    agg = ds.aggregate(
        ray.data.aggregate.Count(), ray.data.aggregate.Sum(weight_col),
        ray.data.aggregate.Max(weight_col),
        ray.data.aggregate.Min(weight_col),
    )
    n = int(agg["count()"])
    if n == 0:
        return ds
    sw = int(agg[f"sum({weight_col})"] or 0)
    wmax = int(agg[f"max({weight_col})"] or 0)
    if int(agg[f"min({weight_col})"] or 0) < 0:
        raise ValueError("weighted_sample: weights must be >= 0")
    if sw <= 0:
        raise ValueError("weighted_sample: weights sum to zero")
    K = int(pct) * (1 << 32) * n // (100 * sw)
    if wmax * K >= (1 << 62):
        raise ValueError("weighted_sample: w_max x K overflows int64; "
                         "rescale weights")

    def _f(t: pa.Table) -> pa.Table:
        i = t.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        h = (splitmix64(i.view(np.uint64))
             % np.uint64(1 << 32)).astype(np.int64)
        return t.filter(pa.array(h < w * np.int64(K)))

    return ds.map_batches(_f, batch_format="pyarrow")

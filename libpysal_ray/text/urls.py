"""URL canonicalization + URL-level dedup.

Training-data pipelines dedup crawls by canonical URL before any content
hashing: the same page arrives as ``http://…``, ``https://www.…/``,
``…?utm_source=…`` etc. The canonicalizer is a chain of Arrow RE2/string
kernels (zero Python per row; RE2 is also DuckDB's engine, so the oracle
mirrors each step with ``lower`` + ``regexp_replace``):

1. lowercase;
2. strip the scheme (``^https?://``);
3. strip a leading ``www.``;
4. drop query + fragment (``[?#].*$``);
5. strip one trailing ``/``.

``url_dedup`` is then the exact-dedup shape (text/dedup.exact_dedup):
ONE ``groupby(canonical)`` with min/count aggregates — survivor = lowest
doc id, ``n_dups`` = group size. The shuffle key is the canonical string;
at 100 TB swap the key for its 64-bit hash (core.hashing) exactly like
exact_dedup's digest shuffle — kept as the string here so the oracle
compares canonical forms directly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def canonicalize_urls(urls: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    u = pc.utf8_lower(urls)
    u = pc.replace_substring_regex(u, r"^https?://", "")
    u = pc.replace_substring_regex(u, r"^www\.", "")
    u = pc.replace_substring_regex(u, r"[?#].*$", "")
    u = pc.replace_substring_regex(u, r"/$", "")
    return u


def url_dedup(
    ds: ray.data.Dataset, url_col: str = "url", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(canonical_url, keep_id, n_dups): one row per canonical URL, the
    lowest id as survivor."""

    def _canon(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "canonical_url": canonicalize_urls(t.column(url_col)),
                "keep_id": t.column(id_col),
            }
        )

    g = (
        ds.map_batches(_canon, batch_format="pyarrow")
        .groupby("canonical_url")
        .aggregate(
            ray.data.aggregate.Min("keep_id"),
            ray.data.aggregate.Count("keep_id"),
        )
    )
    return g.rename_columns(
        {"min(keep_id)": "keep_id", "count(keep_id)": "n_dups"}
    )

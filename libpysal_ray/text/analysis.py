"""Text-analysis stages for large-scale training-data pipelines.

All are stateless vectorized ``map_batches`` stages over the documents
table (pyarrow.compute kernels where possible; the md5 digest uses hashlib
per row — cheap relative to I/O and embarrassingly parallel).

Ops: token counting (whitespace), quality scoring (stopword/length ratios),
language-ID (stopword-hit heuristic over ~8 languages), document
fingerprinting (Rabin-Karp rolling hash over tokens).
"""

from __future__ import annotations

import hashlib

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
_FP_MOD_MASK = np.uint64((1 << 61) - 1)


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
    """(…, fp): Rabin-Karp rolling hash over the md5 of each token —
    order-sensitive 61-bit document fingerprint."""

    def _f(t: pa.Table) -> pa.Table:
        out = np.zeros(t.num_rows, dtype=np.uint64)
        for i, s in enumerate(t.column(text_col).to_pylist()):
            h = np.uint64(0)
            for tok in s.split():
                th = np.uint64(
                    int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
                )
                h = (h * _FP_BASE + th) & _FP_MOD_MASK
            out[i] = h
        return t.append_column("fp", pa.array(out.astype(np.int64)))

    return ds.map_batches(_f, batch_format="pyarrow")


def md5_hex(ds: ray.data.Dataset, text_col: str = "text",
            out_col: str = "text_md5") -> ray.data.Dataset:
    def _f(t: pa.Table) -> pa.Table:
        hx = [hashlib.md5(s.encode()).hexdigest()
              for s in t.column(text_col).to_pylist()]
        return t.append_column(out_col, pa.array(hx))

    return ds.map_batches(_f, batch_format="pyarrow")

"""Regex redaction stage (PII scrub) — an actor-pool map_batches stage.

The training-data-pipeline scrub step: strip emails, phone numbers,
numeric identifiers (or any configured pattern list) from a text column
before the corpus feeds a tokenizer. Engine shape:

* **stateful actor pool** — patterns are validated/compiled ONCE per
  actor in ``__init__`` (the map_batches callable-class discipline), not
  per batch;
* **vectorized kernel** — each pattern applies through
  ``pyarrow.compute.replace_substring_regex`` / ``count_substring_regex``
  (RE2 over the Arrow string buffer, zero Python per row);
* RE2 is also DuckDB's regex engine, so every pattern/replacement pair is
  oracle-mirrorable as ``regexp_replace(..., 'g')`` +
  ``len(regexp_extract_all(...))``.

100 TB note: the stage is embarrassingly parallel over blocks; redaction
counts ride each row so the corpus-level tally is one cheap sum aggregate
downstream, not a second pass.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# (pattern, replacement) defaults: email, international-ish phone, long
# digit runs (ids / SSN-ish). RE2 syntax — no backrefs or lookarounds.
DEFAULT_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?\d[\d() .-]{7,}\d", "<PHONE>"),
    (r"\b\d{6,}\b", "<ID>"),
)


class RegexScrubber:
    """map_batches callable class: ``__init__`` once per actor,
    ``__call__`` per batch. Emits the input columns with ``text_col``
    replaced by the scrubbed text plus an ``n_redactions`` column."""

    def __init__(
        self,
        patterns: tuple[tuple[str, str], ...] = DEFAULT_PATTERNS,
        text_col: str = "text",
    ):
        import re

        # validate eagerly so a bad pattern fails at actor start, not
        # mid-corpus; keep the raw strings for the Arrow RE2 kernels
        for pat, _ in patterns:
            re.compile(pat)
        self.patterns = tuple(patterns)
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        txt = t.column(self.text_col)
        total = None
        for pat, rep in self.patterns:
            cnt = pc.count_substring_regex(txt, pat)
            total = cnt if total is None else pc.add(total, cnt)
            txt = pc.replace_substring_regex(txt, pat, rep)
        cols = {name: t.column(name) for name in t.schema.names}
        cols[self.text_col] = txt
        cols["n_redactions"] = pc.cast(total, pa.int64())
        return pa.table(cols)


def scrub(
    ds: ray.data.Dataset,
    patterns: tuple[tuple[str, str], ...] = DEFAULT_PATTERNS,
    text_col: str = "text",
    concurrency: tuple[int, int] | int = (2, 8),
) -> ray.data.Dataset:
    """Apply :class:`RegexScrubber` as an actor-pool stage."""
    return ds.map_batches(
        RegexScrubber,
        fn_constructor_kwargs={"patterns": patterns, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )

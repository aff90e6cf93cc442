"""RegexScrubber / word_counts / length_quantiles unit tests."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from libpysal_ray.text.analysis import length_quantiles, word_counts
from libpysal_ray.text.scrub import DEFAULT_PATTERNS, RegexScrubber, scrub


def test_scrubber_redacts_pii(ray_session):
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "contact bob.smith+spam@example.co.uk for details",
                        "call +1 (555) 123-4567 or 555 987 6543 now",
                        "account 654321 is active, pin 42 stays",
                        "nothing to redact here",
                    ]
                ),
            }
        )
    )
    out = {r["doc_id"]: r for r in scrub(docs).take_all()}
    assert out[0]["text"] == "contact <EMAIL> for details"
    assert out[0]["n_redactions"] == 1
    assert out[1]["text"] == "call <PHONE> or <PHONE> now"
    assert out[1]["n_redactions"] == 2
    assert out[2]["text"] == "account <ID> is active, pin 42 stays"
    assert out[2]["n_redactions"] == 1
    assert out[3]["text"] == "nothing to redact here"
    assert out[3]["n_redactions"] == 0


def test_scrubber_invalid_pattern_fails_fast():
    with pytest.raises(Exception):
        RegexScrubber(patterns=((r"[unclosed", "<X>"),))


def test_scrubber_sequential_patterns():
    s = RegexScrubber(patterns=((r"aa", "b"), (r"bb", "c")))
    t = pa.table({"text": pa.array(["aaaa"])})
    out = s(t)
    # aa→b twice gives "bb"; then bb→c gives "c": counts 2 + 1
    assert out.column("text").to_pylist() == ["c"]
    assert out.column("n_redactions").to_pylist() == [3]


def test_word_counts(ray_session):
    docs = ray.data.from_arrow(
        pa.table(
            {"text": pa.array(["a b a", "b a c", "c c c"])}
        )
    )
    got = {r["word"]: r["n"] for r in word_counts(docs).take_all()}
    assert got == {"a": 3, "b": 2, "c": 4}


def test_length_quantiles_exact(ray_session):
    vals = np.array([5, 1, 9, 3, 7, 2, 8, 4, 6, 10], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"n_chars": pa.array(vals)}))
    got = {r["q"]: r["value"] for r in length_quantiles(ds).take_all()}
    srt = np.sort(vals)
    for q in (0.25, 0.5, 0.75, 0.9):
        k = max(1, int(np.ceil(q * len(vals))))
        assert got[q] == srt[k - 1], q


def test_url_canonicalize_and_dedup(ray_session):
    from libpysal_ray.text.urls import canonicalize_urls, url_dedup

    raw = pa.array(
        [
            "https://Example.com/Path/",
            "http://www.example.com/path?q=1",
            "EXAMPLE.COM/path#frag",
            "https://other.org/",
        ]
    )
    assert canonicalize_urls(raw).to_pylist() == [
        "example.com/path",
        "example.com/path",
        "example.com/path",
        "other.org",
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([7, 3, 9, 1], pa.int64()), "url": raw})
    )
    got = {r["canonical_url"]: r for r in url_dedup(ds).take_all()}
    assert got["example.com/path"]["keep_id"] == 3
    assert got["example.com/path"]["n_dups"] == 3
    assert got["other.org"]["keep_id"] == 1
    assert got["other.org"]["n_dups"] == 1


def test_length_quantiles_empty_input(ray_session):
    # regression (ADVICE r3): empty input raised an opaque IndexError
    import pyarrow as pa
    import ray.data

    ds = ray.data.from_arrow(pa.table({"n_chars": pa.array([], pa.int64())}))
    out = length_quantiles(ds).take_all()
    assert out == []

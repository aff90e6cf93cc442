"""Common-Crawl-style pages table (the engine's primary input shape).

Per BASELINE.json input_hint: ``url:string, warc_ts:timestamp, html:binary,
text:string, lang:string``. No such table exists in the driver testdata, so
it is synthesized deterministically (FIXTURES.md F1) two ways:

* ``pages_from_documents(sf_dir)`` — derive pages 1:1 from the driver's
  ``documents`` table (url/warc_ts from doc_id, html from text bytes).
  Fully reproducible in the DuckDB oracle, used by correctness queries.
* ``synth_pages(n)`` — ``ray.data.range(n)`` → stateless batch synthesis at
  any scale (used by the scaling benchmark; rows never exist on the driver).

Both carry ``doc_id`` so geocoding stays integer-hash-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

WARC_EPOCH_US = 1_600_000_000_000_000  # fixed epoch (us)


def _mk_pages(t: pa.Table, text_from: str | None) -> pa.Table:
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    urls = [f"https://site{int(i) % 1000:06d}.example/{int(i):08d}" for i in ids]
    ts = pa.array(
        (ids * 1_000_000 + WARC_EPOCH_US).astype("int64"),
        pa.timestamp("us"),
    )
    if text_from is not None:
        text = t.column(text_from)
    else:
        text = pa.array([f"synthetic text for doc {int(i)} " * 8 for i in ids])
    html = pa.array(
        [("<html><body>" + s + "</body></html>").encode() for s in text.to_pylist()],
        pa.large_binary(),
    )
    lang = (
        t.column("lang")
        if "lang" in t.schema.names
        else pa.array(["en"] * len(ids))
    )
    return pa.table(
        {
            "url": pa.array(urls),
            "warc_ts": ts,
            "html": html,
            "text": text,
            "lang": lang,
            "doc_id": pa.array(ids.astype(np.int64)),
        }
    )


def pages_from_documents(sf_dir: str) -> ray.data.Dataset:
    from libpysal_ray.sources.read import read_parquet_sized

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return docs.map_batches(
        lambda t: _mk_pages(t, "text"), batch_format="pyarrow"
    )


def synth_pages(
    n: int, include_html: bool = True, num_blocks: int | None = None
) -> ray.data.Dataset:
    """n synthetic pages, generated shard-parallel with no driver data.

    ``num_blocks`` pins the shard count — scaling benchmarks must hold the
    input partitioning FIXED across cluster sizes."""

    def _mk(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["doc_id"])
        out = _mk_pages(t, None)
        if not include_html:
            out = out.drop_columns(["html"])
        return out

    kw = {"override_num_blocks": num_blocks} if num_blocks else {}
    return ray.data.range(n, **kw).map_batches(_mk, batch_format="pyarrow")

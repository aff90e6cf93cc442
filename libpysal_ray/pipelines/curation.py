"""End-to-end corpus curation: the composition a webtext training-data
run actually executes, as ONE streaming pipeline —

    length filter → exact substring dedup → per-language stratified
    downsampling → deterministic shard manifest

Every stage is integer/hash-exact (token counts, window hashes,
splitmix sampling, xor digests), so the WHOLE chain is verifiable by a
single SQL oracle — the same discipline as the individual operators,
proving composition doesn't break exactness.

100 TB shape: the length filter and sampling are stateless batch
filters; dedup is the one groupby(window-hash) pass + anti-join;
the manifest is one tiny aggregate. The narrow (id, lang) projection
is the only re-used intermediate and is vocab... corpus-row bounded
but two-column — it streams; the wide text column never crosses more
than the dedup shuffle's hash rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["curation_pipeline"]


def curation_pipeline(
    docs: ray.data.Dataset,
    min_tokens: int = 20,
    k: int = 16,
    rates: dict[str, int] | None = None,
    default_rate: int = 80,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "lang",
) -> ray.data.Dataset:
    """Returns the shard manifest (shard_id, n_docs, id_xor) of the
    curated corpus. ``rates``: percent kept per language (default:
    head language 'en' halved), others ``default_rate``."""
    from libpysal_ray.core.joins import bucket_join
    from libpysal_ray.text.analysis import stratified_sample
    from libpysal_ray.text.dedup import substring_dedup
    from libpysal_ray.text.export import shard_manifest

    if rates is None:
        rates = {"en": 50}

    def _lenfilter(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(t.column(text_col), " "))
        return t.filter(pc.greater_equal(n, pa.scalar(min_tokens)))

    filtered = docs.map_batches(_lenfilter, batch_format="pyarrow")
    # explicit batch projections: a lazy select_columns after
    # map_batches leaves bucket_join reading the pre-projection schema
    survivors = substring_dedup(
        filtered.map_batches(lambda t: t.select([id_col, text_col]),
                             batch_format="pyarrow"),
        k=k, id_col=id_col, text_col=text_col,
    )
    kept = bucket_join(
        filtered.map_batches(lambda t: t.select([id_col, strata_col]),
                             batch_format="pyarrow"),
        survivors, on=id_col, how="semi",
    )
    sampled = stratified_sample(kept, strata_col, rates, default_rate,
                                id_col=id_col)
    return shard_manifest(sampled, n_shards, id_col=id_col)

"""End-to-end curation pipeline composition."""

import numpy as np
import pyarrow as pa
import ray.data

from libpysal_ray.core.hashing import splitmix64


def test_curation_pipeline_closed_form():
    from libpysal_ray.pipelines.curation import curation_pipeline

    # 30 docs: ids 0..9 short (filtered), 10..19 long unique,
    # 20..29 exact dups of 10..19 (deduped)
    long = [" ".join(f"w{d}_{i}" for i in range(25)) for d in range(10)]
    ids = list(range(30))
    texts = (["too short"] * 10) + long + long
    langs = ["en" if i % 2 == 0 else "fr" for i in ids]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs),
    })).repartition(4)
    man = curation_pipeline(
        ds, min_tokens=20, k=16, rates={"en": 50}, default_rate=80,
        n_shards=4,
    ).to_pandas()
    # survivors = 10..19; sampled per splitmix rule
    surv = np.arange(10, 20, dtype=np.int64)
    h = splitmix64(surv.view(np.uint64))
    rate = np.where(surv % 2 == 0, 50, 80).astype(np.uint64)
    kept = surv[(h % np.uint64(100)) < rate]
    assert int(man["n_docs"].sum()) == len(kept)
    hk = splitmix64(kept.view(np.uint64))
    shard = (hk % np.uint64(4)).astype(np.int64)
    for s in sorted(set(shard)):
        row = man[man.shard_id == s]
        assert int(row["n_docs"].iloc[0]) == int((shard == s).sum())
        exp = np.bitwise_xor.reduce(hk[shard == s])
        assert int(row["id_xor"].iloc[0]) == int(exp.view(np.int64))

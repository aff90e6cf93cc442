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


def test_token_budget_select_order_and_cut():
    from libpysal_ray.text.analysis import token_budget_select

    # nd: doc1=4 distinct/4 tok, doc2=2/4, doc3=3/3
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["p q r s", "x x y y", "u v w"]),
    })).repartition(2)
    rows = sorted(
        (r["doc_id"], r["n_tokens"], r["cum_tokens"])
        for r in token_budget_select(ds, budget=7).take_all()
    )
    # order: doc1 (nd=4) cum 4, doc3 (nd=3) cum 7, doc2 (nd=2) cum 11 > 7
    assert rows == [(1, 4, 4), (3, 3, 7)]


def test_domain_balance_rates_and_manifest():
    from libpysal_ray.core.hashing import splitmix64
    from libpysal_ray.text.analysis import domain_balance

    # src a: 10 docs x 4 tokens = 40; src b: 4 docs x 5 tokens = 20
    ids = np.arange(14, dtype=np.int64)
    texts = ["t u v w"] * 10 + ["a b c d e"] * 4
    srcs = ["a"] * 10 + ["b"] * 4
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids),
        "text": pa.array(texts),
        "source": pa.array(srcs),
    })).repartition(3)
    man = {r["source"]: r for r in domain_balance(ds).take_all()}
    # rates: a -> 20*100//40 = 50, b -> 100
    h = splitmix64(ids.view(np.uint64))
    keep_a = (h[:10] % np.uint64(100)) < np.uint64(50)
    assert man["b"]["rate_pct"] == 100 and man["b"]["n_docs"] == 4
    assert man["b"]["tok_kept"] == 20
    assert man["a"]["rate_pct"] == 50
    assert man["a"]["n_docs"] == int(keep_a.sum())
    assert man["a"]["tok_kept"] == 4 * int(keep_a.sum())
    exp_xor = np.bitwise_xor.reduce(h[:10][keep_a]) if keep_a.any() else 0
    assert man["a"]["id_xor"] == int(np.uint64(exp_xor).view(np.int64))


def test_upsample_domains_factors():
    from libpysal_ray.text.analysis import upsample_domains

    # src a: 40 tokens (max); src b: 15 tokens -> factor ceil(40/15)=3
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array(["t u v w"] * 4 + ["a b c"] * 1 + []),
        "source": pa.array(["a"] * 4 + ["b"]),
    }))
    # tokens: a = 4*4 = 16... recompute: a: 4 docs x 4 = 16, b: 1 x 3 = 3
    # factor a = 1, factor b = ceil(16/3) = 6
    rows = upsample_domains(ds).take_all()
    got = {}
    for r in rows:
        got.setdefault((r["doc_id"], r["source"]), []).append(r["replica"])
    assert got[(0, "a")] == [0]
    assert sorted(got[(4, "b")]) == list(range(6))
    assert len(rows) == 4 + 6


def test_upsample_domains_cap():
    from libpysal_ray.text.analysis import upsample_domains

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["w " * 99 + "w", "x"]),  # 100 vs 1 token
        "source": pa.array(["big", "small"]),
    }))
    rows = upsample_domains(ds, max_factor=8).take_all()
    n_small = sum(1 for r in rows if r["source"] == "small")
    assert n_small == 8  # capped, not 100


def test_gopher_filter_rules():
    from libpysal_ray.text.analysis import gopher_filter

    long_ok = "the cat sat on the mat and ran to the big red barn now"
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            long_ok,                         # passes all at low bars
            "tiny doc",                      # fails min_tokens
            "a a a a a a a a a a a a",       # fails mwl + repetition
            "supercalifragilistic " * 12,    # fails max mean word len
        ]),
    }))
    got = {r["doc_id"]: r for r in gopher_filter(
        ds, min_tokens=5, min_mwl=2, min_stop_hits=1,
        max_dup_pct=50).take_all()}
    assert got[1]["keep"] == 1
    assert got[2]["keep"] == 0
    assert got[3]["keep"] == 0 and got[3]["dup_occ"] == got[3]["n_2grams"]
    assert got[4]["keep"] == 0
    assert got[1]["n_tokens"] == len(long_ok.split())


def test_uniform_sample_layout_invariant():
    from libpysal_ray.core.hashing import splitmix64
    from libpysal_ray.text.analysis import uniform_sample

    ids = np.arange(1000, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids)})
    a = sorted(r["doc_id"] for r in uniform_sample(
        ray.data.from_arrow(tbl).repartition(7), 50).take_all())
    b = sorted(r["doc_id"] for r in uniform_sample(
        ray.data.from_arrow(tbl).repartition(2), 50).take_all())
    assert a == b and len(a) == 50
    h = splitmix64(ids.view(np.uint64))
    exp = sorted(ids[np.argsort(h)[:50]].tolist())
    assert a == exp

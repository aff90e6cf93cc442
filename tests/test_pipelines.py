"""Flagship pipeline, lineage resume, text ops, ANN."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from libpysal_ray.ann.knn import ann_topk
from libpysal_ray.pipelines.flagship import flagship
from libpysal_ray.sources.pages import pages_from_documents, synth_pages
from libpysal_ray.state import lineage
from libpysal_ray.text.dedup import exact_dedup, minhash_lsh_pairs, simhash64

SF = "/root/testdata/sf0.001"


def test_flagship_smoke_and_invariant():
    out = flagship(SF).to_pandas()
    assert len(out) > 0
    assert out["digest_ok"].all()
    assert set(out.columns) == {"url", "cell", "polygon_id", "neighbor_set",
                                "digest_ok"}
    # every row has a polygon (the lonlat coverage tiles the whole plane)
    assert (out["polygon_id"] >= 0).all()


def test_flagship_checkpoint_resume(tmp_path):
    out_dir = str(tmp_path / "flag")
    r1 = flagship(SF, out_dir=out_dir).to_pandas()
    m1 = lineage.load_manifest(out_dir)
    assert len(m1) > 0
    assert sum(r["rows"] for r in m1) == len(r1)
    # resume: all partitions done → second run emits nothing new
    r2 = flagship(SF, out_dir=out_dir).to_pandas()
    assert len(r2) == 0
    m2 = lineage.load_manifest(out_dir)
    assert len(m2) == len(m1)


def test_synth_pages_deterministic():
    a = synth_pages(100).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = synth_pages(100).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (a["url"] == b["url"]).all()
    assert (a["text"] == b["text"]).all()
    assert a["html"].iloc[0].startswith(b"<html>")


def test_exact_dedup_finds_planted_dupes():
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(["aa bb", "cc dd", "aa bb", "ee", "aa bb"]),
        }
    )
    out = exact_dedup(ray.data.from_arrow(tbl)).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    got = dict(zip(out["doc_id"], out["n_dupes"]))
    assert got == {0: 3, 1: 1, 3: 1}


def test_minhash_finds_near_dupes():
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base.replace("lazy", "sleepy")
    far = "completely different content about spatial weights " * 5
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([base, near, far]),
        }
    )
    out = minhash_lsh_pairs(
        ray.data.from_arrow(tbl), jaccard_threshold=0.3
    ).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_simhash_near_dupes_close_hamming():
    words = [f"tok{i}" for i in range(100)]
    base = " ".join(words)
    near = base + " extra"
    far = " ".join(f"other{i}" for i in range(100))
    tbl = pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()),
         "text": pa.array([base, near, far])}
    )
    out = simhash64(ray.data.from_arrow(tbl)).to_pandas().sort_values("doc_id")
    h = out["simhash"].to_numpy().astype(np.uint64)

    def hamming(a, b):
        return bin(int(a) ^ int(b)).count("1")

    assert hamming(h[0], h[1]) < hamming(h[0], h[2])
    assert hamming(h[0], h[1]) <= 16  # near-dup: few bit flips


def test_ann_topk_exact():
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((50, 8))
    vecs[7] = vecs[3] * 2.0  # same direction as 3 → cosine 1
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(50, dtype=np.int64)),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float64())),
        }
    )
    out = ann_topk(ray.data.from_arrow(tbl), query_ids=[3], k=3).to_pandas()
    out = out.sort_values("rank")
    assert out.iloc[0]["neighbor_id"] == 7
    assert abs(out.iloc[0]["sim"] - 1.0) < 1e-12
    assert len(out) == 3


def test_flagship_partial_resume(tmp_path):
    """Deleting ONE done-marker re-emits exactly that partition's rows."""
    import os

    out_dir = str(tmp_path / "flagp")
    r1 = flagship(SF, out_dir=out_dir).to_pandas()
    m1 = {m["key"]: m for m in lineage.load_manifest(out_dir)}
    assert len(m1) >= 2
    victim = sorted(m1)[0]
    os.remove(os.path.join(lineage.manifest_dir(out_dir), f"{victim}.json"))
    r2 = flagship(SF, out_dir=out_dir).to_pandas()
    assert len(r2) == m1[victim]["rows"]
    # marker restored, digest-xor lineage metric identical
    m2 = {m["key"]: m for m in lineage.load_manifest(out_dir)}
    assert m2[victim]["digest_xor"] == m1[victim]["digest_xor"]
    assert len(m2) == len(m1)


def test_cross_containment_closed_form(ray_session):
    import pyarrow as pa
    import ray.data

    from libpysal_ray.text.dedup import cross_containment

    # test doc 0: "a b c d e f" -> 5-gram shingles {abcde, bcdef} (2)
    # train doc 10 contains "a b c d e" (1 of 2 shared -> 0.5)
    # train doc 11 shares nothing
    test = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0]),
        "text": pa.array(["a b c d e f"]),
    }))
    train = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 11]),
        "text": pa.array(["x y a b c d e q r s", "u v w x y z"]),
    }))
    out = cross_containment(test, train, k=5, threshold=0.5).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["test_id"], r["train_id"], r["n_shared"], r["n_test"]) == \
        (0, 10, 1, 2)


def test_select_top_fraction_exact(ray_session):
    """Exactly ceil(frac*n) rows survive; they are the rank-(score desc,
    id asc) prefix, including boundary-tie splitting."""
    from libpysal_ray.text.analysis import select_top_fraction

    rng = np.random.default_rng(2)
    n = 1000
    scores = rng.integers(0, 50, n)  # heavy ties
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "s": pa.array(scores.astype(np.int64)),
            }
        )
    )
    for frac in (0.1, 0.33, 0.5, 1.0):
        got = {int(r["doc_id"]) for r in
               select_top_fraction(ds, "s", frac).take_all()}
        k = max(1, int(np.ceil(frac * n)))
        order = sorted(range(n), key=lambda i: (-scores[i], i))
        assert got == set(order[:k]), frac


def test_select_top_fraction_massive_boundary_tie(ray_session):
    """≥50% of the corpus tied AT the cutoff score must not be gathered
    to the driver: max_boundary_ids=0 forces the distributed prefix-sum
    rank path, and the result is still the exact (score desc, id asc)
    prefix."""
    from libpysal_ray.text.analysis import select_top_fraction

    n = 4000
    scores = np.where(np.arange(n) % 2 == 0, 7, 3).astype(np.int64)
    # shuffle ids across blocks so the tie stream is layout-dependent
    rng = np.random.default_rng(11)
    ids = rng.permutation(n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "s": pa.array(scores)})
    ).repartition(8)
    # frac=0.6 → k=2400; 2000 rows score 7, so 400 of the 2000 rows
    # tied at score 3 (50% of the corpus) survive — lowest ids first.
    got = {int(r["doc_id"]) for r in
           select_top_fraction(ds, "s", 0.6, max_boundary_ids=0)
           .take_all()}
    order = sorted(range(n), key=lambda i: (-int(scores[i]), int(ids[i])))
    want = {int(ids[i]) for i in order[:2400]}
    assert got == want
    # k landing exactly on the bucket edge takes the no-cutoff path
    got_all7 = {int(r["doc_id"]) for r in
                select_top_fraction(ds, "s", 0.5, max_boundary_ids=0)
                .take_all()}
    assert got_all7 == {int(ids[i]) for i in range(n) if scores[i] == 7}

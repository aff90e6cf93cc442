"""Coverage batch 3: string-id codec, quantile bandwidth, percentile
filtration, input-order invariance (reference test strategy, SURVEY §5)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from libpysal_ray.builders.contiguity import queen
from libpysal_ray.builders.distance import kernel
from libpysal_ray.builders.lattice import lat2graph
from libpysal_ray.core.ids import DenseIdCodec, hash_ids


def _square_polys(labels):
    """3x3 unit-square lattice with arbitrary (string) labels."""
    pids, xs, ys = [], [], []
    for i, lab in enumerate(labels):
        r, c = divmod(i, 3)
        pids.append(lab)
        xs.append([c, c + 1.0, c + 1.0, c, c])
        ys.append([r, r, r + 1.0, r + 1.0, r])
    return pids, xs, ys


def test_string_ids_roundtrip_queen():
    labels = ["ca", "ny", "tx", "wa", "or", "fl", "az", "nv", "ut"]
    pids, xs, ys = _square_polys(labels)
    src = ray.data.from_arrow(
        pa.table(
            {
                "name": pa.array(pids),
                "xs": pa.array(xs, pa.list_(pa.float64())),
                "ys": pa.array(ys, pa.list_(pa.float64())),
            }
        )
    )
    codec = DenseIdCodec.from_dataset(src, "name")
    enc = codec.encode(src, "name", out_col="polygon_id").materialize()
    g = queen(enc)
    dec = codec.decode(g.canonical_edges(), ("focal", "neighbor"))
    df = dec.to_pandas()
    # center cell ("or", position 4) touches everything else
    ctr = df[df["focal"] == "or"]
    assert sorted(ctr["neighbor"]) == sorted(set(labels) - {"or"})


def test_hash_ids_stateless():
    ds = ray.data.from_arrow(
        pa.table({"url": pa.array([f"https://x{i}.com" for i in range(100)])})
    )
    out = hash_ids(ds, "url").to_pandas()
    assert out["url"].nunique() == 100  # no collisions at this scale
    out2 = hash_ids(
        ray.data.from_arrow(
            pa.table({"url": pa.array(["https://x5.com"])})
        ),
        "url",
    ).to_pandas()
    assert out2["url"].iloc[0] in set(out["url"])


def test_kernel_quantile_bandwidth():
    rng = np.random.default_rng(7)
    n = 60
    pts = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(np.arange(n, dtype=np.int64)),
                "x": pa.array(rng.uniform(0, 100, n)),
                "y": pa.array(rng.uniform(0, 100, n)),
            }
        )
    ).materialize()
    g = kernel(pts, k=3, bandwidth="quantile", fixed=True,
               function="triangular")
    df = g.edges.to_pandas()
    # weights bounded, self-loops present at weight 1 (z=0 → 1-0)
    real = df[~((df.focal == df.neighbor) & (df.weight == 0.0))]
    selfw = real[real.focal == real.neighbor]
    assert np.allclose(selfw["weight"], 1.0)
    assert (real["weight"] >= 0).all() and (real["weight"] <= 1).all()


def test_describe_percentile_filtration():
    g = lat2graph(5, 5, rook=True)
    ids = np.arange(25)
    vals = ids.astype(np.float64)
    full = g.describe(ids, vals, stats=("count", "mean")).to_pandas()
    filt = g.describe(ids, vals, stats=("count", "mean"),
                      q=(25.0, 75.0)).to_pandas()
    assert (filt.set_index("focal")["count"]
            <= full.set_index("focal")["count"]).all()
    # center node 12: neighbors 7,11,13,17 → 25-75 pct band keeps 11,13
    c = filt.set_index("focal").loc[12]
    assert c["count"] == 2.0 and c["mean"] == 12.0


def test_input_order_invariance():
    """Builders produce identical canonical edges for shuffled input."""
    labels = list(range(9))
    pids, xs, ys = _square_polys(labels)
    t = pa.table(
        {
            "polygon_id": pa.array(pids, pa.int64()),
            "xs": pa.array(xs, pa.list_(pa.float64())),
            "ys": pa.array(ys, pa.list_(pa.float64())),
        }
    )
    perm = np.random.default_rng(3).permutation(9)
    t_shuf = t.take(pa.array(perm))
    a = queen(ray.data.from_arrow(t)).to_pandas()
    b = queen(ray.data.from_arrow(t_shuf)).to_pandas()
    assert a.equals(b)


def test_issubgraph_equals():
    r = lat2graph(4, 4, rook=True)
    q = lat2graph(4, 4, rook=False)
    assert r.issubgraph(q)
    assert not q.issubgraph(r)
    assert r.equals(lat2graph(4, 4, rook=True))
    assert not r.equals(q)
    assert not r.equals(r.transform("R"))


def test_dist_quantile_distributed_exact():
    """_dist_quantile == np.quantile bit-for-bit, including with a hot
    duplicate bin that forces the histogram refinement loop."""
    import ray.data as rd

    from libpysal_ray.builders.distance import _dist_quantile

    rng = np.random.default_rng(21)
    d = np.concatenate(
        [rng.uniform(0.0, 100.0, 5000), np.full(3000, 42.0)]
    )
    rng.shuffle(d)
    ds = rd.from_arrow(pa.table({"dist": pa.array(d)})).repartition(8)
    for q in (0.25, 0.5, 0.9):
        assert _dist_quantile(ds, q, max_pull=512) == np.quantile(d, q)


def test_rep_stats_closed_form():
    from libpysal_ray.text.analysis import rep_stats

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "a b a b a",      # 2-grams: ab ba ab ba → all dup → 1.0
                    "x y z w",        # 3 distinct 2-grams → 0.0
                    "solo",           # no 2-grams
                ]
            ),
        }
    )
    out = {r["doc_id"]: r for r in
           rep_stats(ray.data.from_arrow(t)).take_all()}
    assert out[0]["n_2grams"] == 4 and out[0]["dup_frac"] == 1.0
    assert out[1]["n_2grams"] == 3 and out[1]["dup_frac"] == 0.0
    assert out[2]["n_2grams"] == 0 and out[2]["dup_frac"] == 0.0

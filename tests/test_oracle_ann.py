"""Pins for the fixed-seed-constant oracles (pipelines/oracle_ann.py).

No Ray needed: these verify the numpy-evaluation-order claims the SQL
mirrors rely on, and that the embedded constants equal the operators'.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from libpysal_ray.pipelines import oracle_ann as oa


def test_planes_literals_roundtrip():
    """repr-emitted double literals parse back to the identical IEEE
    double (DuckDB's decimal parser is correctly rounded, like float())."""
    rng = np.random.default_rng(oa.LSH_SEED)
    planes = rng.standard_normal((oa.DIM, oa.N_PLANES))
    for v in planes.ravel()[:64]:
        assert float(repr(float(v))) == v


def test_std64_matches_numpy_pairwise():
    """The written-out 8-accumulator sum == np.std for 64 dyadic pixels."""
    rng = np.random.default_rng(3)
    for _ in range(500):
        m = rng.integers(0, 1 << 24, 64).astype(np.float64)
        a = m / (1 << 24)
        mean = a.sum() / 64.0
        s = (a - mean) * (a - mean)
        r = list(s[:8])
        for i in range(8, 64, 8):
            for j in range(8):
                r[j] = r[j] + s[i + j]
        tot = ((r[0] + r[1]) + (r[2] + r[3])) + (
            (r[4] + r[5]) + (r[6] + r[7])
        )
        assert np.sqrt(tot / 64.0) == a.std()


def test_p95_matches_numpy_lerp():
    """b - (b-a)*(1-g) (numpy's t>=0.5 lerp branch) == np.percentile."""
    rng = np.random.default_rng(4)
    vi = (95.0 / 100.0) * 63.0
    g = vi - np.floor(vi)
    assert g >= 0.5  # the branch the SQL hard-codes
    for _ in range(500):
        a = rng.integers(0, 1 << 24, 64).astype(np.float64) / (1 << 24)
        sv = np.sort(a)
        assert sv[60] - (sv[60] - sv[59]) * (1.0 - g) == np.percentile(a, 95)


def test_fake_pixel_values_are_dyadic():
    """Every fake-codec pixel is m/2^24 exactly, float32-representable —
    the premise of the exact-sum f_mean claim."""
    from libpysal_ray.multimodal.stages import _noise

    v = _noise(1000, 7)
    scaled = v.astype(np.float64) * (1 << 24)
    assert (scaled == np.round(scaled)).all()
    assert (scaled >= 0).all() and (scaled < (1 << 24)).all()


def test_assign_to_centroids_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from libpysal_ray.ann.knn import assign_to_centroids

    rng = np.random.default_rng(9)
    n, d = 200, 16
    m = rng.normal(size=(n, d))
    t = pa.table({
        "vec_id": pa.array(np.arange(n)),
        "embedding": pa.array(m.tolist(), pa.list_(pa.float64())),
    })
    out = assign_to_centroids(
        ray.data.from_arrow(t).repartition(4), range(6)
    ).to_pandas().sort_values("vec_id")
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn[:6].T
    want = np.argmax(sims, axis=1)
    assert (out["centroid_id"].to_numpy() == want).all()


def test_semdedup_bruteforce(ray_session):
    """semdedup == the direct per-cluster definition on random vectors:
    assign to nearest centroid, drop any vector with a lower-id
    cluster-mate at cosine >= threshold."""
    from libpysal_ray.ann.knn import semdedup

    rng = np.random.default_rng(5)
    n, d, th = 300, 8, 0.9
    base = rng.normal(0, 1, (40, d))
    V = base[rng.integers(0, 40, n)] + rng.normal(0, 0.05, (n, d))
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    [list(map(float, v)) for v in V],
                    pa.list_(pa.float64()),
                ),
            }
        )
    )
    got = {
        int(r["vec_id"]): (int(r["centroid_id"]), bool(r["keep"]))
        for r in semdedup(emb, range(6), threshold=th).take_all()
    }
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = Vn[:6]
    assign = np.argmax(Vn @ C.T, axis=1)
    for i in range(n):
        cmates = [j for j in range(i) if assign[j] == assign[i]]
        dup = any(float(Vn[i] @ Vn[j]) >= th for j in cmates)
        assert got[i] == (int(assign[i]), not dup), i
    assert len(got) == n


def test_emb_clusters_planted(ray_session):
    import numpy as np

    from libpysal_ray.ann.knn import emb_clusters

    vecs = ([[1.0, 0.01 * i, 0.0] for i in range(3)]
            + [[0.01 * i, 1.0, 0.0] for i in range(3)]
            + [[0.577, 0.577, 0.577]])
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(list(range(7)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    })).repartition(2)
    out = {r["vec_id"]: r["cluster"]
           for r in emb_clusters(ds, 0.95).take_all()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3, 6: 6}

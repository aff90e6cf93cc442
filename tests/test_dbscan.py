"""dbscan_embeddings vs a brute-force dense DBSCAN reference."""

import numpy as np
import pyarrow as pa
import ray.data

from libpysal_ray.ann.knn import dbscan_embeddings


def _brute(vecs, threshold, min_pts):
    n = len(vecs)
    v = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sim = v @ v.T
    adj = (sim >= threshold) & ~np.eye(n, dtype=bool)
    core = adj.sum(1) + 1 >= min_pts
    # components of the core-core graph, min-id labels
    lab = {i: i for i in range(n) if core[i]}
    changed = True
    while changed:
        changed = False
        for i in range(n):
            if not core[i]:
                continue
            for j in range(n):
                if core[j] and adj[i, j] and lab[j] < lab[i]:
                    lab[i] = lab[j]
                    changed = True
    out = {}
    for i in range(n):
        if core[i]:
            out[i] = (lab[i], "core")
        else:
            nb = [lab[j] for j in range(n) if core[j] and adj[i, j]]
            out[i] = (min(nb), "border") if nb else (-1, "noise")
    return out


def _ds(vecs):
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              pa.list_(pa.float32())),
    })).repartition(3)


def test_dbscan_matches_brute(ray_session):
    rng = np.random.default_rng(4)
    # three blobs + scattered noise in 8-d
    centers = rng.normal(size=(3, 8)) * 4
    vecs = np.concatenate([
        centers[i] + rng.normal(size=(12, 8)) * 0.3 for i in range(3)
    ] + [rng.normal(size=(6, 8)) * 4])
    got = {r["vec_id"]: (r["cluster"], r["role"])
           for r in dbscan_embeddings(
               _ds(vecs), threshold=0.9, min_pts=4).take_all()}
    want = _brute(vecs, 0.9, 4)
    assert got == want
    roles = {v[1] for v in got.values()}
    assert {"core", "noise"} <= roles  # the fixture has both


def test_dbscan_all_noise_and_all_core(ray_session):
    # orthogonal-ish vectors -> all noise
    vecs = np.eye(6, 8)
    got = dbscan_embeddings(_ds(vecs), threshold=0.5, min_pts=2).take_all()
    assert all(r["cluster"] == -1 and r["role"] == "noise" for r in got)
    # identical direction -> one cluster, all core
    vecs = np.tile(np.arange(1, 9, dtype=float), (5, 1)) * np.arange(
        1, 6)[:, None]
    got = dbscan_embeddings(_ds(vecs), threshold=0.99, min_pts=3).take_all()
    assert all(r["cluster"] == 0 and r["role"] == "core" for r in got)


def test_dbscan_border_min_label(ray_session):
    # 1-d chain: two tight pairs sharing one middle point; min_pts=3 makes
    # the pair members core only when they have 2 closed-nbhd neighbors
    base = np.array([1.0, 0.0])
    rot = lambda a: np.array([np.cos(a), np.sin(a)])  # noqa: E731
    # angles: cluster A at 0, 0.05 rad; cluster B at 1.0, 1.05 rad;
    # border point at 0.1+0.45 = mid? keep simple: point at 0.10 rad sees
    # both A members (cos(0.10), cos(0.05) >= thr) but is not core itself
    thr = np.cos(0.12)
    vecs = np.stack([
        rot(0.0), rot(0.05), rot(0.10),  # A core pair + candidate
        rot(1.0), rot(1.05), rot(1.10),  # B
    ])
    got = {r["vec_id"]: (r["cluster"], r["role"])
           for r in dbscan_embeddings(
               _ds(vecs), threshold=thr, min_pts=3).take_all()}
    want = _brute(vecs, thr, 3)
    assert got == want

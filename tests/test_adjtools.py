"""adjlist_apply / adjlist_map (reference weights/adjtools.py:6-226)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from libpysal_ray.builders.lattice import lat2graph
from libpysal_ray.core.adjtools import adjlist_apply, adjlist_map


@pytest.fixture(scope="module")
def rook5(ray_session):
    return lat2graph(5, 5, rook=True)


def _edge_frame(ds) -> pd.DataFrame:
    return ds.to_pandas().sort_values(["focal", "neighbor"]).reset_index(
        drop=True
    )


def test_adjlist_apply_subtract_numpy(rook5):
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 50, 25).astype(np.float64)
    out = _edge_frame(
        adjlist_apply(rook5, np.arange(25), vals, func=np.subtract)
    )
    want = vals[out["focal"].to_numpy()] - vals[out["neighbor"].to_numpy()]
    assert np.array_equal(out["subtract"].to_numpy(), want)
    assert np.array_equal(
        out["att_focal"].to_numpy(), vals[out["focal"].to_numpy()]
    )


def test_adjlist_apply_custom_and_dataset(rook5, ray_session):
    import pyarrow as pa
    import ray.data

    vals = (np.arange(25) % 7).astype(np.float64)
    attrs = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(25, dtype=np.int64)),
        "value": pa.array(vals),
    }))
    out = _edge_frame(
        adjlist_apply(rook5, attrs, func=lambda x, y: x < y, name="lt")
    )
    want = vals[out["focal"].to_numpy()] < vals[out["neighbor"].to_numpy()]
    assert np.array_equal(out["lt"].to_numpy(), want)


def test_adjlist_apply_multivariate(rook5):
    rng = np.random.default_rng(9)
    X = rng.normal(size=(25, 3))

    def sqdist(a, b):
        return ((a - b) ** 2).sum(-1)

    out = _edge_frame(
        adjlist_apply(rook5, np.arange(25), X, func=sqdist)
    )
    want = ((X[out["focal"].to_numpy()] -
             X[out["neighbor"].to_numpy()]) ** 2).sum(-1)
    assert np.allclose(out["sqdist"].to_numpy(), want)


def test_adjlist_map(rook5):
    rng = np.random.default_rng(11)
    X = rng.integers(0, 9, (25, 2)).astype(np.float64)
    out = _edge_frame(
        adjlist_map(rook5, np.arange(25), X,
                    funcs=(np.subtract, np.add), names=["a", "b"])
    )
    f, nb = out["focal"].to_numpy(), out["neighbor"].to_numpy()
    assert np.array_equal(out["subtract_a"].to_numpy(),
                          X[f, 0] - X[nb, 0])
    assert np.array_equal(out["add_b"].to_numpy(), X[f, 1] + X[nb, 1])


def test_adjlist_map_func_count_mismatch(rook5):
    with pytest.raises(ValueError, match="functions"):
        adjlist_map(rook5, np.arange(25), np.zeros((25, 3)),
                    funcs=(np.subtract, np.add))


def test_filter_adjlist(ray_session):
    """One row per unordered pair; forward orientation preferred; min
    weight among kept-orientation duplicates; one-sided reversed rows
    survive re-oriented; self-loops collapse to one row."""
    from libpysal_ray.core import edges as E
    from libpysal_ray.core.adjtools import filter_adjlist

    f = np.array([0, 1, 0, 5, 3, 7, 7], np.int64)
    n = np.array([1, 0, 1, 2, 3, 6, 6], np.int64)
    w = np.array([2.0, 9.0, 4.0, 1.0, 5.0, 8.0, 3.0])
    ds = ray.data.from_arrow(E.edge_table(f, n, w))
    got = {(int(r["focal"]), int(r["neighbor"])): r["weight"]
           for r in filter_adjlist(ds).take_all()}
    assert got == {
        (0, 1): 2.0,   # fwd dup: min(2, 4); reversed (1,0) dropped
        (5, 2): 1.0,   # only the reversed row exists -> kept as-is
        (3, 3): 5.0,   # self-loop kept once
        (7, 6): 3.0,   # only reversed, dup: min(8, 3), orientation kept
    }


def test_adjlist_dataset_plus_values_raises(ray_session, rook5):
    """Code-review r5: Dataset attrs + numpy values together would
    silently ignore the values — must raise."""
    g = rook5
    attrs = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(25, dtype=np.int64)),
        "value": pa.array(np.arange(25, dtype=np.int64)),
    }))
    from libpysal_ray.core.adjtools import adjlist_apply, adjlist_map
    with pytest.raises(ValueError, match="not both|got both"):
        adjlist_apply(g, attrs, np.arange(25, dtype=np.float64))
    with pytest.raises(ValueError, match="numpy ids"):
        adjlist_map(g, attrs, np.ones((25, 2)))


def test_adjlist_mv_missing_id_raises(ray_session, rook5):
    """Multivariate lookup validates the id universe loudly."""
    g = rook5
    from libpysal_ray.core.adjtools import adjlist_apply
    ids = np.arange(24, dtype=np.int64)  # node 24 missing
    vals = np.ones((24, 2))
    with pytest.raises(Exception, match="missing from attr_ids"):
        adjlist_apply(
            g, ids, vals, func=lambda a, b: (a - b).sum(axis=1)
        ).take_all()

"""Temporal operators: as-of join, range-count join, tumbling windows."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from libpysal_ray.temporal.joins import (
    _composite,
    asof_join,
    range_count_join,
    tumbling_window,
)


def _mk(cols):
    return ray.data.from_arrow(
        pa.table({k: pa.array(v) for k, v in cols.items()})
    )


def test_asof_join_matches_bruteforce(ray_session):
    rng = np.random.default_rng(4)
    n_l, n_r = 200, 60
    lk = rng.integers(0, 8, n_l).astype(np.int64)
    lt = rng.integers(0, 10_000, n_l).astype(np.int64)
    rk = rng.integers(0, 8, n_r).astype(np.int64)
    rt = rng.integers(0, 10_000, n_r).astype(np.int64)
    rv = np.arange(100, 100 + n_r, dtype=np.int64)
    left = _mk({"id": np.arange(n_l, dtype=np.int64), "k": lk, "t": lt})
    right = _mk({"k2": rk, "t2": rt, "v": rv})
    got = {
        r["left_id"]: (r["right_val"], r["asof_ts"])
        for r in asof_join(
            left, right, key="k", right_key="k2", left_ts="t",
            right_ts="t2", left_id="id", right_val="v",
        ).take_all()
    }
    for i in range(n_l):
        cand = [(rt[j], rv[j]) for j in range(n_r)
                if rk[j] == lk[i] and rt[j] <= lt[i]]
        if not cand:
            assert i not in got
        else:
            best = max(cand)  # (max ts, then max val) — the pinned tie rule
            assert got[i] == (best[1], best[0]), i


def test_range_count_join_matches_bruteforce(ray_session):
    rng = np.random.default_rng(9)
    n_l, n_r = 150, 80
    lk = rng.integers(0, 5, n_l).astype(np.int64)
    lt = rng.integers(0, 5_000, n_l).astype(np.int64)
    rk = rng.integers(0, 5, n_r).astype(np.int64)
    rt = rng.integers(0, 5_000, n_r).astype(np.int64)
    left = _mk({"id": np.arange(n_l, dtype=np.int64), "k": lk, "t": lt})
    right = _mk({"k2": rk, "t2": rt})
    lo, hi = -500, 100
    got = {
        r["left_id"]: r["n_in_range"]
        for r in range_count_join(
            left, right, key="k", right_key="k2", left_ts="t",
            right_ts="t2", left_id="id",
            lo_offset_us=lo, hi_offset_us=hi,
        ).take_all()
    }
    assert len(got) == n_l  # zero-match rows kept
    for i in range(n_l):
        want = sum(
            1 for j in range(n_r)
            if rk[j] == lk[i] and lt[i] + lo <= rt[j] <= lt[i] + hi
        )
        assert got[i] == want, i


def test_tumbling_window_exact_cents(ray_session):
    k = np.array([1, 1, 1, 2, 2], dtype=np.int64)
    t = np.array([100, 150, 3700, 100, 200], dtype=np.int64) * 1_000_000
    v = np.array([1.25, 2.50, 0.75, 10.00, 0.01])
    ds = _mk({"user": k, "ts": t, "value": v})
    got = {
        (r["key"], r["window"]): (r["n_events"], r["sum_cents"])
        for r in tumbling_window(
            ds, ts_col="ts", key_col="user", window_us=3_600_000_000,
            value_col="value",
        ).take_all()
    }
    assert got[(1, 0)] == (2, 375)
    assert got[(1, 1)] == (1, 75)
    assert got[(2, 0)] == (2, 1001)


def test_composite_overflow_guard():
    with pytest.raises(ValueError, match="pack range"):
        _composite(np.array([1], np.int64),
                   np.array([1 << 60], np.int64), ts_bits=52)
    with pytest.raises(ValueError, match="key range"):
        _composite(np.array([1 << 12], np.int64),
                   np.array([0], np.int64), ts_bits=52)


def test_asof_epoch_timestamps_many_keys_one_bucket(ray_session):
    # regression: epoch-microsecond timestamps (~51 bits raw) with >2^11
    # distinct keys in a single bucket overflowed the int64 composite
    # before per-bucket ts densification — exactly what the coalesced
    # small-input path produces (every key in ONE bucket)
    import numpy as np
    import pyarrow as pa
    import ray.data

    n_keys = 5000
    base = 1_704_067_200_000_000  # 2024-01-01 in us
    k = np.arange(n_keys, dtype=np.int64)
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(k),
        "lts": pa.array(base + k * 7919),
        "lid": pa.array(k),
    })).materialize()
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(k),
        "rts": pa.array(base + k * 7919 - 13),
        "rv": pa.array(k * 10),
    })).materialize()
    from libpysal_ray.temporal.joins import asof_join

    out = asof_join(left, right, key="k", left_ts="lts", right_ts="rts",
                    left_id="lid", right_val="rv").to_pandas()
    assert len(out) == n_keys
    out = out.sort_values("left_id").reset_index(drop=True)
    assert (out["right_val"].to_numpy() == k * 10).all()
    # asof_ts is reported in ORIGINAL epoch units, not bucket-shifted
    assert (out["asof_ts"].to_numpy() == base + k * 7919 - 13).all()


def test_sessionize_closed_form(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from libpysal_ray.temporal.joins import sessionize

    # user 1: events at 0s, 5s, 1000s, 1005s -> sessions 0,0,1,1 (gap 600s)
    # user 2: events at 0s, 700s -> sessions 0,1
    t = pa.table({
        "eid": pa.array([0, 1, 2, 3, 4, 5]),
        "u": pa.array([1, 1, 1, 1, 2, 2]),
        "ts": pa.array(
            np.array([0, 5, 1000, 1005, 0, 700], np.int64) * 1_000_000
        ),
    })
    out = sessionize(ray.data.from_arrow(t).repartition(3), "u", "ts",
                     gap_us=600_000_000, id_col="eid").to_pandas()
    got = out.sort_values("id")["session"].to_numpy()
    assert (got == [0, 0, 1, 1, 0, 1]).all()


def test_tumbling_window_value_cents_col(ray_session):
    # regression (ADVICE r3): value_cents_col was accepted but never read
    k = np.array([1, 1, 2], dtype=np.int64)
    t = np.array([100, 150, 100], dtype=np.int64) * 1_000_000
    c = np.array([125, 250, 1000], dtype=np.int64)
    ds = _mk({"user": k, "ts": t, "cents": c})
    got = {
        (r["key"], r["window"]): (r["n_events"], r["sum_cents"])
        for r in tumbling_window(
            ds, ts_col="ts", key_col="user", window_us=3_600_000_000,
            value_cents_col="cents",
        ).take_all()
    }
    assert got[(1, 0)] == (2, 375)
    assert got[(2, 0)] == (1, 1000)
    with pytest.raises(ValueError, match="not both"):
        tumbling_window(ds, ts_col="ts", key_col="user",
                        window_us=1, value_cents_col="cents",
                        value_col="cents")


def test_hopping_window_closed_form():
    from libpysal_ray.temporal.joins import hopping_window

    # window 10, hop 5: event at t=12 -> windows 1,2; t=4 -> 0 and -1
    ds = ray.data.from_arrow(pa.table({
        "ts": pa.array([12, 4, 7], pa.int64()),
        "uid": pa.array([1, 1, 1], pa.int64()),
        "cents": pa.array([100, 10, 1], pa.int64()),
    }))
    got = {(r["key"], r["window"]): (r["n_events"], r["sum_cents"])
           for r in hopping_window(ds, "ts", "uid", 10, 5,
                                   value_cents_col="cents").take_all()}
    assert got == {
        (1, -1): (1, 10),          # t=4 in [-5,5)
        (1, 0): (2, 11),           # t=4,7 in [0,10)
        (1, 1): (2, 101),          # t=7,12 in [5,15)
        (1, 2): (1, 100),          # t=12 in [10,20)
    }


def test_hopping_window_validates():
    from libpysal_ray.temporal.joins import hopping_window

    ds = ray.data.from_arrow(pa.table({
        "ts": pa.array([1], pa.int64()),
        "uid": pa.array([1], pa.int64()),
    }))
    with pytest.raises(ValueError):
        hopping_window(ds, "ts", "uid", 5, 10)


def test_per_key_running_closed_form():
    from libpysal_ray.temporal.joins import per_key_running

    ds = ray.data.from_arrow(pa.table({
        "ts": pa.array([5, 1, 3, 2, 4], pa.int64()),
        "uid": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "eid": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "cents": pa.array([100, 10, 1, 7, 3], pa.int64()),
    })).repartition(3)
    got = {r["id"]: (r["seq"], r["run_cents"]) for r in per_key_running(
        ds, "uid", "ts", "eid", value_cents_col="cents").take_all()}
    # uid1 by ts: 11(10), 12(1), 10(100); uid2: 13(7), 14(3)
    assert got == {11: (0, 10), 12: (1, 11), 10: (2, 111),
                   13: (0, 7), 14: (1, 10)}


def test_window_sums_exact_above_2e53():
    from libpysal_ray.temporal.joins import hopping_window, tumbling_window

    big = 1 << 53
    ds = ray.data.from_arrow(pa.table({
        "ts": pa.array([1, 2, 3], pa.int64()),
        "uid": pa.array([7, 7, 7], pa.int64()),
        "cents": pa.array([big, 1, 1], pa.int64()),
    }))
    t = tumbling_window(ds, "ts", "uid", 100,
                        value_cents_col="cents").take_all()
    assert t[0]["sum_cents"] == big + 2
    h = hopping_window(ds, "ts", "uid", 100, 100,
                       value_cents_col="cents").take_all()
    assert h[0]["sum_cents"] == big + 2

"""Property-based tests (hypothesis) over the exactness-critical pure
kernels: the primitives every oracle-exact pipeline bottoms out in.
Driver-side only (no Ray session needed) — fast enough for the default
suite."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from libpysal_ray.builders.matching import (
    _auction_assignment,
    _collinear_param,
    _min_cost_transport,
)
from libpysal_ray.core.hashing import (
    hash_string_array_u64,
    hash_strings_u64,
    splitmix64,
)
from libpysal_ray.spatial.stats import _prod_sum_exact


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=40), min_size=0, max_size=20),
       st.integers(0, 2**31))
def test_vectorized_string_hash_layout_invariant(strs, seed):
    """hash_string_array_u64 depends only on string VALUES: identical
    results for plain, sliced-offset, chunk-combined, and large_string
    layouts of the same data (the property every distributed dedup /
    grouping key needs), and per-row independence (each row's hash is
    unchanged by its neighbors)."""
    import pyarrow as pa

    base = hash_string_array_u64(pa.array(strs, pa.string()), seed)
    # offset slice of a padded array
    padded = pa.array(["zzz", "q"] + strs, pa.string()).slice(2)
    assert np.array_equal(hash_string_array_u64(padded, seed), base)
    # chunked
    if len(strs) > 1:
        ch = pa.chunked_array([
            pa.array(strs[:1], pa.string()),
            pa.array(strs[1:], pa.string()),
        ])
        assert np.array_equal(hash_string_array_u64(ch, seed), base)
    # large_string layout
    ls = pa.array(strs, pa.large_string())
    assert np.array_equal(hash_string_array_u64(ls, seed), base)
    # per-row independence: single-row hash equals in-batch hash
    for i, s in enumerate(strs[:3]):
        one = hash_string_array_u64(pa.array([s], pa.string()), seed)
        assert one[0] == base[i]
    # the per-byte loop hash stays deterministic too (different mix by
    # design — it keys a disjoint value space)
    assert np.array_equal(hash_strings_u64(strs, seed),
                          hash_strings_u64(list(strs), seed))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-(2**61), 2**61), min_size=0, max_size=60),
       st.lists(st.integers(-(2**61), 2**61), min_size=0, max_size=60))
def test_prod_sum_exact_vs_python_ints(a, b):
    """The 128-bit limb product sum equals unbounded Python arithmetic
    for any int64 inputs (the wide-ESDA regime's foundation)."""
    n = min(len(a), len(b))
    av = np.array(a[:n], dtype=np.int64)
    bv = np.array(b[:n], dtype=np.int64)
    want = sum(int(x) * int(y) for x, y in zip(av.tolist(), bv.tolist()))
    assert _prod_sum_exact(av, bv) == want


@settings(max_examples=25, deadline=None)
@given(st.integers(2, 7), st.integers(0, 3), st.data())
def test_auction_vs_ssp_optimum(nt, extra, data):
    """ε-scaling auction and the SSP flow agree on the exact optimum for
    arbitrary non-negative integer cost matrices (square and
    rectangular)."""
    ns = nt + extra
    flat = data.draw(st.lists(st.integers(0, 500),
                              min_size=nt * ns, max_size=nt * ns))
    c = np.array(flat, dtype=np.int64).reshape(nt, ns)
    a = _auction_assignment(c)
    assert len(np.unique(a)) == nt
    f = _min_cost_transport(c.astype(np.float64), 1, 1)
    ti, sj = np.nonzero(f)
    assert c[np.arange(nt), a].sum() == c[ti, sj].sum()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(-(2**20), 2**20), min_size=2, max_size=15),
       st.data())
def test_collinear_sorted_pairing_is_optimal(xs, data):
    """On provably collinear dyadic inputs, pairing by sorted parameter
    reaches the sorted-coordinate closed-form optimum Σ|xᵢ−y_σ(i)| —
    regardless of the internal direction vector's sign (both sets share
    the same t, so a common reversal pairs identically)."""
    n = len(xs)
    ys = data.draw(st.lists(st.integers(-(2**20), 2**20),
                            min_size=n, max_size=n))
    xp = np.array([[float(v), 2.0 * v] for v in xs])
    yp = np.array([[float(v), 2.0 * v] for v in ys])
    res = _collinear_param(xp, yp)
    assert res is not None
    tx, ty = res
    xi = np.argsort(tx, kind="stable")
    yi = np.argsort(ty, kind="stable")
    got = sum(abs(xs[a] - ys[b]) for a, b in zip(xi, yi))
    want = int(np.abs(np.sort(np.array(xs)) - np.sort(np.array(ys))).sum())
    assert got == want


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=50))
def test_splitmix64_matches_scalar_spec(vals):
    """Vectorized splitmix64 equals the public scalar specification."""
    def scalar(x):
        z = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return z ^ (z >> 31)

    arr = np.array(vals, dtype=np.uint64)
    got = splitmix64(arr)
    assert [int(v) for v in got] == [scalar(v) for v in vals]

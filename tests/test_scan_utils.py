import numpy as np
import jax.numpy as jnp

from rakau_tpu import scan_utils as su


def test_clz(rng):
    vals = np.concatenate([[0, 1, 2, 3, 2 ** 31, 2 ** 32 - 1],
                           rng.integers(0, 2 ** 32, 100)]).astype(np.uint64)
    got = np.asarray(su.clz32(jnp.asarray(vals, jnp.uint32)))
    want = [32 - int(v).bit_length() for v in vals]
    np.testing.assert_array_equal(got, want)


def test_clz64_pair(rng):
    vals = rng.integers(0, 2 ** 63, 200, dtype=np.uint64)
    vals[:3] = [0, 1, 2 ** 63 - 1]
    hi = jnp.asarray(vals >> np.uint64(32), jnp.uint32)
    lo = jnp.asarray(vals & np.uint64(0xFFFFFFFF), jnp.uint32)
    got = np.asarray(su.clz64_pair(hi, lo))
    want = [64 - int(v).bit_length() for v in vals]
    np.testing.assert_array_equal(got, want)


def test_dd_cumsum_precision(rng):
    # big head value then many tiny: plain fp32 cumsum loses the tiny
    # segment sums, dd keeps them.
    v = np.concatenate([[1e6], rng.uniform(0.1, 1.0, 10000)]).astype(
        np.float32)
    hi, lo = su.dd_cumsum(jnp.asarray(v))
    begin = jnp.asarray([5000], jnp.int32)
    end = jnp.asarray([5064], jnp.int32)
    got = float(su.segment_sum_from_prefix(hi, lo, begin, end)[0])
    want = v[5000:5064].astype(np.float64).sum()
    assert abs(got - want) / want < 1e-6
    # plain fp32 prefix would give huge error here
    plain = np.cumsum(v.astype(np.float32))
    plain_seg = plain[5063] - plain[4999]
    assert abs(plain_seg - want) / want > 1e-4  # demonstrates the problem


def test_segment_sum_edges():
    v = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    hi, lo = su.dd_cumsum(v)
    b = jnp.asarray([0, 1, 2, 0], jnp.int32)
    e = jnp.asarray([4, 1, 3, 1], jnp.int32)
    got = np.asarray(su.segment_sum_from_prefix(hi, lo, b, e))
    np.testing.assert_allclose(got, [10.0, 0.0, 3.0, 1.0], rtol=1e-6)


def test_searchsorted_rows(rng):
    a = np.sort(rng.integers(0, 1000, (8, 33)), axis=1)
    v = rng.integers(-5, 1010, (8, 17))
    got = np.asarray(su.searchsorted_rows(jnp.asarray(a, jnp.int32),
                                          jnp.asarray(v, jnp.int32)))
    want = np.stack([np.searchsorted(a[i], v[i], side="left")
                     for i in range(8)])
    np.testing.assert_array_equal(got, want)


def test_searchsorted_1d(rng):
    a = np.sort(rng.integers(0, 1000, 100))
    v = rng.integers(-5, 1010, (3, 7))
    got = np.asarray(su.searchsorted_1d(jnp.asarray(a, jnp.int32),
                                        jnp.asarray(v, jnp.int32)))
    want = np.searchsorted(a, v, side="left")
    np.testing.assert_array_equal(got, want)


def test_compact_indices(rng):
    mask = rng.uniform(size=(5, 40)) < 0.3
    idx, cnt = su.compact_indices(jnp.asarray(mask), cap=16)
    idx = np.asarray(idx)
    cnt = np.asarray(cnt)
    for r in range(5):
        want = np.nonzero(mask[r])[0]
        k = min(len(want), 16)
        assert cnt[r] == len(want)
        np.testing.assert_array_equal(idx[r][:k], want[:k])
        assert np.all(idx[r][k:] == 40)

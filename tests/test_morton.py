import numpy as np
import jax.numpy as jnp
import pytest

from rakau_tpu import morton


@pytest.mark.parametrize("ndim,depth", [(3, 21), (3, 10), (2, 31), (2, 16)])
def test_encode_matches_numpy_reference(ndim, depth, rng):
    n = 4096
    cells = rng.integers(0, 2 ** depth, size=(n, ndim), dtype=np.uint64)
    hi, lo = morton.encode(jnp.asarray(cells, dtype=jnp.uint32), ndim, depth)
    got = morton.to_uint64_np(hi, lo)
    want = morton.encode_np(cells, ndim, depth)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ndim,depth", [(3, 21), (2, 31)])
def test_decode_roundtrip(ndim, depth, rng):
    n = 2048
    cells = rng.integers(0, 2 ** depth, size=(n, ndim), dtype=np.uint64)
    hi, lo = morton.encode(jnp.asarray(cells, dtype=jnp.uint32), ndim, depth)
    back = morton.decode(hi, lo, ndim, depth)
    np.testing.assert_array_equal(np.asarray(back), cells.astype(np.uint32))


def test_encode_preserves_order_locality():
    # Same cell -> same code; differing top-level octant -> differing prefix.
    c = jnp.asarray([[0, 0, 0], [0, 0, 0], [2 ** 20, 0, 0]], dtype=jnp.uint32)
    hi, lo = morton.encode(c, 3, 21)
    assert hi[0] == hi[1] and lo[0] == lo[1]
    # cell x >= 2^20 sets the top interleaved bit (position 62 for x=dim0)
    full = morton.to_uint64_np(hi, lo)
    assert full[2] >> np.uint64(62) == 1


def test_pair_shift_consistency(rng):
    hi = jnp.asarray(rng.integers(0, 2 ** 32, 256, dtype=np.uint64),
                     dtype=jnp.uint32)
    lo = jnp.asarray(rng.integers(0, 2 ** 32, 256, dtype=np.uint64),
                     dtype=jnp.uint32)
    full = morton.to_uint64_np(hi, lo)
    for s in [0, 1, 5, 31, 32, 33, 47, 63]:
        shi, slo = morton.pair_shr(hi, lo, s)
        got = morton.to_uint64_np(shi, slo)
        np.testing.assert_array_equal(got, full >> np.uint64(s), err_msg=f"s={s}")
    for s in [0, 1, 2]:
        shi, slo = morton.pair_shl(hi, lo, s)
        got = morton.to_uint64_np(shi, slo)
        np.testing.assert_array_equal(
            got, (full << np.uint64(s)) & np.uint64(2 ** 64 - 1),
            err_msg=f"s={s}")

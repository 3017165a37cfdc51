import numpy as np
import pytest

from rakau_tpu import native, morton
from rakau_tpu.direct import direct_acc_pot_np


pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="native toolchain unavailable")


def test_native_morton_matches_python(rng):
    for ndim, depth in [(3, 21), (2, 31)]:
        cells = rng.integers(0, 2 ** depth, size=(2048, ndim),
                             dtype=np.uint64).astype(np.uint32)
        got = native.morton_encode(cells, ndim, depth)
        want = morton.encode_np(cells, ndim, depth)
        np.testing.assert_array_equal(got, want)
        back = native.morton_decode(got, ndim, depth)
        np.testing.assert_array_equal(back, cells)


def test_native_radix_argsort(rng):
    keys = rng.integers(0, 2 ** 63, size=10000, dtype=np.uint64)
    perm = native.radix_argsort(keys)
    np.testing.assert_array_equal(keys[perm], np.sort(keys))
    # stability: equal keys keep original order
    keys2 = np.repeat(rng.integers(0, 100, 50, dtype=np.uint64), 20)
    p2 = native.radix_argsort(keys2)
    sorted_k = keys2[p2]
    for v in np.unique(keys2):
        idx = p2[sorted_k == v]
        assert np.all(np.diff(idx) > 0)


def test_native_oracle_matches_numpy(rng):
    n = 400
    pos = rng.standard_normal((n, 3))
    mass = rng.uniform(0.1, 1.0, n)
    a1, p1 = native.direct_acc_pot(pos, mass, eps=0.02, G=2.0)
    a2, p2 = direct_acc_pot_np(pos, mass, eps=0.02, G=2.0)
    np.testing.assert_allclose(a1, a2, rtol=1e-12)
    np.testing.assert_allclose(p1, p2, rtol=1e-12)


def test_native_oracle_targets_subset(rng):
    n = 300
    pos = rng.standard_normal((n, 2))
    mass = rng.uniform(0.1, 1.0, n)
    targets = np.array([0, 5, 299], dtype=np.int64)
    a1, p1 = native.direct_acc_pot(pos, mass, targets=targets)
    a2, p2 = direct_acc_pot_np(pos, mass, targets=targets)
    np.testing.assert_allclose(a1, a2, rtol=1e-12)
    np.testing.assert_allclose(p1, p2, rtol=1e-12)

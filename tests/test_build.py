import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rakau_tpu import build, morton, particles
from rakau_tpu.config import TreeConfig



# Compile-bound integration tests (r4 test-fast pass: the whole
# not-slow suite measured ~54 min on the 1-core CI box, almost all
# XLA compile time). Full coverage runs under `make test`;
# tests/test_fast_smoke.py keeps a per-mode end-to-end net in fast.
import pytest

pytestmark = pytest.mark.slow


def np_tree_invariants(td, cfg, pos, mass):
    """Host-side invariant checks of a TreeData against raw inputs."""
    n = pos.shape[0]
    n_nodes = int(td.n_nodes)
    assert not bool(td.overflow)
    assert 1 <= n_nodes <= td.node_mass.shape[0]

    # Morton order: sorted codes ascending.
    codes = morton.to_uint64_np(td.code_hi, td.code_lo)
    assert np.all(codes[:-1] <= codes[1:])

    # perm is a permutation; sorted arrays match gather.
    perm = np.asarray(td.perm)
    assert sorted(perm.tolist()) == list(range(n))
    np.testing.assert_array_equal(np.asarray(td.pos), pos[perm])
    np.testing.assert_array_equal(np.asarray(td.mass), mass[perm])
    inv = np.asarray(td.inv_perm)
    np.testing.assert_array_equal(inv[perm], np.arange(n))

    mass_s = mass[perm]
    pos_s = pos[perm]

    begin = np.asarray(td.node_begin)[:n_nodes]
    end = np.asarray(td.node_end)[:n_nodes]
    level = np.asarray(td.node_level)[:n_nodes]
    is_leaf = np.asarray(td.node_is_leaf)[:n_nodes]
    cb = np.asarray(td.node_child_begin)[:n_nodes]
    cc = np.asarray(td.node_child_count)[:n_nodes]
    nm = np.asarray(td.node_mass)[:n_nodes]
    com = np.asarray(td.node_com)[:n_nodes]

    # Root spans everything.
    assert begin[0] == 0 and end[0] == n and level[0] == 0

    # Tiles partition [0, n) in order with <= ncrit particles each.
    n_tiles = int(td.n_tiles)
    tb = np.asarray(td.tile_begin)[:n_tiles]
    tc = np.asarray(td.tile_cnt)[:n_tiles]
    assert tb[0] == 0
    assert np.all(tc[:n_tiles] >= 1) and np.all(tc <= cfg.ncrit)
    np.testing.assert_array_equal(tb[1:], tb[:-1] + tc[:-1])
    assert tb[-1] + tc[-1] == n

    for j in range(n_nodes):
        assert 0 <= begin[j] < end[j] <= n, j
        cnt = end[j] - begin[j]
        seg_m = mass_s[begin[j]:end[j]]
        np.testing.assert_allclose(nm[j], seg_m.sum(), rtol=1e-5)
        want_com = (seg_m[:, None] * pos_s[begin[j]:end[j]]).sum(0) / seg_m.sum()
        np.testing.assert_allclose(com[j], want_com, rtol=1e-4, atol=1e-5)
        if is_leaf[j]:
            assert cnt <= cfg.max_leaf_n or level[j] == cfg.max_depth
        else:
            assert cnt > cfg.max_leaf_n
            assert 1 <= cc[j] <= 2 ** cfg.ndim
            # children partition the parent range, contiguous slots
            kids = range(cb[j], cb[j] + cc[j])
            kb = [begin[k] for k in kids]
            ke = [end[k] for k in kids]
            assert kb[0] == begin[j] and ke[-1] == end[j]
            for a in range(len(kids) - 1):
                assert ke[a] == kb[a + 1]
            for k in kids:
                assert level[k] == level[j] + 1


@pytest.mark.parametrize("dist", ["uniform", "plummer"])
@pytest.mark.parametrize("ndim", [2, 3])
def test_build_invariants(dist, ndim, rng):
    n = 3000
    key = jax.random.PRNGKey(1)
    if dist == "uniform":
        pos, mass = particles.uniform_cube(key, n, ndim=ndim)
    else:
        pos, mass = particles.plummer(key, n, ndim=ndim)
    cfg = TreeConfig(ndim=ndim, max_leaf_n=16)
    td = build.build_tree(pos, mass, cfg)
    np_tree_invariants(td, cfg, np.asarray(pos), np.asarray(mass))


def test_build_jit_and_small_depth(rng):
    n = 2000
    pos, mass = particles.uniform_cube(jax.random.PRNGKey(2), n)
    cfg = TreeConfig(max_depth=8, max_leaf_n=32)
    f = jax.jit(build.build_tree, static_argnames=("cfg",))
    td = f(pos, mass, cfg)
    np_tree_invariants(td, cfg, np.asarray(pos), np.asarray(mass))


def test_single_particle_and_tiny():
    pos = jnp.asarray([[0.1, 0.2, 0.3]], jnp.float32)
    mass = jnp.asarray([2.0], jnp.float32)
    cfg = TreeConfig()
    td = build.build_tree(pos, mass, cfg)
    assert int(td.n_nodes) == 1
    assert bool(td.node_is_leaf[0])
    np.testing.assert_allclose(np.asarray(td.node_com[0]),
                               [0.1, 0.2, 0.3], rtol=1e-6)


def test_coincident_particles():
    # All particles in one cell: chain of single-child nodes to max_depth.
    pos = jnp.zeros((100, 3), jnp.float32) + 0.125
    mass = jnp.ones(100, jnp.float32)
    cfg = TreeConfig(max_depth=6, max_leaf_n=10)
    td = build.build_tree(pos, mass, cfg, box_size=1.0)
    n_nodes = int(td.n_nodes)
    assert n_nodes == 7  # root + one node per level 1..6
    assert bool(td.node_is_leaf[n_nodes - 1])
    assert int(td.node_end[n_nodes - 1]) - int(td.node_begin[n_nodes - 1]) == 100


def test_overflow_flag():
    n = 4096
    pos, mass = particles.uniform_cube(jax.random.PRNGKey(3), n)
    cfg = TreeConfig(max_leaf_n=1, node_cap=64)
    td = build.build_tree(pos, mass, cfg)
    assert bool(td.overflow)


def test_quadrupole_moments(rng):
    n = 1000
    pos, mass = particles.plummer(jax.random.PRNGKey(4), n)
    cfg = TreeConfig(multipole_order=2, max_leaf_n=32, farfield="m2p")
    td = build.build_tree(pos, mass, cfg)
    n_nodes = int(td.n_nodes)
    pos_s = np.asarray(td.pos)
    mass_s = np.asarray(td.mass)
    quad = np.asarray(td.node_quad)
    com = np.asarray(td.node_com)
    for j in [0, 1, n_nodes - 1]:
        b, e = int(td.node_begin[j]), int(td.node_end[j])
        d = pos_s[b:e] - com[j]
        want = []
        for a in range(3):
            for bb in range(a, 3):
                want.append((mass_s[b:e] * d[:, a] * d[:, bb]).sum())
        np.testing.assert_allclose(quad[j], want, rtol=1e-3, atol=1e-6)

"""Incremental Morton re-sort (SURVEY C11 / BASELINE config #3).

The near-sorted blockwise re-sort must be EXACTLY a sort (verified
in-graph, with full-sort fallback) — never an approximation — and the
Morton-order-maintaining leapfrog must match the plain per-step-rebuild
leapfrog trajectory."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rakau_tpu import build, integrate, particles
from rakau_tpu.config import TreeConfig



# Compile-bound integration tests (r4 test-fast pass: the whole
# not-slow suite measured ~54 min on the 1-core CI box, almost all
# XLA compile time). Full coverage runs under `make test`;
# tests/test_fast_smoke.py keeps a per-mode end-to-end net in fast.
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _codes(n, rng):
    hi = rng.integers(0, 1 << 20, size=n).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    return hi, lo


def _check_sorted_equal(hi, lo, payload, block):
    out_ref = build.sort_by_code(jnp.asarray(hi), jnp.asarray(lo),
                                 jnp.asarray(payload))
    out_ns = build.sort_near_sorted(jnp.asarray(hi), jnp.asarray(lo),
                                    jnp.asarray(payload), block=block)
    np.testing.assert_array_equal(np.asarray(out_ref[0]),
                                  np.asarray(out_ns[0]))
    np.testing.assert_array_equal(np.asarray(out_ref[1]),
                                  np.asarray(out_ns[1]))
    # keys sorted lexicographically
    k = (np.asarray(out_ns[0]).astype(np.uint64) << np.uint64(32)) \
        | np.asarray(out_ns[1]).astype(np.uint64)
    assert (np.diff(k.astype(np.int64 if k.max() < 2**63 else np.uint64))
            >= 0).all() if k.size > 1 else True
    # the permutation payload is a valid permutation
    perm = np.sort(np.asarray(out_ns[2]))
    np.testing.assert_array_equal(perm, np.arange(len(hi)))


def test_near_sorted_small_displacement(rng):
    """Displacements < block/2: blocked passes alone must sort."""
    n, block = 40_000, 1024
    hi = np.sort(_codes(n, rng)[0])
    lo = rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    # small local shuffle (displacement <= 100)
    idx = np.arange(n) + rng.integers(-100, 100, size=n)
    order = np.argsort(idx, kind="stable")
    hi, lo = hi[order], lo[order]
    _check_sorted_equal(hi, lo, rng.standard_normal(n).astype(np.float32),
                        block)


def test_near_sorted_fallback_random(rng):
    """Fully random input: the verification must trip and the fallback
    full sort must produce the exact sorted keys."""
    n, block = 30_000, 1024
    hi, lo = _codes(n, rng)
    _check_sorted_equal(hi, lo, rng.standard_normal(n).astype(np.float32),
                        block)


def test_near_sorted_tail_and_ties(rng):
    """n not divisible by block, heavy key ties: still exactly sorted."""
    n, block = 10_000 + 777, 512
    hi = np.sort(rng.integers(0, 50, size=n).astype(np.uint32))
    lo = np.zeros(n, np.uint32)
    idx = np.arange(n) + rng.integers(-40, 40, size=n)
    order = np.argsort(idx, kind="stable")
    _check_sorted_equal(hi[order], lo[order],
                        rng.standard_normal(n).astype(np.float32), block)


def test_build_tree_near_sorted_matches_full(rng):
    """build_tree(near_sorted=True) on a near-Morton-ordered input gives
    a query-identical tree to the full-sort build."""
    from rakau_tpu import engine
    cfg = TreeConfig(max_depth=10, max_leaf_n=16, ncrit=64, tile_chunk=16)
    n = 16384
    pos, mass = particles.plummer(jax.random.PRNGKey(3), n)
    td = build.build_tree(pos, mass, cfg)
    # nudge the Morton-ordered positions slightly (a leapfrog-step-sized
    # perturbation), then rebuild both ways from that near-sorted input
    key = jax.random.PRNGKey(4)
    pos2 = td.pos + 1e-4 * jax.random.normal(key, td.pos.shape)
    td_f = build.build_tree(pos2, td.mass, cfg, box_size=td.box_size)
    td_n = build.build_tree(pos2, td.mass, cfg, box_size=td.box_size,
                            near_sorted=True)
    np.testing.assert_array_equal(np.asarray(td_f.code_hi),
                                  np.asarray(td_n.code_hi))
    np.testing.assert_array_equal(np.asarray(td_f.code_lo),
                                  np.asarray(td_n.code_lo))
    theta = jnp.float32(0.6)
    a_f, p_f, _ = engine.acc_pot_u(td_f, cfg, theta, jnp.float32(0.01))
    a_n, p_n, _ = engine.acc_pot_u(td_n, cfg, theta, jnp.float32(0.01))
    inv_f, inv_n = np.asarray(td_f.inv_perm), np.asarray(td_n.inv_perm)
    np.testing.assert_allclose(np.asarray(a_f)[inv_f],
                               np.asarray(a_n)[inv_n], rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_f)[inv_f],
                               np.asarray(p_n)[inv_n], rtol=2e-4)


def test_leapfrog_morton_matches_plain():
    """leapfrog_step_morton (near-sorted rebuilds, state kept in Morton
    order) tracks the plain per-step-rebuild leapfrog trajectory."""
    cfg = TreeConfig(max_depth=8, max_leaf_n=16, ncrit=64, tile_chunk=16)
    n = 4096
    pos, mass = particles.plummer(jax.random.PRNGKey(9), n)
    vel = jnp.zeros_like(pos)
    dt = jnp.float32(1e-3)
    theta, eps = jnp.float32(0.6), jnp.float32(0.02)
    box = 64.0

    s_plain = integrate.NBodyState(pos, vel, mass)
    s_m = integrate.NBodyState(pos, vel, mass)
    perm_total = np.arange(n)
    for _ in range(3):
        s_plain, _ = integrate.leapfrog_step(s_plain, dt, cfg, theta,
                                             eps, box_size=box)
        s_m, _, sp, _rf = integrate.leapfrog_step_morton(
            s_m, dt, cfg, theta, eps, box_size=box)
        perm_total = perm_total[np.asarray(sp)]
    inv = np.argsort(perm_total)
    np.testing.assert_allclose(np.asarray(s_m.pos)[inv],
                               np.asarray(s_plain.pos), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_m.vel)[inv],
                               np.asarray(s_plain.vel), rtol=2e-3,
                               atol=1e-5)

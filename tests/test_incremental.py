"""Update-path rebuild semantics (SURVEY C11).

The r1-r4 near-sorted blockwise re-sort was measured refuted at device
scale (r4: its in-graph verification failed on every leapfrog step of
both workloads, so both paths full-sorted) and deleted in r5
(build.sort_by_code docstring). What remains under test is the update
CONTRACT: rebuild-from-updated-positions equals build-from-scratch, and
the Morton-order-maintaining leapfrog tracks the plain per-step-rebuild
trajectory with correct permutation composition."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rakau_tpu import build, engine, integrate, particles
from rakau_tpu.config import TreeConfig

pytestmark = pytest.mark.slow


def test_update_rebuild_matches_scratch():
    """Rebuilding from nudged Morton-ordered positions must equal a
    from-scratch build of the same point set (codes and physics)."""
    cfg = TreeConfig(max_depth=10, max_leaf_n=16, ncrit=64, tile_chunk=16)
    n = 16384
    pos, mass = particles.plummer(jax.random.PRNGKey(3), n)
    td = build.build_tree(pos, mass, cfg)
    key = jax.random.PRNGKey(4)
    pos2 = td.pos + 1e-4 * jax.random.normal(key, td.pos.shape)
    td_a = build.build_tree(pos2, td.mass, cfg, box_size=td.box_size)
    # same particles presented in a scrambled order
    scramble = jax.random.permutation(jax.random.PRNGKey(5), n)
    td_b = build.build_tree(pos2[scramble], td.mass[scramble], cfg,
                            box_size=td.box_size)
    np.testing.assert_array_equal(np.asarray(td_a.code_hi),
                                  np.asarray(td_b.code_hi))
    np.testing.assert_array_equal(np.asarray(td_a.code_lo),
                                  np.asarray(td_b.code_lo))
    theta = jnp.float32(0.6)
    a_a, p_a, _ = engine.acc_pot_u(td_a, cfg, theta, jnp.float32(0.01))
    a_b, p_b, _ = engine.acc_pot_u(td_b, cfg, theta, jnp.float32(0.01))
    inv_a, inv_b = np.asarray(td_a.inv_perm), np.asarray(td_b.inv_perm)
    # map both to pos2 order: td_b's input order is the scrambled one,
    # so its ordered view lands at slots `scramble`
    sc = np.asarray(scramble)
    b_in_pos2 = np.empty_like(np.asarray(a_b))
    b_in_pos2[sc] = np.asarray(a_b)[inv_b]
    np.testing.assert_allclose(np.asarray(a_a)[inv_a], b_in_pos2,
                               rtol=2e-4, atol=1e-6)
    pb_in_pos2 = np.empty_like(np.asarray(p_b))
    pb_in_pos2[sc] = np.asarray(p_b)[inv_b]
    np.testing.assert_allclose(np.asarray(p_a)[inv_a], pb_in_pos2,
                               rtol=2e-4)


def test_leapfrog_morton_matches_plain():
    """leapfrog_step_morton (state kept in Morton order across steps)
    tracks the plain per-step-rebuild leapfrog trajectory, with the
    step permutations composing back to input order."""
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
        s_m, _, sp = integrate.leapfrog_step_morton(
            s_m, dt, cfg, theta, eps, box_size=box)
        perm_total = perm_total[np.asarray(sp)]
    inv = np.argsort(perm_total)
    np.testing.assert_allclose(np.asarray(s_m.pos)[inv],
                               np.asarray(s_plain.pos), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_m.vel)[inv],
                               np.asarray(s_plain.vel), rtol=2e-3,
                               atol=1e-5)

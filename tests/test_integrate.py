import numpy as np
import jax
import jax.numpy as jnp

from rakau_tpu import particles
from rakau_tpu.config import TreeConfig
from rakau_tpu import integrate


CFG = TreeConfig(max_depth=8, max_leaf_n=16, ncrit=64, tile_chunk=16)



# Compile-bound integration tests (r4 test-fast pass: the whole
# not-slow suite measured ~54 min on the 1-core CI box, almost all
# XLA compile time). Full coverage runs under `make test`;
# tests/test_fast_smoke.py keeps a per-mode end-to-end net in fast.
import pytest

pytestmark = pytest.mark.slow


def make_plummer_equilibrium(n=1024, seed=23):
    """Plummer positions with isotropic velocity dispersion ~ virial."""
    key = jax.random.PRNGKey(seed)
    pos, mass = particles.plummer(key, n)
    # crude equilibrium-ish velocities: sigma^2 ~ GM / (6 sqrt(r^2 + 1))
    r = jnp.linalg.norm(pos, axis=1)
    sigma = jnp.sqrt(1.0 / (6.0 * jnp.sqrt(r ** 2 + 1.0)))
    vel = sigma[:, None] * jax.random.normal(jax.random.PRNGKey(seed + 1),
                                             pos.shape)
    return integrate.NBodyState(pos.astype(jnp.float32),
                                vel.astype(jnp.float32), mass)


def test_leapfrog_energy_drift():
    state = make_plummer_equilibrium()
    eps = 0.05
    dt = 1e-3
    e0 = float(integrate.exact_total_energy(state, eps=eps))
    for _ in range(20):
        state, ovf = integrate.leapfrog_step(state, dt, CFG, 0.4, eps,
                                             box_size=64.0)
    assert not bool(np.asarray(ovf).any())
    e1 = float(integrate.exact_total_energy(state, eps=eps))
    drift = abs(e1 - e0) / abs(e0)
    assert drift < 2e-3, drift


def test_leapfrog_safe_step_retries_overflow():
    """The retry driver (VERDICT r4 item 7): undersized caps must be
    grown until the step runs clean — never a truncated-force step —
    and the result must match a straight step at ample caps."""
    state = make_plummer_equilibrium(n=512)
    small = CFG.with_(m2p_cap=64, p2p_src_cap=256, p2p_leaf_cap=64)
    new, ovf, perm, grown_cfg, n_retries = \
        integrate.leapfrog_step_morton_host_safe(
            state, 1e-3, small, jnp.float32(0.6), jnp.float32(0.05),
            box_size=64.0)
    assert not bool(np.asarray(ovf).any())
    assert n_retries >= 1
    assert (grown_cfg.m2p_cap > small.m2p_cap
            or grown_cfg.p2p_src_cap > small.p2p_src_cap
            or grown_cfg.p2p_leaf_cap > small.p2p_leaf_cap)
    ref, ovf_r, perm_r = integrate.leapfrog_step_morton_host(
        state, 1e-3, grown_cfg, jnp.float32(0.6), jnp.float32(0.05),
        box_size=64.0)
    assert not bool(np.asarray(ovf_r).any())
    np.testing.assert_allclose(np.asarray(new.pos), np.asarray(ref.pos),
                               rtol=1e-6, atol=1e-7)


def test_leapfrog_reversibility():
    # KDK is time-reversible: step forward then backward returns start.
    state = make_plummer_equilibrium(n=512)
    eps = 0.05
    s1, _ = integrate.leapfrog_step(state, 1e-3, CFG, 0.4, eps,
                                    box_size=64.0)
    s2, _ = integrate.leapfrog_step(s1, -1e-3, CFG, 0.4, eps,
                                    box_size=64.0)
    np.testing.assert_allclose(np.asarray(s2.pos), np.asarray(state.pos),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.vel), np.asarray(state.vel),
                               atol=1e-4)


def test_acc_pot_input_order():
    # integrate.acc_pot returns results in input order.
    key = jax.random.PRNGKey(3)
    pos, mass = particles.plummer(key, 512)
    from rakau_tpu import direct
    acc, pot, ovf = integrate.acc_pot(pos, mass, CFG, 0.2, 0.01)
    acc_d, pot_d = direct.direct_acc_pot(pos, mass, eps=0.01)
    from .helpers import rel_vec_err, rms
    assert rms(rel_vec_err(np.asarray(acc), np.asarray(acc_d))) < 2e-3

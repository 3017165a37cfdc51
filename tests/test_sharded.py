"""Multi-chip tests on the 8-virtual-CPU-device mesh (conftest), covering
what the single-process reference never could: shard-count invariance
(SURVEY.md §5 implication)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rakau_tpu import build, engine, particles
from rakau_tpu.config import TreeConfig
from rakau_tpu.parallel import sharded
from rakau_tpu import integrate


CFG = TreeConfig(max_depth=8, max_leaf_n=16, ncrit=64, tile_chunk=8)



# Compile-bound integration tests (r4 test-fast pass: the whole
# not-slow suite measured ~54 min on the 1-core CI box, almost all
# XLA compile time). Full coverage runs under `make test`;
# tests/test_fast_smoke.py keeps a per-mode end-to-end net in fast.
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def cloud():
    pos, mass = particles.plummer(jax.random.PRNGKey(31), 2048)
    return pos, mass


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_shard_count_invariance(cloud, ndev):
    pos, mass = cloud
    td = build.build_tree(pos, mass, CFG)
    acc_1, pot_1, ovf_1 = engine.acc_pot_u(td, CFG, 0.5, 0.01)
    mesh = sharded.default_mesh(ndev)
    acc_n, pot_n, ovf_n = sharded.acc_pot_u_sharded(
        td, CFG, 0.5, 0.01, 1.0, mesh)
    assert not bool(np.asarray(ovf_n).any())
    # identical work partition, only summation differs -> near-exact
    np.testing.assert_allclose(np.asarray(acc_n), np.asarray(acc_1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pot_n), np.asarray(pot_1),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_sharded_leapfrog_matches_single(cloud):
    pos, mass = cloud
    vel = jnp.zeros_like(pos)
    state = integrate.NBodyState(pos, vel, mass)
    mesh = sharded.default_mesh(8)
    s1, _ = integrate.leapfrog_step(state, 1e-3, CFG, 0.5, 0.05,
                                    box_size=64.0)
    s8, _ = sharded.leapfrog_step_sharded(state, 1e-3, CFG, 0.5, 0.05, 1.0,
                                          mesh, box_size=64.0)
    np.testing.assert_allclose(np.asarray(s8.pos), np.asarray(s1.pos),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s8.vel), np.asarray(s1.vel),
                               atol=1e-5)


def test_sharded_jit_compiles(cloud):
    pos, mass = cloud
    mesh = sharded.default_mesh(8)

    @jax.jit
    def f(p, m):
        return sharded.acc_pot_sharded(p, m, CFG, 0.6, 0.01, 1.0, mesh)

    acc, pot, ovf = f(pos, mass)
    assert acc.shape == pos.shape and np.isfinite(np.asarray(acc)).all()

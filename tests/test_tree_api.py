import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rakau_tpu import Tree, octree, quadtree, TreeConfig, direct_acc_pot_np
from rakau_tpu import particles
from .helpers import rel_vec_err, rms


CFG = dict(max_depth=10, max_leaf_n=16, ncrit=64, tile_chunk=16)



# Compile-bound integration tests (r4 test-fast pass: the whole
# not-slow suite measured ~54 min on the 1-core CI box, almost all
# XLA compile time). Full coverage runs under `make test`;
# tests/test_fast_smoke.py keeps a per-mode end-to-end net in fast.
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def cloud():
    pos, mass = particles.plummer(jax.random.PRNGKey(21), 2048)
    return np.asarray(pos), np.asarray(mass)


def test_ctor_coords_vs_xyz(cloud):
    pos, mass = cloud
    t1 = octree(coords=pos, masses=mass, **CFG)
    t2 = octree(x_coords=pos[:, 0], y_coords=pos[:, 1], z_coords=pos[:, 2],
                masses=mass, **CFG)
    a1 = np.asarray(t1.accs_o(theta=0.5))
    a2 = np.asarray(t2.accs_o(theta=0.5))
    np.testing.assert_array_equal(a1, a2)


def test_u_o_consistency(cloud):
    pos, mass = cloud
    t = octree(coords=pos, masses=mass, **CFG)
    acc_u, pot_u = t.accs_pots_u(theta=0.5, eps=0.01)
    acc_o, pot_o = t.accs_pots_o(theta=0.5, eps=0.01)
    perm = t.perm
    np.testing.assert_array_equal(np.asarray(acc_o)[perm], np.asarray(acc_u))
    np.testing.assert_array_equal(np.asarray(pot_o)[perm], np.asarray(pot_u))
    # positions_o round-trips the ctor input
    np.testing.assert_allclose(np.asarray(t.positions_o), pos, rtol=0)
    np.testing.assert_allclose(np.asarray(t.masses_o), mass, rtol=0)


def test_accs_pots_split_agree(cloud):
    pos, mass = cloud
    t = octree(coords=pos, masses=mass, **CFG)
    acc, pot = t.accs_pots_o(theta=0.6)
    np.testing.assert_array_equal(np.asarray(t.accs_o(theta=0.6)),
                                  np.asarray(acc))
    np.testing.assert_array_equal(np.asarray(t.pots_o(theta=0.6)),
                                  np.asarray(pot))


def test_exact_matches_oracle(cloud):
    pos, mass = cloud
    t = octree(coords=pos, masses=mass, **CFG)
    acc, pot = t.exact_accs_pots_o(eps=0.05)
    acc_np, pot_np = direct_acc_pot_np(pos, mass, eps=0.05)
    assert rel_vec_err(acc, acc_np).max() < 5e-5
    np.testing.assert_allclose(np.asarray(pot), pot_np, rtol=5e-5)


def test_update_positions_composes_perm(cloud):
    pos, mass = cloud
    t = octree(coords=pos, masses=mass, box_size=64.0, **CFG)
    rng = np.random.default_rng(0)
    drift = rng.standard_normal(pos.shape).astype(np.float32) * 0.01
    new_o = pos + drift
    t.update_positions_o(jnp.asarray(new_o))
    np.testing.assert_allclose(np.asarray(t.positions_o), new_o, atol=1e-7)
    # result matches a freshly built tree on the same positions
    t2 = octree(coords=new_o, masses=mass, box_size=t.box_size, **CFG)
    a1 = np.asarray(t.accs_o(theta=0.5))
    a2 = np.asarray(t2.accs_o(theta=0.5))
    np.testing.assert_allclose(a1, a2, atol=1e-6)


def test_update_positions_u_callable(cloud):
    pos, mass = cloud
    t = octree(coords=pos, masses=mass, **CFG)
    t.update_positions_u(lambda p: p * 0.5)
    np.testing.assert_allclose(np.asarray(t.positions_o), pos * 0.5,
                               atol=1e-7)


def test_update_masses(cloud):
    pos, mass = cloud
    t = octree(coords=pos, masses=mass, **CFG)
    t.update_masses_o(jnp.asarray(mass * 2))
    np.testing.assert_allclose(np.asarray(t.masses_o), mass * 2, rtol=1e-7)
    a2 = np.asarray(t.accs_o(theta=0.5))
    t1 = octree(coords=pos, masses=mass, box_size=t.box_size, **CFG)
    a1 = np.asarray(t1.accs_o(theta=0.5))
    np.testing.assert_allclose(a2, 2 * a1, rtol=1e-4, atol=1e-6)


def test_overflow_autoretry(cloud):
    pos, mass = cloud
    t = octree(coords=pos, masses=mass, p2p_src_cap=64, m2p_cap=64,
               p2p_leaf_cap=32, **CFG)
    acc = t.accs_o(theta=0.5)  # must succeed by growing caps
    assert np.isfinite(np.asarray(acc)).all()
    assert t.config.p2p_src_cap > 64


def test_quadtree_alias():
    pos, mass = particles.uniform_cube(jax.random.PRNGKey(1), 512, ndim=2)
    t = quadtree(coords=np.asarray(pos), masses=np.asarray(mass),
                 max_depth=8, max_leaf_n=16, ncrit=64)
    acc = np.asarray(t.accs_o(theta=0.4))
    acc_o, _ = direct_acc_pot_np(np.asarray(pos), np.asarray(mass))
    assert rms(rel_vec_err(acc, acc_o)) < 2e-2


def test_ctor_validation():
    with pytest.raises(ValueError, match="masses"):
        Tree(coords=np.zeros((4, 3), np.float32))
    with pytest.raises(ValueError, match="outside"):
        Tree(coords=np.array([[5.0, 0, 0]], dtype=np.float32),
             masses=np.ones(1, np.float32), box_size=1.0)
    with pytest.raises(ValueError, match=r"coords must be \[N, 3\]"):
        Tree(coords=np.zeros((4, 2), np.float32),
             masses=np.ones(4, np.float32))


def test_G_scaling(cloud):
    pos, mass = cloud
    t = octree(coords=pos, masses=mass, **CFG)
    a1 = np.asarray(t.accs_o(theta=0.5, G=1.0))
    a2 = np.asarray(t.accs_o(theta=0.5, G=3.0))
    np.testing.assert_allclose(a2, 3 * a1, rtol=1e-5, atol=1e-6)


def test_tune_caps(cloud):
    pos, mass = cloud
    t = octree(coords=pos, masses=mass, **CFG)
    a1 = np.asarray(t.accs_o(theta=0.6))
    cfg2 = t.tune_caps()
    assert cfg2.m2p_cap <= 4096 and cfg2.p2p_src_cap <= 8192
    a2 = np.asarray(t.accs_o(theta=0.6))  # recompiles with snug caps
    np.testing.assert_allclose(a2, a1, atol=1e-6)


def test_repr(cloud):
    pos, mass = cloud
    t = octree(coords=pos, masses=mass, **CFG)
    s = repr(t)
    assert "octree" in s and "n=2048" in s

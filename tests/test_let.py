"""LET domain-decomposition tests on the simulated 8-device CPU mesh.

What the reference could not test (single-node library): shard-count
accuracy invariance — the LET halo exchange must keep results inside the
single-chip MAC envelope for any number of domains (SURVEY.md §5
"implication for the rebuild's test plan")."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rakau_tpu import build, direct, engine, particles
from rakau_tpu.config import TreeConfig
from rakau_tpu.parallel import let, sharded
from .helpers import rel_vec_err, rms


CFG = TreeConfig(max_depth=8, max_leaf_n=16, ncrit=64, tile_chunk=16,
                 m2p_cap=2048, p2p_leaf_cap=2048, p2p_src_cap=32768,
                 frontier_cap=1024)


def single_chip(pos, mass, theta, eps):
    td = build.build_tree(pos, mass, CFG)
    acc, pot, ovf = engine.acc_pot_u(td, CFG, theta, eps)
    assert not bool(np.asarray(ovf).any())
    inv = np.asarray(td.inv_perm)
    return np.asarray(acc)[inv], np.asarray(pot)[inv]


@pytest.mark.parametrize("ndev", [2, 8])
def test_let_matches_envelope(ndev):
    n = 8192
    pos, mass = particles.plummer(jax.random.PRNGKey(31), n)
    theta, eps = 0.6, 0.01
    mesh = sharded.default_mesh(ndev)
    acc, pot, ovf, exp_ovf = let.acc_pot_let(
        pos, mass, CFG, jnp.float32(theta), jnp.float32(eps), 1.0, mesh,
        export_cap=8192)
    assert not bool(np.asarray(ovf).any()), np.asarray(ovf)
    assert not bool(exp_ovf)
    acc_d, pot_d = direct.direct_acc_pot_np(
        np.asarray(pos), np.asarray(mass), eps=eps)
    acc_1, pot_1 = single_chip(pos, mass, theta, eps)
    e_let = rms(rel_vec_err(np.asarray(acc), acc_d))
    e_one = rms(rel_vec_err(acc_1, acc_d))
    # LET must stay inside the single-chip MAC envelope (conservative
    # domain-level acceptance can only tighten it, modulo fp noise)
    assert e_let < max(1.5 * e_one, 2e-3), (ndev, e_let, e_one)
    p_let = rms((np.asarray(pot) - pot_d) / pot_d)
    assert p_let < 5e-3, p_let


def test_let_uneven_n():
    # n not divisible by ndev: zero-mass padding path
    n = 5000
    pos, mass = particles.uniform_cube(jax.random.PRNGKey(33), n)
    mesh = sharded.default_mesh(8)
    acc, pot, ovf, exp_ovf = let.acc_pot_let(
        pos, mass, CFG, jnp.float32(0.6), jnp.float32(0.02), 1.0, mesh,
        export_cap=8192)
    assert not bool(np.asarray(ovf).any())
    acc_d, _ = direct.direct_acc_pot_np(np.asarray(pos), np.asarray(mass),
                                        eps=0.02)
    assert rms(rel_vec_err(np.asarray(acc), acc_d)) < 1e-2
    assert acc.shape == (n, 3)

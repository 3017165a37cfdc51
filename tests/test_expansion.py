"""Unit tests for the tile-local far-field expansion (expansion.py).

Validates the M2L+L2P path against exact per-particle monopole sums: the
truncation error must fall like rho^order (rho = tile radius / source
distance), and the engine-level gate must route near nodes back to the
per-particle kernel path (tested end-to-end in test_engine.py).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rakau_tpu import expansion


def exact_monopole(tgt, src_pos, src_mass, eps=0.0):
    d = src_pos[None, :, :] - tgt[:, None, :]
    r2 = (d * d).sum(-1) + eps ** 2
    u = 1.0 / np.sqrt(r2)
    acc = (src_mass[None, :, None] * d * (u ** 3)[..., None]).sum(1)
    pot = -(src_mass[None, :] * u).sum(1)
    return acc, pot


def test_sym_index_counts():
    p2, t2 = expansion.sym_indices(2)
    p3, t3 = expansion.sym_indices(3)
    assert len(p2) == 3 and len(t2) == 4
    assert len(p3) == 6 and len(t3) == 10
    assert expansion.n_coeffs(3, 3) == 20
    assert expansion.n_coeffs(3, 2) == 10
    assert expansion.n_coeffs(2, 3) == 10
    # multiplicities sum to the full tensor size
    assert sum(m for _, m in p3) == 9
    assert sum(m for _, m in t3) == 27


@pytest.mark.parametrize("ndim", [2, 3])
@pytest.mark.parametrize("order", [2, 3])
def test_l2p_matches_exact_far(ndim, order, rng):
    """Sources at distance >= gamma * r_tile: expansion error ~ gamma^-order."""
    C, T, U = 1, 32, 64
    gamma = 4.0
    r_tile = 0.1
    center = rng.standard_normal((C, ndim))
    s = np.clip(rng.uniform(-r_tile, r_tile, (C, T, ndim)),
                -r_tile, r_tile)
    tgt = center[:, None, :] + s
    # sources in a shell [gamma*r*sqrt(ndim), 8*gamma*r] around the center
    dirs = rng.standard_normal((U, ndim))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    src = center[0] + dirs * rng.uniform(gamma * r_tile * np.sqrt(ndim),
                                         8 * gamma * r_tile, (U, 1))
    mass = rng.uniform(0.1, 1.0, U)

    f32 = jnp.float32
    L = expansion.m2l(jnp.asarray(center, f32), jnp.asarray(src, f32),
                      jnp.asarray(mass, f32), jnp.ones((C, U), bool),
                      0.0, order=order)
    acc_l, pot_l = expansion.l2p(L, jnp.asarray(center, f32),
                                 jnp.asarray(tgt, f32), 1.0, order=order)
    acc_e, pot_e = exact_monopole(tgt[0], src, mass)
    rel = np.linalg.norm(np.asarray(acc_l)[0] - acc_e, axis=1)
    rel /= np.linalg.norm(acc_e, axis=1)
    tol = (1.0 / gamma) ** order * 3.0
    assert rel.max() < tol, (ndim, order, rel.max(), tol)
    prel = np.abs(np.asarray(pot_l)[0] - pot_e) / np.abs(pot_e)
    assert prel.max() < tol


def test_order3_beats_order2(rng):
    C, T, U = 1, 64, 128
    gamma = 3.0
    r = 0.1
    center = np.zeros((C, 3))
    s = rng.uniform(-r, r, (C, T, 3))
    tgt = center[:, None] + s
    dirs = rng.standard_normal((U, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    src = dirs * rng.uniform(gamma * r * 2, 10 * r, (U, 1))
    mass = rng.uniform(0.1, 1.0, U)
    f32 = jnp.float32
    errs = {}
    acc_e, _ = exact_monopole(tgt[0], src, mass)
    for order in (2, 3):
        L = expansion.m2l(jnp.asarray(center, f32), jnp.asarray(src, f32),
                          jnp.asarray(mass, f32), jnp.ones((C, U), bool),
                          0.0, order=order)
        acc_l, _ = expansion.l2p(L, jnp.asarray(center, f32),
                                 jnp.asarray(tgt, f32), 1.0, order=order)
        rel = np.linalg.norm(np.asarray(acc_l)[0] - acc_e, axis=1)
        errs[order] = float(np.mean(rel / np.linalg.norm(acc_e, axis=1)))
    assert errs[3] < errs[2]


def test_far_split_gating():
    center = jnp.zeros((2, 3), jnp.float32)
    rad2 = jnp.asarray([0.01, np.inf], jnp.float32)  # inf = empty tile
    node_pos = jnp.asarray([[0.05, 0, 0], [10.0, 0, 0]], jnp.float32)
    node_mass = jnp.asarray([1.0, 1.0], jnp.float32)
    mask = jnp.ones((2, 2), bool)
    far, near = expansion.far_split(center, rad2, node_pos, node_mass,
                                    mask, gamma=2.5)
    far = np.asarray(far); near = np.asarray(near)
    assert not far[0, 0] and near[0, 0]      # 0.05 < 2.5*0.1 -> near
    assert far[0, 1] and not near[0, 1]      # 10 >> 0.25 -> far
    assert not far[1].any() and near[1].all()  # empty tile: all near
    # zero-mass node never goes far
    far2, near2 = expansion.far_split(center, rad2, node_pos,
                                      jnp.zeros(2, jnp.float32), mask, 2.5)
    assert not np.asarray(far2).any()


@pytest.mark.parametrize("order", [2, 3])
def test_l2l_exact_recentring(order, rng):
    """L2L must be exact: evaluating the shifted expansion anywhere equals
    evaluating the original (polynomial identity, no truncation)."""
    C, U = 2, 48
    center = jnp.asarray(rng.standard_normal((C, 3)), jnp.float32)
    src = jnp.asarray(center[:, None] + rng.uniform(2, 5, (C, U, 3)) *
                      np.sign(rng.standard_normal((C, U, 3))), jnp.float32)
    # m2l wants [U, D] shared sources; build per-tile by stacking calls
    mass = jnp.asarray(rng.uniform(0.1, 1.0, U), jnp.float32)
    Ls = []
    for c in range(C):
        Ls.append(expansion.m2l(center[c:c + 1], src[c], mass,
                                jnp.ones((1, U), bool), 0.0, order)[0])
    L = jnp.stack(Ls)
    shift = jnp.asarray(rng.uniform(-0.05, 0.05, (C, 3)), jnp.float32)
    L2 = expansion.l2l(L, shift, order)
    x = jnp.asarray(rng.uniform(-0.02, 0.02, (C, 5, 3)), jnp.float32) + (
        center + shift)[:, None]
    a1, p1 = expansion.l2p(L, center, x, 1.0, order)
    a2, p2 = expansion.l2p(L2, center + shift, x, 1.0, order)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=2e-3, atol=1e-5)


def test_l2p_gradient_consistency(rng):
    """acc must equal -grad(pot) of the same polynomial (finite diff)."""
    C, U = 1, 32
    center = jnp.zeros((C, 3), jnp.float32)
    src = jnp.asarray(rng.uniform(1.0, 2.0, (U, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.1, 1.0, U), jnp.float32)
    L = expansion.m2l(center, src, mass, jnp.ones((C, U), bool), 0.0, 3)
    x0 = jnp.asarray([[[0.03, -0.02, 0.01]]], jnp.float32)
    h = 1e-3
    acc, _ = expansion.l2p(L, center, x0, 1.0, 3)
    for d in range(3):
        e = np.zeros((1, 1, 3), np.float32)
        e[..., d] = h
        _, pp = expansion.l2p(L, center, x0 + e, 1.0, 3)
        _, pm = expansion.l2p(L, center, x0 - e, 1.0, 3)
        fd = -(float(pp[0, 0]) - float(pm[0, 0])) / (2 * h)
        assert abs(fd - float(acc[0, 0, d])) < 5e-3 * max(1.0, abs(fd))

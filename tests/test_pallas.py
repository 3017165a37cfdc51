"""Pallas kernel vs XLA reference backend (interpret mode on CPU; the
same kernels run compiled on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rakau_tpu.kernels import pallas as pk
from rakau_tpu.kernels import xla as xk


def make_case(rng, C=3, T=32, Sm=96, Sp=64, n=1000):
    tgt_pos = jnp.asarray(rng.standard_normal((C, T, 3)), jnp.float32)
    tgt_idx = jnp.asarray(
        rng.choice(n, size=(C, T), replace=False).astype(np.int32))
    m_pos = jnp.asarray(rng.standard_normal((C, Sm, 3)) * 3, jnp.float32)
    m_mass = jnp.asarray(rng.uniform(0.1, 1, (C, Sm)), jnp.float32)
    # make some tail entries padding (mass 0, sentinel pos)
    m_cnt = jnp.asarray(rng.integers(Sm // 2, Sm, C), jnp.int32)
    ar = jnp.arange(Sm)
    mvalid = ar[None, :] < m_cnt[:, None]
    m_pos = jnp.where(mvalid[..., None], m_pos, 1e30)
    m_mass = jnp.where(mvalid, m_mass, 0.0)

    p_pos = jnp.asarray(rng.standard_normal((C, Sp, 3)), jnp.float32)
    p_mass = jnp.asarray(rng.uniform(0.1, 1, (C, Sp)), jnp.float32)
    p_idx = jnp.asarray(rng.integers(0, n, (C, Sp)), jnp.int32)
    p_cnt = jnp.asarray(rng.integers(Sp // 2, Sp, C), jnp.int32)
    pvalid = ar[None, :Sp] < p_cnt[:, None]
    p_pos = jnp.where(pvalid[..., None], p_pos, 1e30)
    p_mass = jnp.where(pvalid, p_mass, 0.0)
    p_idx = jnp.where(pvalid, p_idx, -1)
    # plant some self-pairs: source j equals target j for first few
    p_pos = p_pos.at[:, :8].set(tgt_pos[:, :8])
    p_idx = p_idx.at[:, :8].set(tgt_idx[:, :8])
    return (tgt_pos, tgt_idx, m_pos, m_mass, m_cnt, p_pos, p_mass, p_idx,
            p_cnt)


@pytest.mark.parametrize("fused", [True, False])
@pytest.mark.parametrize("eps", [0.0, 0.05])
def test_pallas_matches_xla(eps, fused, rng):
    (tgt_pos, tgt_idx, m_pos, m_mass, m_cnt, p_pos, p_mass, p_idx,
     p_cnt) = make_case(rng)
    acc_p, pot_p = pk.eval_tiles(
        tgt_pos, tgt_idx, m_pos, m_mass, None, p_pos, p_mass, p_idx,
        eps, 1.0, m2p_cnt=m_cnt, p2p_cnt=p_cnt, block=32, interpret=True,
        fused=fused)
    am, pm = xk.eval_m2p(tgt_pos, m_pos, m_mass, eps, 1.0)
    ap, pp = xk.eval_p2p(tgt_pos, tgt_idx, p_pos, p_mass, p_idx, eps, 1.0)
    np.testing.assert_allclose(np.asarray(acc_p), np.asarray(am + ap),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pot_p), np.asarray(pm + pp),
                               rtol=2e-4, atol=2e-5)


def test_pallas_shared_matches_xla(rng):
    C, T, S, n = 4, 32, 192, 2000
    tgt_pos = jnp.asarray(rng.standard_normal((C, T, 3)), jnp.float32)
    tgt_idx = jnp.asarray(
        rng.choice(n, size=(C, T), replace=False).astype(np.int32))
    src_pos = jnp.asarray(rng.standard_normal((S, 3)), jnp.float32)
    src_mass = jnp.asarray(rng.uniform(0.1, 1, S), jnp.float32)
    src_idx = jnp.asarray(rng.integers(-1, n, S), jnp.int32)
    mask = jnp.asarray(rng.uniform(size=(C, S)) < 0.4)
    # plant self pairs
    src_pos = src_pos.at[:8].set(tgt_pos[0, :8])
    src_idx = src_idx.at[:8].set(tgt_idx[0, :8])
    a1, p1 = pk.eval_shared(tgt_pos, tgt_idx, src_pos, src_mass, src_idx,
                            mask, 0.01, 1.0, block=64, interpret=True)
    a2, p2 = xk.eval_shared(tgt_pos, tgt_idx, src_pos, src_mass, src_idx,
                            mask, 0.01, 1.0, block=64)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=2e-4,
                               atol=2e-5)


def test_pallas_shared_fused_matches_xla(rng):
    """Fused single-step-per-tile variant (compacted active-block loop)."""
    C, T, S, n = 4, 32, 384, 2000
    tgt_pos = jnp.asarray(rng.standard_normal((C, T, 3)), jnp.float32)
    tgt_idx = jnp.asarray(
        rng.choice(n, size=(C, T), replace=False).astype(np.int32))
    src_pos = jnp.asarray(rng.standard_normal((S, 3)), jnp.float32)
    src_mass = jnp.asarray(rng.uniform(0.1, 1, S), jnp.float32)
    src_idx = jnp.asarray(rng.integers(-1, n, S), jnp.int32)
    # sparse mask with whole dead blocks (block=64 below)
    mask = jnp.asarray(rng.uniform(size=(C, S)) < 0.3)
    mask = mask.at[:, 64:192].set(False)
    mask = mask.at[2].set(False)  # one tile with nothing at all
    src_pos = src_pos.at[:8].set(tgt_pos[0, :8])
    src_idx = src_idx.at[:8].set(tgt_idx[0, :8])
    a1, p1 = pk.eval_shared_fused(tgt_pos, tgt_idx, src_pos, src_mass,
                                  src_idx, mask, 0.01, 1.0, block=64,
                                  interpret=True)
    a2, p2 = xk.eval_shared(tgt_pos, tgt_idx, src_pos, src_mass, src_idx,
                            mask, 0.01, 1.0, block=64)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=2e-4,
                               atol=2e-5)
    assert not np.asarray(a1)[2].any() and not np.asarray(p1)[2].any()


def test_pallas_shared_fused_quad_matches_xla(rng):
    """Quadrupole source rows (multipole_order=2 M2P segment): the fused
    kernel's in-kernel quadrupole correction must match the XLA shared
    kernel's, including mask gating and self exclusion."""
    C, T, S, n = 4, 32, 192, 2000
    tgt_pos = jnp.asarray(rng.standard_normal((C, T, 3)), jnp.float32)
    tgt_idx = jnp.asarray(
        rng.choice(n, size=(C, T), replace=False).astype(np.int32))
    src_pos = jnp.asarray(2.0 + rng.standard_normal((S, 3)), jnp.float32)
    src_mass = jnp.asarray(rng.uniform(0.1, 1, S), jnp.float32)
    src_idx = jnp.full(S, -1, jnp.int32)
    mask = jnp.asarray(rng.uniform(size=(C, S)) < 0.4)
    mask = mask.at[:, 64:128].set(False)   # a dead block (block=64)
    # plausible raw second moments: Q = m * d d^T for random offsets d
    d = rng.standard_normal((S, 3)) * 0.1
    q_cols = [d[:, a] * d[:, b] for a in range(3) for b in range(a, 3)]
    src_quad = jnp.asarray(np.stack(q_cols, 1)
                           * np.asarray(src_mass)[:, None], jnp.float32)
    a1, p1 = pk.eval_shared_fused(tgt_pos, tgt_idx, src_pos, src_mass,
                                  src_idx, mask, 0.01, 1.0, block=64,
                                  interpret=True, src_quad=src_quad)
    a2, p2 = xk.eval_shared(tgt_pos, tgt_idx, src_pos, src_mass, src_idx,
                            mask, 0.01, 1.0, block=64, src_quad=src_quad)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=2e-4,
                               atol=2e-5)
    # and the quad correction actually changed the answer
    a0, _ = xk.eval_shared(tgt_pos, tgt_idx, src_pos, src_mass, src_idx,
                           mask, 0.01, 1.0, block=64)
    assert np.abs(np.asarray(a2) - np.asarray(a0)).max() > 1e-6


def test_compensated_accumulation(rng):
    """TwoSum block accumulation must agree with an fp64 reference better
    than plain fp32 on a long, cancellation-heavy source list."""
    C, T, S, n = 1, 8, 4096, 100000
    tgt_pos = jnp.asarray(rng.standard_normal((C, T, 3)) * 0.01, jnp.float32)
    tgt_idx = jnp.asarray(np.arange(T, dtype=np.int32)[None])
    # sources in a far shell with huge mass spread -> long-sum rounding
    dirs = rng.standard_normal((S, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    src = dirs * rng.uniform(5.0, 50.0, (S, 1))
    mass = rng.uniform(1e-6, 10.0, S)
    src_pos = jnp.asarray(src, jnp.float32)
    src_mass = jnp.asarray(mass, jnp.float32)
    src_idx = jnp.full((S,), -1, jnp.int32)
    mask = jnp.ones((C, S), bool)

    # fp64 reference
    d = src[None, None] - np.asarray(tgt_pos, np.float64)[:, :, None]
    r = np.linalg.norm(d, axis=-1)
    pot_ref = -(mass[None, None] / r).sum(-1)

    errs = {}
    for comp in (False, True):
        _, p1 = pk.eval_shared_fused(tgt_pos, tgt_idx, src_pos, src_mass,
                                     src_idx, mask, 0.0, 1.0, block=128,
                                     interpret=True, compensated=comp)
        _, p2 = xk.eval_shared(tgt_pos, tgt_idx, src_pos, src_mass,
                               src_idx, mask, 0.0, 1.0, block=128,
                               compensated=comp)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=1e-6)
        errs[comp] = np.abs(np.asarray(p1, np.float64) - pot_ref).max()
    assert errs[True] <= errs[False]


def test_pallas_block_skip_correctness(rng):
    # counts much smaller than caps: skipped blocks must not change sums
    (tgt_pos, tgt_idx, m_pos, m_mass, m_cnt, p_pos, p_mass, p_idx,
     p_cnt) = make_case(rng, Sm=256, Sp=128)
    a1, p1 = pk.eval_tiles(tgt_pos, tgt_idx, m_pos, m_mass, None,
                           p_pos, p_mass, p_idx, 0.01, 1.0,
                           m2p_cnt=m_cnt, p2p_cnt=p_cnt, block=32,
                           interpret=True)
    a2, p2 = pk.eval_tiles(tgt_pos, tgt_idx, m_pos, m_mass, None,
                           p_pos, p_mass, p_idx, 0.01, 1.0,
                           block=32, interpret=True)  # no counts: all blocks
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5,
                               atol=1e-6)


def test_cell_coverage_mask(rng):
    """grid2 per-pair coverage: a pair whose Chebyshev leaf-cell
    separation >= grid_sep is dead (its interaction lives in the dense
    far field); src_cell < 0 rows are exempt (LET imports). Pallas and
    XLA paths must agree with a manual mask reference."""
    C, T, S, n, sep = 2, 16, 192, 500, 3
    tgt_pos = jnp.asarray(rng.standard_normal((C, T, 3)), jnp.float32)
    tgt_idx = jnp.asarray(
        rng.choice(n, size=(C, T), replace=False).astype(np.int32))
    src_pos = jnp.asarray(rng.standard_normal((S, 3)), jnp.float32)
    src_mass = jnp.asarray(rng.uniform(0.1, 1, S), jnp.float32)
    src_idx = jnp.asarray(rng.integers(-1, n, S), jnp.int32)
    mask = jnp.asarray(rng.uniform(size=(C, S)) < 0.5)
    tgt_cell = jnp.asarray(rng.integers(0, 8, (C, T, 3)), jnp.int32)
    src_cell = jnp.asarray(rng.integers(0, 8, (S, 3)), jnp.int32)
    # a handful of exempt rows (cell -1, LET-import convention)
    src_cell = src_cell.at[:6].set(-1)

    a1, p1 = pk.eval_shared_fused(tgt_pos, tgt_idx, src_pos, src_mass,
                                  src_idx, mask, 0.01, 1.0, block=64,
                                  interpret=True, src_cell=src_cell,
                                  tgt_cell=tgt_cell, grid_sep=sep)
    a2, p2 = xk.eval_shared(tgt_pos, tgt_idx, src_pos, src_mass,
                            src_idx, mask, 0.01, 1.0, block=64,
                            src_cell=src_cell, tgt_cell=tgt_cell,
                            grid_sep=sep)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=2e-4,
                               atol=2e-5)

    # manual reference: fold the coverage test into the [C, S] mask per
    # target by brute force
    csep = np.max(np.abs(np.asarray(src_cell)[None, None, :, :]
                         - np.asarray(tgt_cell)[:, :, None, :]), axis=-1)
    alive = ~((csep >= sep) & (np.asarray(src_cell)[None, None, :, 0] >= 0))
    d = (np.asarray(src_pos, np.float64)[None, None]
         - np.asarray(tgt_pos, np.float64)[:, :, None])
    r2 = (d * d).sum(-1) + 0.01 ** 2
    excl = (np.asarray(src_idx)[None, None, :]
            == np.asarray(tgt_idx)[:, :, None])
    w = (np.asarray(src_mass, np.float64)[None, None]
         * np.asarray(mask, np.float64)[:, None, :]
         * alive * ~excl) / np.sqrt(r2)
    pot_ref = -w.sum(-1)
    np.testing.assert_allclose(np.asarray(p1, np.float64), pot_ref,
                               rtol=3e-4, atol=3e-5)


def test_mode_specialization(rng):
    """accs-only / pots-only kernels match the both-path outputs exactly
    (work specialization, not approximation; VERDICT r1 item 9)."""
    C, T, S, n = 2, 16, 128, 500
    tgt_pos = jnp.asarray(rng.standard_normal((C, T, 3)), jnp.float32)
    tgt_idx = jnp.asarray(
        rng.choice(n, size=(C, T), replace=False).astype(np.int32))
    src_pos = jnp.asarray(rng.standard_normal((S, 3)), jnp.float32)
    src_mass = jnp.asarray(rng.uniform(0.1, 1, S), jnp.float32)
    src_idx = jnp.asarray(rng.integers(-1, n, S), jnp.int32)
    mask = jnp.asarray(rng.uniform(size=(C, S)) < 0.4)
    for impl, kw in ((pk.eval_shared_fused, dict(interpret=True)),
                     (xk.eval_shared, dict())):
        ab, pb = impl(tgt_pos, tgt_idx, src_pos, src_mass, src_idx,
                      mask, 0.01, 1.0, block=64, mode="both", **kw)
        aa, pa = impl(tgt_pos, tgt_idx, src_pos, src_mass, src_idx,
                      mask, 0.01, 1.0, block=64, mode="acc", **kw)
        ap, pp = impl(tgt_pos, tgt_idx, src_pos, src_mass, src_idx,
                      mask, 0.01, 1.0, block=64, mode="pot", **kw)
        np.testing.assert_array_equal(np.asarray(aa), np.asarray(ab))
        np.testing.assert_array_equal(np.asarray(pp), np.asarray(pb))
        assert not np.asarray(pa).any()   # skipped outputs are zeros
        assert not np.asarray(ap).any()

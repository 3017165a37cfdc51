"""gwalk engine (traversal_mode='gwalk'): global incidence walk +
block-aligned pool + single-launch pool kernel (traversal4 +
kernels.pallas.eval_pool). VERDICT r4 item 2: the r5 engine's back half.

The walk/pool physics equivalence vs traversal2 is pinned in
test_traversal4.py; here the ENGINE path is tested end-to-end (m2p,
grid, quadrupole) plus the Pallas kernel against the XLA reference in
interpret mode.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rakau_tpu import build, engine, particles, direct
from rakau_tpu.config import TreeConfig

from .helpers import rel_vec_err, rms

pytestmark = pytest.mark.slow

BASE = dict(max_depth=9, max_leaf_n=16, ncrit=64, tile_chunk=8,
            m2p_cap=262144, p2p_leaf_cap=262144, p2p_src_cap=1048576,
            frontier_cap=32768, pool_window=65536, pool_block=128)


def _query(pos, mass, cfg, theta):
    td = build.build_tree(pos, mass, cfg)
    # a truncated tile table silently zeroes the dropped tiles' near
    # field (the r5 grid2 tile_capacity bug) — never query past it
    assert not bool(td.overflow)
    acc, pot, ovf = engine.acc_pot_u(td, cfg, jnp.asarray(theta, pos.dtype),
                                     jnp.asarray(0.0, pos.dtype))
    assert not bool(np.asarray(ovf).any())
    inv = np.asarray(td.inv_perm)
    return np.asarray(acc)[inv], np.asarray(pot)[inv]


def test_gwalk_matches_shared_m2p():
    """Same COM MAC set as the shared engine -> agreement to fp32
    summation-order noise."""
    n = 4096
    pos, mass = particles.plummer(jax.random.PRNGKey(5), n)
    a_g, p_g = _query(pos, mass, TreeConfig(
        farfield="m2p", traversal_mode="gwalk", **BASE), 0.7)
    a_s, p_s = _query(pos, mass, TreeConfig(
        farfield="m2p", traversal_mode="shared",
        **{**BASE, "m2p_cap": 8192, "p2p_leaf_cap": 2048,
           "p2p_src_cap": 16384, "frontier_cap": 2048}), 0.7)
    dev = rel_vec_err(a_g, a_s)
    assert dev.max() < 1e-4, dev.max()
    pdev = np.abs(p_g - p_s) / np.maximum(np.abs(p_s), 1e-30)
    assert pdev.max() < 1e-4


def test_gwalk_grid_matches_shared_envelope():
    """farfield='grid': coverage drops at node AND expanded-particle
    granularity (the pool-build psep filter) + dense stencil L2L/L2P
    must land in the same error envelope as the shared engine with the
    far/near Taylor gate disabled (the headline gamma>=1e9 config)."""
    n = 8192
    pos, mass = particles.plummer(jax.random.PRNGKey(5), n)
    acc_o, _ = direct.direct_acc_pot_np(np.asarray(pos, np.float64),
                                        np.asarray(mass, np.float64))
    a_g, _ = _query(pos, mass, TreeConfig(
        farfield="grid", traversal_mode="gwalk", grid_level=3,
        **{**BASE, "p2p_src_cap": 2097152, "m2p_cap": 524288}), 0.7)
    a_s, _ = _query(pos, mass, TreeConfig(
        farfield="grid", traversal_mode="shared", grid_level=3,
        local_gamma=1e18,
        **{**BASE, "m2p_cap": 8192, "p2p_leaf_cap": 4096,
           "p2p_src_cap": 32768, "frontier_cap": 4096}), 0.7)
    e_g = rms(rel_vec_err(a_g, acc_o))
    e_s = rms(rel_vec_err(a_s, acc_o))
    assert abs(e_g - e_s) < 0.05 * e_s, (e_g, e_s)


def test_gwalk_grid2_matches_shared_envelope():
    """farfield='grid2' via gwalk: cell-clipped tiles make the pool-row
    coverage drop the exact per-pair test, so the near/far PARTITION is
    identical to shared+grid2 (per-target-cell kernel masks); only the
    M2P acceptance sets differ (different tile boxes) -> same envelope.
    grid2's conv-M2L far field is added once per query by the caller."""
    n = 8192
    pos, mass = particles.plummer(jax.random.PRNGKey(5), n)
    acc_o, _ = direct.direct_acc_pot_np(np.asarray(pos, np.float64),
                                        np.asarray(mass, np.float64))
    a_g, _ = _query(pos, mass, TreeConfig(
        farfield="grid2", traversal_mode="gwalk", grid_level=3,
        local_order=4, grid_sep=2,
        **{**BASE, "p2p_src_cap": 2097152, "m2p_cap": 524288}), 0.7)
    a_s, _ = _query(pos, mass, TreeConfig(
        farfield="grid2", traversal_mode="shared", grid_level=3,
        local_order=4, grid_sep=2,
        **{**BASE, "m2p_cap": 8192, "p2p_leaf_cap": 4096,
           "p2p_src_cap": 32768, "frontier_cap": 4096}), 0.7)
    e_g = rms(rel_vec_err(a_g, acc_o))
    e_s = rms(rel_vec_err(a_s, acc_o))
    assert abs(e_g - e_s) < 0.15 * e_s, (e_g, e_s)


def test_gwalk_grid2_quadrupole_improves():
    """The headline accuracy config shape: gwalk + grid2 + quadrupole
    (pool quad planes ride the m2p segment; conv-M2L far field)."""
    n = 8192
    pos, mass = particles.plummer(jax.random.PRNGKey(5), n)
    acc_o, _ = direct.direct_acc_pot_np(np.asarray(pos, np.float64),
                                        np.asarray(mass, np.float64))
    cfg = TreeConfig(farfield="grid2", traversal_mode="gwalk",
                     grid_level=3, local_order=4, grid_sep=2,
                     **{**BASE, "p2p_src_cap": 2097152,
                        "m2p_cap": 524288})
    a_m, _ = _query(pos, mass, cfg, 0.7)
    a_q, _ = _query(pos, mass, cfg.with_(multipole_order=2), 0.7)
    e_m = rms(rel_vec_err(a_m, acc_o))
    e_q = rms(rel_vec_err(a_q, acc_o))
    assert e_q < 0.6 * e_m, (e_q, e_m)


def test_gwalk_quadrupole_improves():
    n = 4096
    pos, mass = particles.plummer(jax.random.PRNGKey(5), n)
    acc_o, _ = direct.direct_acc_pot_np(np.asarray(pos, np.float64),
                                        np.asarray(mass, np.float64))
    cfg = TreeConfig(farfield="m2p", traversal_mode="gwalk", **BASE)
    a_m, _ = _query(pos, mass, cfg, 0.7)
    a_q, _ = _query(pos, mass, cfg.with_(multipole_order=2), 0.7)
    e_m = rms(rel_vec_err(a_m, acc_o))
    e_q = rms(rel_vec_err(a_q, acc_o))
    assert e_q < 0.5 * e_m, (e_q, e_m)


def test_gwalk_overflow_flags():
    """Undersized global caps must FLAG, never truncate silently."""
    n = 4096
    pos, mass = particles.plummer(jax.random.PRNGKey(5), n)
    cfg = TreeConfig(farfield="m2p", traversal_mode="gwalk",
                     **{**BASE, "m2p_cap": 512, "p2p_src_cap": 4096,
                        "pool_window": 1024})
    td = build.build_tree(pos, mass, cfg)
    _, _, ovf = engine.acc_pot_u(td, cfg, jnp.float32(0.7),
                                 jnp.float32(0.0))
    assert bool(np.asarray(ovf).any())


def test_gwalk_host_driver_matches_jit():
    n = 4096
    pos, mass = particles.plummer(jax.random.PRNGKey(5), n)
    cfg = TreeConfig(farfield="m2p", traversal_mode="gwalk", **BASE)
    td = build.build_tree(pos, mass, cfg)
    th, ep = jnp.float32(0.7), jnp.float32(0.0)
    a1, p1, o1 = engine.acc_pot_u(td, cfg, th, ep)
    a2, p2, o2, mx = engine.acc_pot_u_host(td, cfg, th, ep)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-6)
    assert not bool(np.asarray(o2).any())
    # maxima feed fit_caps in the standard order
    from rakau_tpu.config import fit_caps
    cfg2 = fit_caps(cfg, np.asarray(mx))
    assert cfg2.m2p_cap >= int(mx[0])
    assert cfg2.p2p_src_cap >= int(mx[1])


def test_gwalk_unrolled_round_caps_match_dynamic():
    """tune_gwalk's fitted per-round frontier caps: the statically
    unrolled walk must reproduce the dynamic while-loop walk's physics
    bit-for-bit-class, and undersized round caps must FLAG."""
    n = 4096
    pos, mass = particles.plummer(jax.random.PRNGKey(5), n)
    cfg = TreeConfig(farfield="m2p", traversal_mode="gwalk", **BASE)
    td = build.build_tree(pos, mass, cfg)
    th, ep = jnp.float32(0.7), jnp.float32(0.0)
    a_dyn, p_dyn, o_dyn = engine.acc_pot_u(td, cfg, th, ep)
    cfg_f = engine.tune_gwalk(td, cfg, th, ep)
    assert cfg_f.gwalk_round_caps is not None
    assert len(cfg_f.gwalk_round_caps) >= 2
    a_un, p_un, o_un = engine.acc_pot_u(td, cfg_f, th, ep)
    assert not bool(np.asarray(o_un).any())
    np.testing.assert_allclose(np.asarray(a_un), np.asarray(a_dyn),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(p_un), np.asarray(p_dyn),
                               rtol=1e-5)
    # undersized round caps flag (frontier slot), never truncate silently
    bad = cfg_f.with_(gwalk_round_caps=(8,) * len(cfg_f.gwalk_round_caps))
    _, _, o_bad = engine.acc_pot_u(td, bad, th, ep)
    assert bool(np.asarray(o_bad)[3])


def test_pool_kernel_interpret_matches_xla(rng):
    """The Pallas pool kernel (what runs on TPU) against the XLA
    reference on a synthetic schedule, incl. quad planes and self
    exclusion."""
    from rakau_tpu.kernels import pallas as pk, xla as xk
    Gt, T, D, block = 5, 16, 3, 32
    window = 128
    wb = window // block
    P = 2 * window
    n = 1000
    tgt_pos = jnp.asarray(rng.standard_normal((Gt, T, D)), jnp.float32)
    tgt_idx = jnp.asarray(
        rng.choice(n, size=(Gt, T), replace=False).astype(np.int32))
    pool_pos = jnp.asarray(rng.standard_normal((P, D)) * 2, jnp.float32)
    pool_mass = jnp.asarray(rng.uniform(0.1, 1, P), jnp.float32)
    pool_idx = jnp.full(P, -1, np.int32)
    # make some rows "particles" colliding with targets (self exclusion)
    pool_idx = pool_idx.at[5].set(int(tgt_idx[0, 3]))
    pool_idx = pool_idx.at[40].set(int(tgt_idx[2, 1]))
    pool_pos = pool_pos.at[5].set(tgt_pos[0, 3])
    # schedule: tiles with varying segments across 2 windows
    sched = jnp.asarray([[0, 0, 1, 1],     # blocks 0..2
                         [0, 2, 0, 1],     # block 2
                         [0, 3, 1, 0],     # block 3
                         [1, 0, 2, 1],     # window 1, blocks 0..3
                         [1, 3, 0, 0]],    # empty
                        jnp.int32)
    q = rng.standard_normal((P, 6)) * 0.05
    # production pools carry quad ONLY on m2p-segment rows (build_pool);
    # the Pallas kernel exploits that (quad math on the m2p loop only),
    # so the synthetic pool must honor the same invariant
    m2p_rows = np.zeros(P, bool)
    for w, s, mn, _pn in np.asarray(sched):
        m2p_rows[(w * window + s * block):(w * window
                                           + (s + mn) * block)] = True
    q[~m2p_rows] = 0.0
    pool_quad = jnp.asarray(q * np.asarray(pool_mass)[:, None],
                            jnp.float32)
    for quad in (None, pool_quad):
        a1, p1 = pk.eval_pool(tgt_pos, tgt_idx, pool_pos, pool_mass,
                              pool_idx, sched, window, 0.01, 1.0, block,
                              pool_quad=quad, interpret=True)
        a2, p2 = xk.eval_pool(tgt_pos, tgt_idx, pool_pos, pool_mass,
                              pool_idx, sched, window, 0.01, 1.0, block,
                              pool_quad=quad)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=2e-4, atol=2e-5)
    # empty tile produced exactly zero
    assert not np.asarray(a1)[4].any() and not np.asarray(p1)[4].any()


def test_pool_kernel_group_matches_ungrouped(rng):
    """group>1 (several tiles per grid step sharing one window) must be
    a pure scheduling change: bitwise-same results as group=1, incl.
    the Gt %% group padding path."""
    from rakau_tpu.kernels import pallas as pk
    Gt, T, D, block = 5, 16, 3, 32
    window = 128
    P = 2 * window
    n = 1000
    tgt_pos = jnp.asarray(rng.standard_normal((Gt, T, D)), jnp.float32)
    tgt_idx = jnp.asarray(
        rng.choice(n, size=(Gt, T), replace=False).astype(np.int32))
    pool_pos = jnp.asarray(rng.standard_normal((P, D)) * 2, jnp.float32)
    pool_mass = jnp.asarray(rng.uniform(0.1, 1, P), jnp.float32)
    pool_idx = jnp.full(P, -1, np.int32)
    # group-granular packing invariant: both tiles of a group share a
    # window (group=2 -> groups (0,1) w0, (2,3) w0, (4,pad) w1)
    sched = jnp.asarray([[0, 0, 1, 1],
                         [0, 2, 0, 1],
                         [0, 3, 1, 0],
                         [0, 0, 2, 0],
                         [1, 0, 2, 1]], jnp.int32)
    a1, p1 = pk.eval_pool(tgt_pos, tgt_idx, pool_pos, pool_mass,
                          pool_idx, sched, window, 0.01, 1.0, block,
                          interpret=True)
    a2, p2 = pk.eval_pool(tgt_pos, tgt_idx, pool_pos, pool_mass,
                          pool_idx, sched, window, 0.01, 1.0, block,
                          interpret=True, group=2)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

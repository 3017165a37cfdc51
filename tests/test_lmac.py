"""Walk-free local-MAC traversal (traversal3, traversal_mode="lmac").

The partition argument (traversal3.py docstring) says every unit of mass
is counted exactly once per tile — tested directly as a mass-conservation
invariant — and that acceptance is strictly tighter than the walk's
COM-distance bh test, so the error envelope at equal theta must be at
most the shared walk's."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rakau_tpu import build, direct, engine, particles
from rakau_tpu.config import TreeConfig

from .helpers import rel_vec_err, rms


BASE = TreeConfig(max_depth=12, max_leaf_n=16, ncrit=64, tile_chunk=16,
                  m2p_cap=8192, p2p_leaf_cap=2048, p2p_src_cap=16384,
                  farfield="m2p")



# Compile-bound integration tests (r4 test-fast pass: the whole
# not-slow suite measured ~54 min on the 1-core CI box, almost all
# XLA compile time). Full coverage runs under `make test`;
# tests/test_fast_smoke.py keeps a per-mode end-to-end net in fast.
import pytest

pytestmark = pytest.mark.slow


def _query(pos, mass, cfg, theta, eps=0.0):
    td = build.build_tree(pos, mass, cfg)
    acc, pot, ovf = engine.acc_pot_u(td, cfg, jnp.asarray(theta, pos.dtype),
                                     jnp.asarray(eps, pos.dtype))
    assert not bool(np.asarray(ovf).any())
    inv = np.asarray(td.inv_perm)
    return np.asarray(acc)[inv], np.asarray(pot)[inv]


@pytest.mark.parametrize("dist", [
    pytest.param("uniform", marks=pytest.mark.slow),  # plummer covers
    "plummer"])
def test_lmac_within_shared_envelope(dist):
    n = 8192
    if dist == "plummer":
        pos, mass = particles.plummer(jax.random.PRNGKey(0), n)
    else:
        key = jax.random.PRNGKey(1)
        pos = jax.random.uniform(key, (n, 3), minval=-0.5, maxval=0.5)
        mass = jnp.full((n,), 1.0 / n)
    acc_o, _ = direct.direct_acc_pot_np(np.asarray(pos, np.float64),
                                        np.asarray(mass, np.float64))
    for theta in (0.5, 0.75):
        a_sh, _ = _query(pos, mass, BASE, theta)
        a_lm, _ = _query(pos, mass, BASE.with_(traversal_mode="lmac"),
                         theta)
        e_sh = rms(rel_vec_err(a_sh, acc_o))
        e_lm = rms(rel_vec_err(a_lm, acc_o))
        # box-distance acceptance is strictly more conservative than the
        # COM-distance walk at equal theta
        assert e_lm <= e_sh * 1.05, (theta, e_lm, e_sh)


def test_lmac_mass_partition_exact():
    """For every valid tile the masked source masses (nodes + expanded
    particles) must sum to the TOTAL mass — each particle contributes
    through exactly one transition node or P2P row (the partition
    argument is exact, not approximate)."""
    n = 4096
    pos, mass = particles.plummer(jax.random.PRNGKey(3), n)
    cfg = BASE.with_(traversal_mode="lmac")
    td = build.build_tree(pos, mass, cfg)
    tiles = engine._gather_tiles(td, cfg)
    (tpos, tidx, blo, bhi, tcell), _ = engine._split_tiles(tiles)
    tm = engine._traversal_mod(cfg)
    tabs = tm.make_tables(td, cfg)
    total = float(jnp.sum(mass))
    for theta in (0.4, 0.75, 1.0):
        th = jnp.float32(theta)
        for c in range(tpos.shape[0]):
            tv = tidx[c][:, 0] < n
            if not bool(np.asarray(tv).any()):
                continue
            src = tm.build_shared_sources(td, cfg, th, blo[c], bhi[c],
                                          tables=tabs, tile_cell=tcell[c],
                                          tile_valid=tv)
            assert not bool(np.asarray(src.overflow).any())
            ms = np.asarray(jnp.sum(
                jnp.where(src.mask, src.mass[None, :], 0.0), axis=1))
            tvn = np.asarray(tv)
            np.testing.assert_allclose(ms[tvn], total, rtol=2e-5)


def test_lmac_theta_to_zero_is_exact():
    n = 2048
    pos, mass = particles.plummer(jax.random.PRNGKey(5), n)
    acc_o, _ = direct.direct_acc_pot_np(np.asarray(pos, np.float64),
                                        np.asarray(mass, np.float64))
    cfg = BASE.with_(traversal_mode="lmac", p2p_src_cap=4096,
                     p2p_leaf_cap=4096)
    a, _ = _query(pos, mass, cfg, 1e-3)
    assert rms(rel_vec_err(a, acc_o)) < 5e-6


def test_lmac_grid2_matches_shared_grid2():
    """lmac under the grid2 far field must stay within the shared-walk
    grid2 error envelope (both resolve the same near region; acceptance
    differs only in the box-vs-COM distance)."""
    n = 8192
    pos, mass = particles.plummer(jax.random.PRNGKey(7), n)
    acc_o, _ = direct.direct_acc_pot_np(np.asarray(pos, np.float64),
                                        np.asarray(mass, np.float64))
    g2 = BASE.with_(farfield="grid2", local_order=4, grid_sep=2,
                    grid_level=3)
    a_sh, _ = _query(pos, mass, g2, 0.6)
    a_lm, _ = _query(pos, mass, g2.with_(traversal_mode="lmac"), 0.6)
    e_sh = rms(rel_vec_err(a_sh, acc_o))
    e_lm = rms(rel_vec_err(a_lm, acc_o))
    assert e_lm <= e_sh * 1.1, (e_lm, e_sh)


def test_lmac_quadrupole():
    """multipole_order=2 on lmac: quad moments ride the compacted rows."""
    n = 4096
    pos, mass = particles.plummer(jax.random.PRNGKey(9), n)
    acc_o, _ = direct.direct_acc_pot_np(np.asarray(pos, np.float64),
                                        np.asarray(mass, np.float64))
    cfg = BASE.with_(traversal_mode="lmac")
    a_m, _ = _query(pos, mass, cfg, 0.7)
    a_q, _ = _query(pos, mass, cfg.with_(multipole_order=2), 0.7)
    e_m = rms(rel_vec_err(a_m, acc_o))
    e_q = rms(rel_vec_err(a_q, acc_o))
    assert e_q < 0.5 * e_m, (e_q, e_m)


def test_lmac_host_path_and_2d():
    """acc_pot_u_host (the bench driver) and ndim=2 on lmac."""
    n = 4096
    pos, mass = particles.plummer(jax.random.PRNGKey(15), n)
    cfg = BASE.with_(traversal_mode="lmac")
    td = build.build_tree(pos, mass, cfg)
    a_h, p_h, ovf, mx = engine.acc_pot_u_host(td, cfg, jnp.float32(0.6),
                                              jnp.float32(0.0), 1.0,
                                              slice_chunks=4)
    assert not bool(np.asarray(ovf).any())
    a_g, p_g, _ = engine.acc_pot_u(td, cfg, jnp.float32(0.6),
                                   jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(a_h), np.asarray(a_g), rtol=1e-6)
    assert np.asarray(mx).shape == (4,)

    # 2D quadtree
    key = jax.random.PRNGKey(17)
    pos2 = jax.random.uniform(key, (2048, 2), minval=-0.5, maxval=0.5)
    mass2 = jnp.full((2048,), 1.0 / 2048)
    cfg2 = TreeConfig(ndim=2, max_depth=12, max_leaf_n=16, ncrit=64,
                      tile_chunk=16, m2p_cap=8192, p2p_leaf_cap=2048,
                      p2p_src_cap=16384, farfield="m2p",
                      traversal_mode="lmac")
    acc_o2, _ = direct.direct_acc_pot_np(np.asarray(pos2, np.float64),
                                         np.asarray(mass2, np.float64))
    a2, _ = _query(pos2, mass2, cfg2, 0.6)
    # 2D monopole envelope is wider than 3D (shared walk measures
    # ~1.2e-2 at this exact config; lmac is tighter)
    assert rms(rel_vec_err(a2, acc_o2)) < 1.1e-2


@pytest.mark.slow
def test_accuracy_gate_trajectory():
    """VERDICT r1 item 3d: the documented north-star trajectory config
    (lmac + grid2 order 6 / sep 3 + quadrupole near field, theta=0.5)
    must hold RMS <= 2e-4 vs the fp64 oracle (measured 9.0e-5 at 65k,
    PLAN.md accuracy ladder)."""
    n = 16384
    pos, mass = particles.plummer(jax.random.PRNGKey(21), n)
    acc_o, _ = direct.direct_acc_pot_np(np.asarray(pos, np.float64),
                                        np.asarray(mass, np.float64))
    cfg = TreeConfig(max_leaf_n=32, ncrit=128, tile_chunk=16,
                     m2p_cap=16384, p2p_leaf_cap=8192, p2p_src_cap=65536,
                     farfield="grid2", local_order=6, grid_sep=3,
                     multipole_order=2, accum="compensated",
                     traversal_mode="lmac", kernel_backend="xla")
    a, _ = _query(pos, mass, cfg, 0.5)
    assert rms(rel_vec_err(a, acc_o)) < 2e-4


def test_lmac_bh_geom():
    n = 4096
    pos, mass = particles.plummer(jax.random.PRNGKey(11), n)
    acc_o, _ = direct.direct_acc_pot_np(np.asarray(pos, np.float64),
                                        np.asarray(mass, np.float64))
    cfg = BASE.with_(traversal_mode="lmac", mac="bh_geom")
    a, _ = _query(pos, mass, cfg, 0.75)
    # bh_geom tightens near-field acceptance; envelope well under bh 0.75
    assert rms(rel_vec_err(a, acc_o)) < 8e-3


def test_lmac_group_prefilter_identical():
    """The slice-level group pre-filter (traversal3.build_group_candidates)
    must be a pure superset pass: per-chunk sources built through the
    candidate table are IDENTICAL (masks, rows, cells) to the direct
    full-node-table pass, and the host driver (which groups per slice)
    matches the ungrouped engine."""
    from rakau_tpu import traversal3
    n = 8192
    pos, mass = particles.plummer(jax.random.PRNGKey(23), n)
    cfg = BASE.with_(traversal_mode="lmac", farfield="grid2",
                     local_order=3, grid_sep=2, grid_level=3,
                     frontier_cap=8192)
    td = build.build_tree(pos, mass, cfg)
    tiles = engine._gather_tiles(td, cfg)
    (tpos, tidx, blo, bhi, tcell), gx = engine._split_tiles(tiles)
    tpc, clo, chi = gx
    tabs = traversal3.make_tables(td, cfg)
    th = jnp.float32(0.7)
    D = blo.shape[-1]
    flat_valid = (tidx[..., 0] < n).reshape(-1)
    cand = traversal3.build_group_candidates(
        td, cfg, th, blo.reshape(-1, D), bhi.reshape(-1, D), tabs,
        tile_valid=flat_valid, tcell_lo=clo.reshape(-1, D),
        tcell_hi=chi.reshape(-1, D))
    assert not bool(np.asarray(cand.overflow))
    for c in range(tpos.shape[0]):
        tv = tidx[c][:, 0] < n
        kw = dict(tables=tabs, tile_valid=tv, tcell_lo=clo[c],
                  tcell_hi=chi[c])
        s0 = traversal3.build_shared_sources(td, cfg, th, blo[c], bhi[c],
                                             **kw)
        s1 = traversal3.build_shared_sources(td, cfg, th, blo[c], bhi[c],
                                             cand=cand, **kw)
        np.testing.assert_array_equal(np.asarray(s0.mask),
                                      np.asarray(s1.mask))
        np.testing.assert_array_equal(np.asarray(s0.pos),
                                      np.asarray(s1.pos))
        np.testing.assert_array_equal(np.asarray(s0.mass),
                                      np.asarray(s1.mass))
        np.testing.assert_array_equal(np.asarray(s0.idx),
                                      np.asarray(s1.idx))
        np.testing.assert_array_equal(np.asarray(s0.cell),
                                      np.asarray(s1.cell))

    # engine level: host driver (grouped per slice) vs acc_pot_u
    a_g, p_g, _ = engine.acc_pot_u(td, cfg, th, jnp.float32(0.0))
    a_h, p_h, ovf, mx = engine.acc_pot_u_host(td, cfg, th,
                                              jnp.float32(0.0), 1.0,
                                              slice_chunks=4)
    assert not bool(np.asarray(ovf).any())
    np.testing.assert_allclose(np.asarray(a_h), np.asarray(a_g),
                               rtol=2e-6, atol=1e-7)
    assert int(np.asarray(mx)[2]) > 0          # group count surfaced


def test_lmac_bh_geom_guard_unbypassable():
    """VERDICT r2 item 6: direct engine callers (engine/LET/sharded/
    benchmarks) bypass Tree._query's theta check — traversal3 must clamp
    theta to the monotonicity bound 2/sqrt(D) itself, so bh_geom+lmac at
    any theta keeps the exact mass partition and equals the clamped-theta
    result bit for bit."""
    n = 4096
    pos, mass = particles.plummer(jax.random.PRNGKey(13), n)
    cfg = BASE.with_(traversal_mode="lmac", mac="bh_geom")
    td = build.build_tree(pos, mass, cfg)
    bound = 2.0 / np.sqrt(3.0)

    # engine path: theta far beyond the bound == theta at the bound
    a_big, p_big, ovf1 = engine.acc_pot_u(td, cfg, jnp.float32(5.0),
                                          jnp.float32(0.0))
    a_bnd, p_bnd, ovf2 = engine.acc_pot_u(td, cfg, jnp.float32(bound),
                                          jnp.float32(0.0))
    assert not bool(np.asarray(ovf1).any() or np.asarray(ovf2).any())
    np.testing.assert_array_equal(np.asarray(a_big), np.asarray(a_bnd))
    np.testing.assert_array_equal(np.asarray(p_big), np.asarray(p_bnd))

    # traversal level: mass partition stays exact above the bound
    tiles = engine._gather_tiles(td, cfg)
    (tpos, tidx, blo, bhi, tcell), _ = engine._split_tiles(tiles)
    tm = engine._traversal_mod(cfg)
    tabs = tm.make_tables(td, cfg)
    total = float(jnp.sum(mass))
    tv = tidx[0][:, 0] < n
    src = tm.build_shared_sources(td, cfg, jnp.float32(5.0), blo[0],
                                  bhi[0], tables=tabs, tile_cell=tcell[0],
                                  tile_valid=tv)
    ms = np.asarray(jnp.sum(
        jnp.where(src.mask, src.mass[None, :], 0.0), axis=1))
    np.testing.assert_allclose(ms[np.asarray(tv)], total, rtol=2e-5)

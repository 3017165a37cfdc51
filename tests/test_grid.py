"""Unit tests for the dense-grid stencil far field (grid.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rakau_tpu import build, engine, expansion, grid, particles
from rakau_tpu.config import TreeConfig



# Compile-bound integration tests (r4 test-fast pass: the whole
# not-slow suite measured ~54 min on the 1-core CI box, almost all
# XLA compile time). Full coverage runs under `make test`;
# tests/test_fast_smoke.py keeps a per-mode end-to-end net in fast.
import pytest

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("ndim", [2, 3])
def test_stencil_coverage_partition(ndim):
    """Every leaf-cell pair with sep >= 3 must be covered at EXACTLY one
    level by the stencil (the coverage proof in the module docstring);
    pairs with sep <= 2 must never be covered."""
    L0 = 3
    offs, bits = grid.stencil_offsets(ndim)
    offs_set = {tuple(o): int(b) for o, b in zip(offs, bits)}
    G = 1 << L0
    rng = np.random.default_rng(0)
    cells = np.stack(np.meshgrid(*[np.arange(G)] * ndim, indexing="ij"),
                     axis=-1).reshape(-1, ndim)
    # sample pairs (all pairs is 4096^2 in 3D; sample densely)
    ti = rng.integers(0, len(cells), 4000)
    si = rng.integers(0, len(cells), 4000)
    for t, s in zip(cells[ti], cells[si]):
        ncover = 0
        for l in range(2, L0 + 1):
            sh = L0 - l
            tt, ss = t >> sh, s >> sh
            o = ss - tt
            mc = np.max(np.abs(o))
            if not (3 <= mc <= 5):
                continue
            key = tuple(int(x) for x in o)
            if key not in offs_set:
                continue
            parity = sum(int(tt[d] & 1) << d for d in range(ndim))
            if (offs_set[key] >> parity) & 1:
                ncover += 1
        sep_leaf = np.max(np.abs(s - t))
        assert ncover == (1 if sep_leaf >= 3 else 0), (t, s, ncover)


def test_pyramid_binning(rng):
    n, L0, depth = 4096, 3, 10
    pos, mass = particles.uniform_cube(jax.random.PRNGKey(2), n)
    cfg = TreeConfig(max_depth=depth, max_leaf_n=16, ncrit=64,
                     farfield="grid", grid_level=L0)
    td = build.build_tree(pos, mass, cfg)
    pyr = grid.build_pyramid(td, 3, depth, L0)
    # direct binning oracle
    cells = np.asarray(particles.discretize(td.pos, td.box_size, depth))
    cl0 = cells >> (depth - L0)
    G = 1 << L0
    flat = (cl0[:, 0] * G + cl0[:, 1]) * G + cl0[:, 2]
    m_np = np.zeros(G ** 3)
    np.add.at(m_np, flat, np.asarray(td.mass))
    np.testing.assert_allclose(np.asarray(pyr.mass[L0]), m_np, rtol=2e-5,
                               atol=1e-12)
    # mass conserved up the pyramid
    for l in range(L0 + 1):
        np.testing.assert_allclose(float(jnp.sum(pyr.mass[l])),
                                   float(jnp.sum(td.mass)), rtol=1e-5)
    # weighted sums give the global COM at level 0
    com = np.asarray(pyr.wsum[0][0]) / float(pyr.mass[0][0])
    com_np = np.average(np.asarray(td.pos), axis=0,
                        weights=np.asarray(td.mass))
    np.testing.assert_allclose(com, com_np, atol=1e-5)


def test_dense_far_field_matches_direct_covered_sum(rng):
    """L2P of the dense far field at a cell center must equal the direct
    monopole sum over exactly the covered source cells (COM per cell)."""
    n, L0, depth = 2048, 3, 9
    pos, mass = particles.uniform_cube(jax.random.PRNGKey(4), n)
    cfg = TreeConfig(max_depth=depth, max_leaf_n=16, ncrit=64,
                     farfield="grid", grid_level=L0)
    td = build.build_tree(pos, mass, cfg)
    pyr = grid.build_pyramid(td, 3, depth, L0)
    L = grid.dense_far_field(pyr, 3, L0, td.box_size, 0.0, order=3)

    G = 1 << L0
    box = float(td.box_size)
    s = box / G
    mass_g = np.asarray(pyr.mass[L0]).reshape(G, G, G)
    w_g = np.asarray(pyr.wsum[L0]).reshape(G, G, G, 3)

    # pick a few target cells; evaluate expansion AT the center (s=0:
    # acc = P1, pot = -P0) vs the exact covered-pair monopole sum
    tcells = [(2, 3, 4), (0, 0, 0), (7, 7, 7), (4, 4, 4)]
    for tc in tcells:
        t = np.asarray(tc)
        center = (t + 0.5) * s - box / 2
        acc_e = np.zeros(3)
        pot_e = 0.0
        for ix in range(G):
            for iy in range(G):
                for iz in range(G):
                    m = mass_g[ix, iy, iz]
                    if m <= 0:
                        continue
                    src = np.asarray([ix, iy, iz])
                    # covered iff leaf separation >= 3 (coverage theorem)
                    if np.max(np.abs(src - t)) < 3:
                        continue
                    com = w_g[ix, iy, iz] / m
                    d = com - center
                    r = np.linalg.norm(d)
                    acc_e += m * d / r ** 3
                    pot_e -= m / r
        flat = (t[0] * G + t[1]) * G + t[2]
        Lc = L[flat][None]
        ctr = jnp.asarray(center, jnp.float32)[None]
        acc_l, pot_l = expansion.l2p(Lc, ctr, ctr[:, None, :], 1.0, 3)
        scale = max(np.linalg.norm(acc_e), 1e-12)
        assert np.linalg.norm(np.asarray(acc_l)[0, 0] - acc_e) < 5e-3 * scale + 1e-7, tc
        assert abs(float(pot_l[0, 0]) - pot_e) < 5e-3 * abs(pot_e) + 1e-7, tc


@pytest.mark.slow
def test_grid_mode_accuracy_vs_direct():
    """End-to-end: farfield='grid' stays inside the local-mode envelope.

    slow: two full engine compiles (~260 s on the 1-core CI box); the
    legacy 'grid' far field is diagnostic-only since grid2 (round 3)."""
    from rakau_tpu import direct
    n = 8192
    pos, mass = particles.plummer(jax.random.PRNGKey(6), n)
    acc_d, pot_d = direct.direct_acc_pot_np(np.asarray(pos),
                                            np.asarray(mass))
    base = TreeConfig(max_depth=12, max_leaf_n=16, ncrit=128,
                      tile_chunk=16, m2p_cap=8192, p2p_leaf_cap=4096,
                      p2p_src_cap=131072, frontier_cap=2048)
    errs = {}
    for ff in ("local", "grid"):
        cfg = base.with_(farfield=ff)
        td = build.build_tree(pos, mass, cfg)
        assert not bool(td.overflow)
        acc, pot, ovf = engine.acc_pot_u(td, cfg, 0.75, 0.0)
        assert not bool(np.asarray(ovf).any()), (ff, np.asarray(ovf))
        inv = np.asarray(td.inv_perm)
        a = np.asarray(acc)[inv]
        rel = np.linalg.norm(a - acc_d, axis=1) / np.linalg.norm(acc_d,
                                                                 axis=1)
        errs[ff] = float(np.sqrt(np.mean(rel ** 2)))
    assert errs["grid"] < max(1.5 * errs["local"], 2e-3), errs

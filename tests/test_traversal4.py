"""Global incidence walk (traversal4) vs the chunked union walk
(traversal2): identical per-tile M2P/leaf sets.

Compile-bound like the other integration files -> slow-marked; the r5
engine work builds on this equivalence.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rakau_tpu import build, engine, particles, traversal2, traversal4
from rakau_tpu.config import TreeConfig

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("farfield", ["m2p", "grid"])
def test_global_incidences_match_traversal2(farfield):
    n = 4096
    pos, mass = particles.plummer(jax.random.PRNGKey(5), n)
    cfg = TreeConfig(max_depth=9, max_leaf_n=16, ncrit=64, tile_chunk=8,
                     m2p_cap=65536, p2p_leaf_cap=65536, p2p_src_cap=8192,
                     frontier_cap=16384, farfield=farfield, grid_level=3)
    td = build.build_tree(pos, mass, cfg)
    th = jnp.float32(0.7)
    tiles = engine._gather_tiles(td, cfg)
    (tpos, tidx, blo, bhi, tcell), _ = engine._split_tiles(tiles)
    nch, C = tpos.shape[:2]
    G = nch * C
    flat_lo = blo.reshape(G, -1)
    flat_hi = bhi.reshape(G, -1)
    flat_cell = tcell.reshape(G, -1)
    flat_valid = (tidx[..., 0] < n).reshape(G)

    gl = traversal4.build_global_incidences(
        td, cfg, th, flat_lo, flat_hi, tile_valid=flat_valid,
        tcell_lo=flat_cell, tcell_hi=flat_cell)
    assert not bool(np.asarray(gl.overflow).any()), np.asarray(gl.maxima)

    m_t = np.asarray(gl.m2p_tile)
    m_n = np.asarray(gl.m2p_node)
    l_t = np.asarray(gl.leaf_tile)
    l_n = np.asarray(gl.leaf_node)
    # tile-major sortedness
    assert (np.diff(m_t) >= 0).all() and (np.diff(l_t) >= 0).all()

    tables = traversal2.make_tables(td, cfg)
    for c in range(nch):
        src = traversal2.build_shared_sources(
            td, cfg, th, blo[c], bhi[c], tables=tables,
            tile_cell=tcell[c], tile_valid=(tidx[c][:, 0] < n))
        assert not bool(np.asarray(src.overflow).any())
        # per-tile M2P node sets from the union row + mask columns:
        # rows [0, m2p_cap) are nodes; recover ids via position match
        mask = np.asarray(src.mask)                      # [C, S]
        spos = np.asarray(src.pos)
        U = cfg.m2p_cap
        com = np.asarray(td.node_com)
        # node ids of the union rows: masses > 0 rows matched by COM
        # (exact float equality — the row IS a gather of node_com)
        for ti in range(C):
            g = c * C + ti
            if not flat_valid[g]:
                continue
            ref_rows = np.nonzero(mask[ti, :U])[0]
            ref_coms = {tuple(spos[r]) for r in ref_rows}
            got_nodes = m_n[(m_t == g) & (m_n >= 0)]
            got_coms = {tuple(com[v]) for v in got_nodes}
            assert got_coms == ref_coms, \
                f"tile {g}: m2p sets differ ({len(got_coms)} vs " \
                f"{len(ref_coms)})"
        # leaf sets via p2p particle indices
        sidx = np.asarray(src.idx)
        nb = np.asarray(td.node_begin)
        ne = np.asarray(td.node_end)
        for ti in range(C):
            g = c * C + ti
            if not flat_valid[g]:
                continue
            prt = set(sidx[U:][mask[ti, U:] & (sidx[U:] >= 0)])
            got_leaves = l_n[(l_t == g) & (l_n >= 0)]
            got_prt = set()
            for v in got_leaves:
                got_prt.update(range(nb[v], ne[v]))
            if farfield == "m2p":
                assert got_prt == prt, \
                    f"tile {g}: p2p particle sets differ"
            else:
                # gwalk emits WHOLE leaves; traversal2 additionally
                # drops stencil-covered particles of shallow leaves
                # per particle (the psep filter). The gwalk set must
                # be a superset whose extras are exactly covered.
                assert prt <= got_prt, f"tile {g}: gwalk lost particles"
                extra = got_prt - prt
                if extra:
                    from rakau_tpu import particles as pmod
                    L0 = 3
                    depth = cfg.max_depth
                    pc = np.asarray(pmod.discretize(
                        td.pos, td.box_size, depth),
                        np.int64) >> (depth - L0)
                    tc = np.asarray(flat_cell[g])
                    for p in extra:
                        sep = np.max(np.maximum(
                            np.maximum(pc[p] - tc, tc - pc[p]), 0))
                        assert sep >= 3, \
                            f"tile {g}: extra particle {p} not covered"


def test_pool_matches_shared_engine_physics():
    """gwalk incidences + block-aligned pool, evaluated naively per
    tile, reproduce the shared+m2p engine's accelerations (same MAC
    set, different summation order)."""
    from rakau_tpu import traversal4 as t4
    n = 2048
    pos, mass = particles.plummer(jax.random.PRNGKey(9), n)
    cfg = TreeConfig(max_depth=8, max_leaf_n=16, ncrit=64, tile_chunk=8,
                     m2p_cap=32768, p2p_leaf_cap=32768, p2p_src_cap=65536,
                     frontier_cap=8192, farfield="m2p")
    td = build.build_tree(pos, mass, cfg)
    th = jnp.float32(0.7)
    tiles = engine._gather_tiles(td, cfg)
    (tpos, tidx, blo, bhi, tcell), _ = engine._split_tiles(tiles)
    nch, C = tpos.shape[:2]
    G = nch * C
    fv = (tidx[..., 0] < n).reshape(G)
    gl = t4.build_global_incidences(
        td, cfg, th, blo.reshape(G, -1), bhi.reshape(G, -1),
        tile_valid=fv)
    assert not bool(np.asarray(gl.overflow).any())
    B = 128
    pool = t4.build_pool(td, gl, G, B, pool_cap=262144)
    assert not bool(np.asarray(pool.overflow))

    # the row-chunked expansion (the 8M OOM fix: lax.fori over row
    # windows) must be bit-identical to the straight-line path
    pool_c = t4.build_pool(td, gl, G, B, pool_cap=262144,
                           row_chunk=65536)
    np.testing.assert_array_equal(np.asarray(pool.idx),
                                  np.asarray(pool_c.idx))
    np.testing.assert_array_equal(np.asarray(pool.pos),
                                  np.asarray(pool_c.pos))
    np.testing.assert_array_equal(np.asarray(pool.mass),
                                  np.asarray(pool_c.mass))

    ppos = np.asarray(pool.pos, np.float64)
    pmass = np.asarray(pool.mass, np.float64)
    pidx = np.asarray(pool.idx)
    mb, mn_, pb, pn = (np.asarray(pool.m2p_blk), np.asarray(pool.m2p_nblk),
                       np.asarray(pool.p2p_blk), np.asarray(pool.p2p_nblk))
    tpos_f = np.asarray(tpos, np.float64).reshape(G, -1, 3)
    tidx_f = np.asarray(tidx).reshape(G, -1)

    acc_ref, _, ovf = jax.block_until_ready(
        engine.acc_pot_u(td, cfg, th, jnp.float32(0.0), 1.0))
    assert not bool(np.asarray(ovf).any())
    acc_ref = np.asarray(acc_ref, np.float64)

    for g in range(0, G, 7):
        if not fv[g]:
            continue
        rows = np.r_[mb[g] * B:(mb[g] + mn_[g]) * B,
                     pb[g] * B:(pb[g] + pn[g]) * B]
        sp, sm, si = ppos[rows], pmass[rows], pidx[rows]
        for k in range(0, tpos_f.shape[1], 13):
            i = tidx_f[g, k]
            if i >= n:
                continue
            d = sp - tpos_f[g, k]
            r2 = (d * d).sum(1)
            live = (sm > 0) & (si != i) & (r2 > 0)
            w3 = np.where(live, sm / np.maximum(r2, 1e-300) ** 1.5, 0.0)
            a = (w3[:, None] * d).sum(0)
            ref = acc_ref[i]
            dev = np.linalg.norm(a - ref) / max(np.linalg.norm(ref), 1e-30)
            assert dev < 5e-6, f"tile {g} tgt {i}: dev {dev:.2e}"

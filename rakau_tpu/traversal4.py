"""Global (tile, node) incidence walk — the r5 "gwalk" engine's front
half (PLAN.md r4 session 2).

The per-chunk engines re-walk the top of the tree for every chunk and
re-materialize per-chunk union rows + [C, S] masks; at 8M that is ~7 ms
of loop-context overhead per chunk against a 2 ms kernel. This module
walks ONCE per query over a global frontier of (tile, node) PAIRS:

  frontier_0 = {(t, root) : t valid}
  round:  expand each pair to the node's children, classify each
          (tile, child) with the same COM MAC (+ grid coverage drops)
          traversal2 uses, emit accepted pairs to the m2p incidence
          list, opened leaves to the leaf incidence list, and keep
          opened internal nodes as the next frontier.

Work is proportional to the ACTUAL pair population (dense 1-D ops, no
[C, K] panels over dead slots), and every list stays tile-major by
construction: the initial frontier is tile-sorted, expansion repeats
tiles in place, and compaction is stable — so per-round emissions
concatenate into round-major/tile-minor order that a single stable sort
by tile (or a counting pass) turns into per-tile segments for the pool
builder.

Capacity contract (same overflow/retry machinery as the chunk engines,
reusing the standard cap fields with global meaning):
  m2p_cap      : total (tile, node) M2P incidences
  p2p_leaf_cap : total (tile, leaf) open incidences
  frontier_cap : peak global frontier pairs
Overflow never truncates silently: flags ride the standard [4] vector.

Reference mapping (SURVEY.md C7): this is the level-synchronous
dual-tree interaction-list build (the GPU-BH lineage) replacing rakau's
per-thread recursive stacks; the chunk engines' walk-free/lmac variants
remain for the accuracy modes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import scan_utils as su
from .build import TreeData
from .config import TreeConfig, MAC_BH_GEOM
from .traversal2 import _grid_l0, _grid_sep

I32 = jnp.int32


class GlobalLists(NamedTuple):
    """Tile-sorted global incidence lists.

    m2p_tile/m2p_node [MCAP]: accepted (tile, node) pairs, sorted by
    tile (padding: tile == G_pad, node == -1). leaf_tile/leaf_node
    [LCAP]: opened (tile, leaf) pairs, likewise. counts/overflow: the
    standard contract.
    """
    m2p_tile: jnp.ndarray
    m2p_node: jnp.ndarray
    m2p_cnt: jnp.ndarray      # [] int32
    leaf_tile: jnp.ndarray
    leaf_node: jnp.ndarray
    leaf_cnt: jnp.ndarray     # [] int32
    overflow: jnp.ndarray     # [4] bool (m2p, leaf, unused, frontier)
    maxima: jnp.ndarray       # [4] int32 (m2p, leaf, 0, peak frontier)
    round_counts: jnp.ndarray = None  # [R+1] int32 open pairs after
                                      # each round (config.fit_round_caps
                                      # input for the unrolled walk)


def build_global_incidences(td: TreeData, cfg: TreeConfig, theta,
                            box_lo, box_hi, tile_valid=None,
                            tcell_lo=None, tcell_hi=None) -> GlobalLists:
    """One global walk over all G tiles (jittable; cfg static).

    box_lo/box_hi [G, D]: tile AABBs. tcell_lo/tcell_hi [G, D]: tile
    leaf-grid cell ranges (grid/grid2 coverage drops; optional).
    """
    G, D = box_lo.shape
    dtype = td.pos.dtype
    theta_inv = 1.0 / jnp.asarray(theta, dtype)
    n = td.pos.shape[0]
    M = td.node_level.shape[0]
    use_grid = cfg.farfield in ("grid", "grid2")
    L0 = _grid_l0(cfg, n) if use_grid else 0
    use_grid = use_grid and L0 > 0
    S_sep = _grid_sep(cfg)
    bh_geom = cfg.mac == MAC_BH_GEOM
    if tile_valid is None:
        tile_valid = jnp.ones((G,), bool)
    if tcell_lo is None and use_grid:
        raise ValueError("grid farfields need tile cell ranges")

    FCAP = cfg.frontier_cap
    MCAP = cfg.m2p_cap
    LCAP = cfg.p2p_leaf_cap
    k8 = 2 ** D
    R = cfg.max_depth + 1

    # Per-node and per-tile PACKED row tables: classify runs on [K]
    # pair batches and every operand it needs rides ONE row gather per
    # side (row gathers cost ~10 ns/row vs ~8 separate element gathers
    # at ~8 ns each — the packed tables took the 262k walk from 190 ms
    # to the pair-work floor; r5 attribution). Int columns are bitcast
    # into the f32 planes.
    size = td.box_size * jnp.exp2(-td.node_level.astype(dtype))
    sh = jnp.maximum(td.node_level - L0, 0)
    cpack = jnp.zeros(M, I32)
    if use_grid:
        for d in range(D):
            cpack = cpack | ((td.node_cell[:, d] >> sh) << (d * L0))
    delta = (td.node_delta if bh_geom
             else jnp.zeros(M, dtype))
    lvl_leaf = td.node_level + 64 * td.node_is_leaf.astype(I32)

    # Int columns are stored as exact float VALUES, not bitcasts: the
    # packed ints are all < 2^24 (lvl|leaf <= 127; cellpack <= 2^(D*L0)
    # <= 2^21; cells <= 2^L0), and raw int32 bit patterns bitcast into
    # f32 planes are DENORMALS that the TPU flushes to zero inside the
    # fused gather (measured: every lvl read back 0 -> no node with
    # lvl >= L0 ever accepted -> the walk died in 4 rounds).
    def _f(x):
        return x.astype(jnp.float32)

    # ntab [M, 8]: com(D), mass, size, delta, lvl|leaf, cellpack
    ntab = jnp.concatenate(
        [td.node_com, td.node_mass[:, None], size[:, None],
         delta[:, None], _f(lvl_leaf)[:, None], _f(cpack)[:, None]],
        axis=1)
    # ttab [G, 4 + 2D(+2D grid)]: box lo(D), hi(D), cell lo(D), hi(D)
    tcols = [box_lo, box_hi]
    if use_grid:
        tcols += [_f(tcell_lo), _f(tcell_hi)]
    ttab = jnp.concatenate(tcols, axis=1)

    def _i(col):
        return col.astype(I32)

    def classify(tiles, nodes, pvalid):
        """[K] pairs -> (accept, open_leaf, open_internal) bools."""
        nid = jnp.where(pvalid, nodes, 0)
        tid = jnp.where(pvalid, tiles, 0)
        nrow = ntab[nid]                                # [K, 8]
        trow = ttab[tid]                                # [K, >=2D]
        com = nrow[:, :D]
        mass = nrow[:, D]
        lo = trow[:, :D]
        hi = trow[:, D:2 * D]
        d = jnp.maximum(jnp.maximum(lo - com, com - hi), 0.0)
        d2 = jnp.sum(d * d, axis=-1)
        thresh = nrow[:, D + 1] * theta_inv + (nrow[:, D + 2]
                                               if bh_geom else 0.0)
        acc = d2 > thresh * thresh
        ll = _i(nrow[:, D + 3])
        lvl = ll & 63
        leaf = ll >= 64
        use = pvalid & (mass > 0)
        if use_grid:
            sh_t = jnp.maximum(L0 - lvl, 0)
            fmask = (1 << L0) - 1
            cp = _i(nrow[:, D + 4])
            sep = None
            for dd in range(D):
                nc = (cp >> (dd * L0)) & fmask
                tl = _i(trow[:, 2 * D + dd]) >> sh_t
                th = _i(trow[:, 3 * D + dd]) >> sh_t
                sd = jnp.maximum(jnp.maximum(nc - th, tl - nc), 0)
                sep = sd if sep is None else jnp.maximum(sep, sd)
            use = use & (sep < S_sep)                   # covered -> drop
            acc = acc & (lvl >= L0)
        accepted = acc & use
        opened = (~acc) & use
        return accepted, opened & leaf, opened & ~leaf

    def emit(buf_t, buf_n, off, cap, sel, tiles, nodes):
        """Scatter selected pairs at off..off+cnt into (buf_t, buf_n)
        (dump row at cap for overflow/unselected). Returns new off."""
        csum = jnp.cumsum(sel.astype(I32))
        cnt = csum[-1]
        pos = jnp.where(sel, off + csum - 1, cap)
        pos = jnp.minimum(pos, cap)
        buf_t = buf_t.at[pos].set(jnp.where(sel, tiles, buf_t[cap]),
                                  mode="drop")
        buf_n = buf_n.at[pos].set(jnp.where(sel, nodes, buf_n[cap]),
                                  mode="drop")
        return buf_t, buf_n, off + cnt

    ctab = jnp.stack([td.node_child_begin, td.node_child_count], axis=1)

    def expand_round(ft, fn, fc, in_cap, mt, mn, m_off, lt, ln, l_off):
        """Expand a [in_cap] frontier to children, classify, emit."""
        fvalid = jnp.arange(in_cap, dtype=I32) < fc
        nid = jnp.where(fvalid, fn, 0)
        crow = ctab[nid]                                # [F, 2]
        cb = crow[:, 0]
        cc = crow[:, 1]
        # expansion: [in_cap * k8] child pairs, tile-major preserved
        kids = (cb[:, None] + jnp.arange(k8, dtype=I32)).reshape(-1)
        ktile = jnp.repeat(ft, k8)
        kval = ((jnp.arange(k8, dtype=I32)[None, :] < cc[:, None])
                .reshape(-1) & jnp.repeat(fvalid, k8))
        accs, leafs, opens = classify(ktile, kids, kval)
        mt, mn, m_off = emit(mt, mn, m_off, MCAP, accs, ktile, kids)
        lt, ln, l_off = emit(lt, ln, l_off, LCAP, leafs, ktile, kids)
        return opens, ktile, kids, mt, mn, m_off, lt, ln, l_off

    def compact(opens, tiles_arr, nodes_arr, cap):
        """Compact open pairs into a [cap] frontier; returns true count
        (may exceed cap — overflow accounting at the caller)."""
        K = opens.shape[0]
        idx, cnt = su.compact_indices(opens, cap)
        iv = idx < K
        ic = jnp.clip(idx, 0, K - 1)
        ft = jnp.where(iv, tiles_arr[ic], 0)
        fn = jnp.where(iv, nodes_arr[ic], 0)
        return ft, fn, jnp.minimum(cnt, cap), cnt

    mt = jnp.full(MCAP + 1, G, I32)
    mn = jnp.full(MCAP + 1, -1, I32)
    lt = jnp.full(LCAP + 1, G, I32)
    ln = jnp.full(LCAP + 1, -1, I32)
    rcaps = cfg.gwalk_round_caps

    if rcaps is not None:
        # ---- statically unrolled, per-round-capped rounds ----------
        # The while_loop path below pays FCAP*k8-shaped work at EVERY
        # round regardless of the actual frontier population (the
        # padded-cap trap, r5 attribution: 563 ms of a 1.3 s query at
        # 262k). With fitted per-round caps (config.fit_round_caps on
        # GlobalLists.round_counts) each round's shapes match its real
        # frontier; trailing rounds whose fitted cap is absent are
        # statically absent. Any round's true count above its cap (or
        # leftover opens after the last round) flags frontier overflow
        # -> the standard grow/refit retry.
        tiles0 = jnp.arange(G, dtype=I32)
        nodes0 = jnp.zeros(G, I32)
        acc0, leaf0, open0 = classify(tiles0, nodes0, tile_valid)
        mt, mn, m_off = emit(mt, mn, jnp.zeros((), I32), MCAP, acc0,
                             tiles0, nodes0)
        lt, ln, l_off = emit(lt, ln, jnp.zeros((), I32), LCAP, leaf0,
                             tiles0, nodes0)
        K = min(len(rcaps), R - 1)
        counts = []
        ft, fn, fc, cnt0 = compact(open0, tiles0, nodes0,
                                   rcaps[0] if K else 1)
        counts.append(cnt0)
        f_ovf = cnt0 > (rcaps[0] if K else 0)
        f_peak = cnt0
        for r in range(1, K + 1):
            in_cap = rcaps[r - 1]
            (opens, ktile, kids, mt, mn, m_off,
             lt, ln, l_off) = expand_round(ft, fn, fc, in_cap,
                                           mt, mn, m_off, lt, ln, l_off)
            out_cap = rcaps[r] if r < K else 1
            ft, fn, fc, cnt = compact(opens, ktile, kids, out_cap)
            counts.append(cnt)
            f_peak = jnp.maximum(f_peak, cnt)
            f_ovf = f_ovf | (cnt > (rcaps[r] if r < K else 0))
        round_counts = jnp.zeros(R + 1, I32)
        round_counts = round_counts.at[jnp.arange(len(counts))].set(
            jnp.stack(counts))
    else:
        # ---- dynamic while_loop (the tuning/reference path) --------
        # round 0: (tile, root) for every valid tile (tile-major by
        # construction: arange order)
        f_tile0 = jnp.arange(FCAP, dtype=I32) % jnp.maximum(G, 1)
        f_node0 = jnp.zeros(FCAP, I32)
        fvalid0 = (jnp.arange(FCAP) < G) & tile_valid[
            jnp.minimum(jnp.arange(FCAP), G - 1)]
        acc0, leaf0, open0 = classify(f_tile0, f_node0, fvalid0)
        mt, mn, m_off = emit(mt, mn, jnp.zeros((), I32), MCAP, acc0,
                             f_tile0, f_node0)
        lt, ln, l_off = emit(lt, ln, jnp.zeros((), I32), LCAP, leaf0,
                             f_tile0, f_node0)
        frontier_t, frontier_n, f_cnt, cnt0 = compact(
            open0, f_tile0, f_node0, FCAP)
        # peak includes the G-pair root frontier (flags G > FCAP)
        f_peak = jnp.maximum(cnt0, jnp.asarray(G, I32))
        rc0 = jnp.zeros(R + 1, I32).at[0].set(cnt0)

        def round_body(carry):
            (r, ft, fn, fc, mt, mn, m_off, lt, ln, l_off, f_peak,
             rcnt) = carry
            (opens, ktile, kids, mt, mn, m_off,
             lt, ln, l_off) = expand_round(ft, fn, fc, FCAP,
                                           mt, mn, m_off, lt, ln, l_off)
            ft, fn, fc, cnt = compact(opens, ktile, kids, FCAP)
            return (r + 1, ft, fn, fc, mt, mn, m_off,
                    lt, ln, l_off, jnp.maximum(f_peak, cnt),
                    rcnt.at[r].set(cnt))

        carry = (jnp.ones((), I32), frontier_t, frontier_n, f_cnt,
                 mt, mn, m_off, lt, ln, l_off, f_peak, rc0)
        carry = jax.lax.while_loop(
            lambda c: (c[0] < R) & (c[3] > 0), round_body, carry)
        (_, _, _, _, mt, mn, m_off, lt, ln, l_off, f_peak,
         round_counts) = carry
        f_ovf = f_peak > FCAP

    # tile-major segments: per-round emissions are tile-sorted but the
    # concatenation is round-major — one stable sort by tile finishes it
    # (key and payload come out of the SAME sort; a second jnp.sort of
    # the key was pure waste)
    mkey = jnp.where(jnp.arange(MCAP + 1) < m_off, mt, G)[:MCAP]
    mt_s, mn_s = jax.lax.sort((mkey, mn[:MCAP]), num_keys=1)
    lkey = jnp.where(jnp.arange(LCAP + 1) < l_off, lt, G)[:LCAP]
    lt_s, ln_s = jax.lax.sort((lkey, ln[:LCAP]), num_keys=1)

    ovf = jnp.stack([m_off > MCAP, l_off > LCAP,
                     jnp.zeros((), bool), f_ovf])
    mx = jnp.stack([m_off, l_off, jnp.zeros((), I32), f_peak])
    return GlobalLists(m2p_tile=mt_s, m2p_node=jnp.where(mt_s < G, mn_s, -1),
                       m2p_cnt=jnp.minimum(m_off, MCAP),
                       leaf_tile=lt_s,
                       leaf_node=jnp.where(lt_s < G, ln_s, -1),
                       leaf_cnt=jnp.minimum(l_off, LCAP),
                       overflow=ovf, maxima=mx,
                       round_counts=round_counts)


class GlobalPool(NamedTuple):
    """Block-aligned per-tile source pool (the gwalk engine's kernel
    feed; PLAN.md r4 session 2).

    Every tile owns two contiguous BLOCK-ALIGNED segments in the flat
    pool: its M2P node rows, then its expanded P2P particle rows.
    Padding rows carry mass 0 / idx -1 / far sentinel positions, so a
    kernel that streams whole blocks adds exactly nothing for them.

    pos [P, D] / mass [P] / idx [P] : kernel source planes (idx = -1
    for node rows and padding — the standard self-exclusion contract).
    quad [P, Q] (multipole_order=2 only): raw second moments of the
    node rows (zero for particle/padding rows).
    m2p_blk/m2p_nblk [G]  : first block id / block count per tile.
    p2p_blk/p2p_nblk [G]  : likewise for the particle segment.
    p2p_cnt [] / overflow : total expanded particle rows vs its cap
                            (cfg.p2p_src_cap, global meaning).
    total_rows []         : blocks used * block (pool-cap fitting).
    """
    pos: jnp.ndarray
    mass: jnp.ndarray
    idx: jnp.ndarray
    m2p_blk: jnp.ndarray
    m2p_nblk: jnp.ndarray
    p2p_blk: jnp.ndarray
    p2p_nblk: jnp.ndarray
    p2p_cnt: jnp.ndarray
    overflow: jnp.ndarray     # [] bool (pool capacity)
    total_rows: jnp.ndarray = None   # [] int32
    quad: jnp.ndarray = None  # [P, Q] or None


def build_pool(td: TreeData, gl: GlobalLists, G: int, block: int,
               pool_cap: int, sentinel=None, window_blocks: int = 0,
               pcell=None, tcell_lo=None, tcell_hi=None, sep: int = 0,
               quad_dim: int = 0, cell_bits: int = 0,
               group: int = 1, row_chunk: int = 4 * 1048576
               ) -> GlobalPool:
    """Materialize the block-aligned source pool from tile-sorted
    incidence lists (jittable; G, block, pool_cap static).

    pool_cap: total pool rows (block-aligned per-tile segments; size it
    ~ (m2p + p2p incidences) + 2 * G * block/2 alignment slack).

    window_blocks > 0: pack segments so no tile's (m2p + p2p) block run
    straddles a window_blocks boundary — the pool kernel keeps one
    [window_blocks * block]-row window VMEM-resident per tile and whole
    windows are shared by consecutive tiles (Mosaic skips the refetch).
    A tile wider than a window flags overflow (grow p2p_src_cap /
    window) rather than truncating.

    pcell [N, D] + tcell_lo/tcell_hi [G, D] + sep > 0 (farfield='grid'):
    expanded P2P particle rows whose leaf-grid Chebyshev separation
    from the owning tile's cell range is >= sep are zeroed — they are
    covered by the dense stencil far field (the per-particle psep
    filter of the chunk engines, traversal2; without this, shallow
    opened leaves would double-count covered matter).

    quad_dim > 0 (multipole_order=2): node rows carry td.node_quad in
    a [P, quad_dim] plane set (particle rows zero).

    cell_bits: bits per dimension of the leaf-grid cell coordinates
    (= L0; required when sep > 0 — cells are bit-packed into single
    int32 columns of the row tables)."""
    dtype = td.pos.dtype
    n = td.pos.shape[0]
    D = td.pos.shape[1]
    if sentinel is None:
        sentinel = jnp.asarray(4.0, dtype) * td.box_size
    MCAP = gl.m2p_tile.shape[0]
    LCAP = gl.leaf_tile.shape[0]

    # ---- per-tile counts via boundaries in the tile-sorted lists ----
    def seg_bounds(tiles_arr):
        # first index of each tile t in the sorted array (G+1 fences)
        return jnp.searchsorted(tiles_arr, jnp.arange(G + 1),
                                side="left").astype(I32)

    mb = seg_bounds(gl.m2p_tile)                    # [G+1]
    m_cnt = mb[1:] - mb[:-1]                        # [G]

    # p2p rows per tile = sum of leaf sizes over its leaf incidences
    lsz = jnp.where(gl.leaf_node >= 0,
                    td.node_end[jnp.maximum(gl.leaf_node, 0)]
                    - td.node_begin[jnp.maximum(gl.leaf_node, 0)], 0)
    lb_fence = seg_bounds(gl.leaf_tile)             # [G+1]
    lcum = jnp.concatenate([jnp.zeros(1, I32),
                            jnp.cumsum(lsz.astype(I32))])
    p_cnt = lcum[lb_fence[1:]] - lcum[lb_fence[:-1]]  # [G]

    # ---- block-aligned segment offsets ----
    m_nblk = -(-m_cnt // block)
    p_nblk = -(-p_cnt // block)
    tile_blocks = m_nblk + p_nblk
    win_ovf = jnp.zeros((), bool)
    if window_blocks:
        # Scan-free window packing: pack the plain cumsum offsets into
        # VIRTUAL windows of wb' = wb - TBmax blocks and place virtual
        # window v at physical offset v*wb. A GROUP starting inside its
        # virtual window extends at most TBmax blocks past its end, so
        # its physical run ends <= wb — no group straddles a physical
        # window and no sequential scan is needed (the r5 greedy
        # lax.scan cost ~G scalar steps per query). Waste is bounded by
        # TBmax/wb (25%) of pool rows. Groups wider than TBmax flag
        # overflow (raise pool_window), never truncate.
        #
        # Packing is GROUP-granular (`group` consecutive tiles): the
        # pool kernel evaluates a whole group per grid step against one
        # VMEM-resident window, so all of a group's segments must share
        # that window (kernels/pallas._pool_kernel).
        wb = window_blocks
        tbmax = max(1, wb // 4)
        wbp = wb - tbmax
        gp = max(1, int(group))
        NGp = -(-G // gp)
        tb_g = jnp.pad(tile_blocks, (0, NGp * gp - G)).reshape(NGp, gp)
        within = jnp.cumsum(tb_g, axis=1) - tb_g       # excl prefix
        gb = jnp.sum(tb_g, axis=1)                     # [NG] group blocks
        win_ovf = jnp.any(gb > tbmax)
        off = jnp.concatenate([jnp.zeros(1, I32),
                               jnp.cumsum(gb)])        # [NG+1] excl
        v = off[:-1] // wbp
        g_start = v * wb + (off[:-1] - v * wbp)        # [NG]
        m2p_blk = (g_start[:, None] + within).reshape(-1)[:G]
        end = jnp.where(G > 0, g_start[NGp - 1] + gb[NGp - 1],
                        jnp.zeros((), I32))
    else:
        blk_off = jnp.concatenate([jnp.zeros(1, I32),
                                   jnp.cumsum(tile_blocks)])  # [G+1]
        m2p_blk = blk_off[:-1]
        end = blk_off[-1]
    p2p_blk = m2p_blk + m_nblk
    total_rows = end * block
    overflow = (total_rows > pool_cap) | win_ovf

    # ---- scatter M2P node rows ----
    # position of incidence i (tile t, rank r) = m2p_blk[t]*B + r
    m_t = jnp.clip(gl.m2p_tile, 0, G - 1)
    ranks = jnp.arange(MCAP, dtype=I32) - mb[m_t]
    valid_m = gl.m2p_node >= 0
    pos_m = jnp.where(valid_m, m2p_blk[m_t] * block + ranks, pool_cap)
    pos_m = jnp.minimum(pos_m, pool_cap)
    nid = jnp.maximum(gl.m2p_node, 0)
    pool_pos = jnp.full((pool_cap + 1, D), sentinel, dtype)
    pool_mass = jnp.zeros(pool_cap + 1, dtype)
    pool_idx = jnp.full(pool_cap + 1, -1, I32)
    pool_pos = pool_pos.at[pos_m].set(
        jnp.where(valid_m[:, None], td.node_com[nid], sentinel))
    pool_mass = pool_mass.at[pos_m].set(
        jnp.where(valid_m, td.node_mass[nid], 0.0))
    pool_quad = None
    if quad_dim:
        pool_quad = jnp.zeros((pool_cap + 1, quad_dim), dtype)
        pool_quad = pool_quad.at[pos_m].set(
            jnp.where(valid_m[:, None], td.node_quad[nid], 0.0))

    # ---- expand leaf incidences to particle rows ----
    # leaf incidence j (tile t) starts at p2p_blk[t]*B + (lcum[j] -
    # lcum[first leaf of t]); its particles are node_begin..end.
    # Everything a pool row needs rides TWO row gathers: a per-leaf-
    # incidence int table (start, size, node_begin, owning tile's
    # packed cell range) and a per-particle table (pos, mass, packed
    # cell) — vs the 8 separate [P]-space element gathers of the first
    # cut (the 262k pool build measured 737 ms; row-gather packing is
    # the same ~15 ns/row a single gather costs).
    PCAP = pool_cap  # expansion bounded by the pool itself
    l_t = jnp.clip(gl.leaf_tile, 0, G - 1)
    l_start = (p2p_blk[l_t] * block
               + (lcum[:-1] - lcum[lb_fence[l_t]]))   # [LCAP]
    valid_l = gl.leaf_node >= 0
    use_cov = bool(sep) and pcell is not None
    Lb = int(cell_bits)
    fmask = (1 << Lb) - 1 if Lb else 0

    def _pack_cells(c):
        p = jnp.zeros(c.shape[0], I32)
        for d in range(D):
            p = p | (c[:, d] << (d * Lb))
        return p

    nb_leaf = td.node_begin[jnp.maximum(gl.leaf_node, 0)]
    lcols = [l_start, lsz.astype(I32), nb_leaf]
    if use_cov:
        lcols += [_pack_cells(tcell_lo[l_t]), _pack_cells(tcell_hi[l_t])]
    ltab = jnp.stack(lcols, axis=1)                   # [LCAP, 3|5]
    # per-particle packed planes: pos(D), mass (+ packed cell bitcast)
    pcols = [td.pos, td.mass[:, None]]
    if use_cov:
        # exact float VALUE (packed cells < 2^24), never a bitcast —
        # int32 bit patterns are denormals the TPU flushes to zero
        pcols.append(_pack_cells(pcell).astype(dtype)[:, None])
    ptab = jnp.concatenate(pcols, axis=1)             # [N, D+1(+1)]

    # row-of-particle expansion over the pool index space: mark leaf
    # starts, cummax to propagate (start, leaf id) to each row slot.
    # The expansion itself runs CHUNKED over the row space (lax.map +
    # dynamic-update-slice): the straight-line form keeps ~25 [P]-sized
    # temporaries live and OOMed the 8M tune at 47.5 GB; per-chunk the
    # live set is O(row_chunk) beside the pool planes themselves.
    # scatter per-leaf (start row -> leaf ordinal+1), then cummax
    marks = jnp.zeros(pool_cap + 1, I32)
    lpos = jnp.where(valid_l & (lsz > 0), jnp.minimum(l_start, pool_cap),
                     pool_cap)
    marks = marks.at[lpos].max(jnp.arange(LCAP, dtype=I32) + 1)
    lead = jax.lax.cummax(marks[:pool_cap])          # leaf ordinal + 1

    RC = min(pool_cap, max(int(row_chunk), 1))
    n_rc = -(-pool_cap // RC)

    def expand_rows(s0, lead_c):
        """Rows [s0, s0+RC): (pos [RC, D], mass, idx) particle rows
        (dead rows keep sentinel/0/-1 and the merge below preserves the
        node scatter)."""
        kq = s0 + jnp.arange(RC, dtype=I32)
        has = lead_c > 0
        lo_ = jnp.maximum(lead_c - 1, 0)
        lrow = ltab[lo_]                              # [RC, 3|5]
        within = kq - lrow[:, 0]
        inleaf = has & (within >= 0) & (within < lrow[:, 1])
        pidx = jnp.where(inleaf, lrow[:, 2] + within, -1)
        pidx_c = jnp.clip(pidx, 0, n - 1)
        prow = ptab[pidx_c]                           # [RC, D+1(+1)]
        if use_cov:
            # stencil-coverage drop (farfield='grid'/'grid2'):
            # particle's L0-cell Chebyshev separation from the owning
            # tile's cell range >= sep means the dense far field
            # covers this pair
            pc_pk = prow[:, D + 1].astype(I32)
            cov = None
            for d in range(D):
                pc = (pc_pk >> (d * Lb)) & fmask
                tl = (lrow[:, 3] >> (d * Lb)) & fmask
                th = (lrow[:, 4] >> (d * Lb)) & fmask
                sd = jnp.maximum(jnp.maximum(pc - th, tl - pc), 0)
                cov = sd if cov is None else jnp.maximum(cov, sd)
            inleaf = inleaf & (cov < sep)
        return (inleaf, jnp.where(inleaf[:, None], prow[:, :D], sentinel),
                jnp.where(inleaf, prow[:, D], 0.0),
                jnp.where(inleaf, pidx, -1))

    if n_rc == 1:
        inleaf, prow_pos, prow_mass, pidx = expand_rows(
            jnp.zeros((), I32), lead)
        pool_pos = jnp.where(inleaf[:, None], prow_pos,
                             pool_pos[:pool_cap])
        pool_mass = jnp.where(inleaf, prow_mass, pool_mass[:pool_cap])
        pool_idx = jnp.where(inleaf, pidx, pool_idx[:pool_cap])
    else:
        pad_rc = n_rc * RC - pool_cap
        lead_p = jnp.pad(lead, (0, pad_rc))
        pool_pos = jnp.pad(pool_pos[:pool_cap], ((0, pad_rc), (0, 0)))
        pool_mass = jnp.pad(pool_mass[:pool_cap], (0, pad_rc))
        pool_idx = jnp.pad(pool_idx[:pool_cap], (0, pad_rc),
                           constant_values=-1)

        def chunk_body(c, bufs):
            bpos, bmass, bidx = bufs
            s0 = c * RC
            lead_c = jax.lax.dynamic_slice(lead_p, (s0,), (RC,))
            inleaf, cpos, cmass, cidx = expand_rows(s0, lead_c)
            old_pos = jax.lax.dynamic_slice(bpos, (s0, 0), (RC, D))
            old_mass = jax.lax.dynamic_slice(bmass, (s0,), (RC,))
            old_idx = jax.lax.dynamic_slice(bidx, (s0,), (RC,))
            bpos = jax.lax.dynamic_update_slice(
                bpos, jnp.where(inleaf[:, None], cpos, old_pos), (s0, 0))
            bmass = jax.lax.dynamic_update_slice(
                bmass, jnp.where(inleaf, cmass, old_mass), (s0,))
            bidx = jax.lax.dynamic_update_slice(
                bidx, jnp.where(inleaf, cidx, old_idx), (s0,))
            return bpos, bmass, bidx

        pool_pos, pool_mass, pool_idx = jax.lax.fori_loop(
            0, n_rc, chunk_body, (pool_pos, pool_mass, pool_idx))
        pool_pos = pool_pos[:pool_cap]
        pool_mass = pool_mass[:pool_cap]
        pool_idx = pool_idx[:pool_cap]
    if quad_dim:
        pool_quad = pool_quad[:pool_cap]

    return GlobalPool(pos=pool_pos, mass=pool_mass, idx=pool_idx,
                      m2p_blk=m2p_blk, m2p_nblk=m_nblk,
                      p2p_blk=p2p_blk, p2p_nblk=p_nblk,
                      p2p_cnt=lcum[-1],
                      overflow=overflow | (lcum[-1] > PCAP),
                      total_rows=total_rows, quad=pool_quad)

"""Query engine: tree + per-call (theta, eps, G) -> accelerations/potentials.

This is the TPU-native equivalent of the reference's `accs_pots_impl`
dispatch (`tree.hpp`, SURVEY.md §4.2): instead of TBB-parallel DFS per
critical node + CUDA thread-per-target stacks, target tiles are processed in
fixed-size chunks — each chunk runs the batched traversal
(traversal.build_interaction_lists), gathers its M2P/P2P sources into dense
padded arrays, and evaluates the pairwise kernel. `lax.map` sequences the
chunks so peak memory is bounded by one chunk's padded lists regardless of N.

Results are produced in internal Morton order (the `_u` view); ordering back
to user order (`_o`) is a gather by inv_perm at the API layer (SURVEY.md C9).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from . import traversal
from . import scan_utils as su
from .build import TreeData
from .config import TreeConfig

I32 = jnp.int32


def _use_shared(cfg: TreeConfig) -> bool:
    """Shared-candidate traversal applies ("shared" union walk or "lmac"
    walk-free local MAC — both produce SharedSources). Quadrupole
    (multipole_order=2) rides the shared path for farfield 'm2p'/'grid2'
    (the M2P node rows carry their second moments into the kernels'
    quadrupole correction); with 'local'/'grid' far fields the tile-local
    Taylor expansions are monopole-sourced, so quadrupole falls back to
    the per-tile list traversal to keep its accuracy claim honest."""
    if cfg.traversal_mode not in ("shared", "lmac"):
        return False
    return cfg.multipole_order < 2 or cfg.farfield in ("m2p", "grid2")


def _traversal_mod(cfg: TreeConfig):
    if cfg.traversal_mode == "lmac":
        from . import traversal3
        return traversal3
    from . import traversal2
    return traversal2


def _gather_tiles(td: TreeData, cfg: TreeConfig):
    """Gather per-tile targets from the critical-node tile table.

    Tiles are the build's critical nodes (sub-tiled to <= ncrit particles,
    SURVEY.md C4); their particle ranges are contiguous in Morton order but
    variable-length, so targets are gathered by index with a count mask.
    Padding targets get index N (dropped on output scatter, never matching
    a source index).

    In grid2 mode three extra arrays ride along: per-target leaf-grid
    cells (the kernels' per-pair coverage operand) and the per-tile cell
    range [clo, chi] (the walk's conservative drop test operand) —
    tiles are NOT clipped at cell boundaries in grid2."""
    n, ndim = td.pos.shape
    T = cfg.ncrit
    TC = td.tile_begin.shape[0]
    CH = min(cfg.tile_chunk, TC)
    n_chunks = -(-TC // CH)
    pad = n_chunks * CH - TC
    big = jnp.asarray(jnp.finfo(td.pos.dtype).max, td.pos.dtype)
    tb = jnp.pad(td.tile_begin, (0, pad))
    tc = jnp.pad(td.tile_cnt, (0, pad))

    ar = jnp.arange(T, dtype=I32)
    idx = tb[:, None] + ar                      # [TCp, T]
    mask = ar < tc[:, None]
    safe = jnp.where(mask, idx, 0)
    tiles_pos = td.pos[safe]
    tiles_idx = jnp.where(mask, idx, n).astype(I32)
    # Tile AABBs from the gathered targets (empty tiles get an inverted
    # far box; they are excluded from the walk via tile_valid).
    tlo = jnp.min(jnp.where(mask[..., None], tiles_pos, big), axis=1)
    thi = jnp.max(jnp.where(mask[..., None], tiles_pos, -big), axis=1)
    tcell = jnp.pad(td.tile_cell, ((0, pad), (0, 0)))

    shape = (n_chunks, CH)
    out = (tiles_pos.reshape(shape + (T, ndim)),
           tiles_idx.reshape(shape + (T,)),
           tlo.reshape(shape + (ndim,)),
           thi.reshape(shape + (ndim,)),
           tcell.reshape(shape + (ndim,)))
    if cfg.farfield == "grid2" and cfg.traversal_mode != "gwalk":
        # gwalk needs no per-target cell planes: its tiles are cell-
        # clipped (build.py) so td.tile_cell already carries the test
        from . import grid2
        L0 = grid2.effective_grid_level(cfg, n)
        pcells = grid2.particle_cells(td.pos, td.box_size,
                                      cfg.max_depth, L0)       # [N, D]
        tpc = pcells[safe]                                     # [TCp,T,D]
        bigc = jnp.asarray(1 << 30, I32)
        clo = jnp.min(jnp.where(mask[..., None], tpc, bigc), axis=1)
        chi = jnp.max(jnp.where(mask[..., None], tpc, -1), axis=1)
        out = out + (tpc.reshape(shape + (T, ndim)),
                     clo.reshape(shape + (ndim,)),
                     chi.reshape(shape + (ndim,)))
    return out


def _gather_sources(td: TreeData, cfg: TreeConfig, il, dtype):
    """Interaction lists -> dense padded source arrays [C, S, ...].

    M2P entries are node COM/mass (+ quadrupole moments when enabled); P2P
    entries gather real particles with their Morton indices (for self
    exclusion). Padding gets a far-away sentinel position and zero mass so
    it contributes exactly nothing."""
    sentinel = jnp.asarray(4.0, dtype) * td.box_size

    mvalid = il.m2p_nodes >= 0
    mns = jnp.where(mvalid, il.m2p_nodes, 0)
    m_pos = jnp.where(mvalid[..., None], td.node_com[mns], sentinel)
    m_mass = jnp.where(mvalid, td.node_mass[mns], 0.0)
    if cfg.multipole_order >= 2:
        m_quad = jnp.where(mvalid[..., None], td.node_quad[mns], 0.0)
    else:
        m_quad = None

    pvalid = il.p2p_src >= 0
    pns = jnp.where(pvalid, il.p2p_src, 0)
    p_pos = jnp.where(pvalid[..., None], td.pos[pns], sentinel)
    p_mass = jnp.where(pvalid, td.mass[pns], 0.0)
    p_idx = jnp.where(pvalid, il.p2p_src, -1)
    return m_pos, m_mass, m_quad, p_pos, p_mass, p_idx


def _split_tiles(tiles):
    """(base 5-tuple, grid2 extras (tpcell, clo, chi) or None)."""
    if len(tiles) > 5:
        return tiles[:5], tiles[5:]
    return tiles, None


def _eval_chunk(td: TreeData, cfg: TreeConfig, theta, eps, G, dtype,
                tpos, tidx, blo, bhi, tables=None, tcell=None,
                Lgrid=None, extra=None, mode="both", tcells=None,
                cand=None, src=None):
    """Traversal + gather + kernel for one chunk of tiles (shared by the
    single-chip and sharded paths).

    extra: optional (pos [E, D], mass [E]) additional sources applied to
    every valid tile — the LET import path (parallel/let.py): remote
    macro-particles/boundary particles enter the same far/near gate as
    walk-accepted nodes (far -> tile local expansion, near -> kernel).

    tcells (grid2): (tgt_cell [C, T, D], tcell_lo [C, D], tcell_hi
    [C, D]) — per-target leaf cells for the kernels' per-pair coverage
    mask and the tile cell range for the walk's drop test. The grid2
    far field itself (per-particle L2P) is NOT added here; it is
    computed once per query outside the chunk loop."""
    from .kernels import dispatch  # late import to avoid cycles
    if _use_shared(cfg) and cfg.farfield == "grid2":
        traversal_mod = _traversal_mod(cfg)
        n = td.pos.shape[0]
        tvalid = tidx[:, 0] < n
        tpcell, clo, chi = tcells
        if src is None:
            kw = {"cand": cand} if cand is not None else {}
            src = traversal_mod.build_shared_sources(
                td, cfg, theta, blo, bhi, tables=tables,
                tile_valid=tvalid, tcell_lo=clo, tcell_hi=chi, **kw)
        src_pos, src_mass, src_idx = src.pos, src.mass, src.idx
        mask, cell = src.mask, src.cell
        if extra is not None:
            e_pos, e_mass = extra
            near_e = jnp.broadcast_to(
                tvalid[:, None], (tvalid.shape[0], e_pos.shape[0]))
            src_pos = jnp.concatenate([src_pos, e_pos], axis=0)
            src_mass = jnp.concatenate([src_mass, e_mass], axis=0)
            src_idx = jnp.concatenate(
                [src_idx, jnp.full(e_pos.shape[0], -1, I32)], axis=0)
            mask = jnp.concatenate([mask, near_e], axis=1)
            if cell is not None:
                # LET imports are remote mass absent from the local
                # pyramid: exempt from the coverage test (cell -1)
                cell = jnp.concatenate(
                    [cell, jnp.full((e_pos.shape[0], cell.shape[1]),
                                    -1, I32)], axis=0)
        acc, pot = dispatch.eval_shared(
            cfg, tpos, tidx, src_pos, src_mass, src_idx, mask, eps, G,
            mode=mode, src_cell=cell, tgt_cell=tpcell, src_quad=src.quad)
        return acc, pot, src.overflow, src.maxima
    if _use_shared(cfg):
        from . import expansion
        traversal_mod = _traversal_mod(cfg)
        n = td.pos.shape[0]
        tvalid = tidx[:, 0] < n
        if src is None:
            kw = {"cand": cand} if cand is not None else {}
            src = traversal_mod.build_shared_sources(
                td, cfg, theta, blo, bhi, tables=tables, tile_cell=tcell,
                tile_valid=tvalid, **kw)
        mask = src.mask
        acc_l = pot_l = None
        if cfg.farfield in ("local", "grid"):
            # Far/near gate on the M2P node rows (first m2p_cap entries):
            # far nodes collapse into per-tile local expansions (M2L+L2P,
            # expansion.py); near nodes stay on the per-particle kernel
            # path. Empty/padding tiles have inverted AABBs -> rad2 = inf
            # -> everything routes near and their L is exactly zero.
            U = cfg.m2p_cap
            center = 0.5 * (blo + bhi)
            rad2 = jnp.sum((0.5 * (bhi - blo)) ** 2, axis=-1)
            from . import expansion as _exp
            NC = _exp.n_coeffs(td.pos.shape[1], cfg.local_order)
            if cfg.local_gamma < 1e9:
                far, near = expansion.far_split(
                    center, rad2, src.pos[:U], src.mass[:U], mask[:, :U],
                    cfg.local_gamma)
                mask = jnp.concatenate([near, mask[:, U:]], axis=1)
                L = expansion.m2l(center, src.pos[:U], src.mass[:U],
                                  far, eps, cfg.local_order)
            else:
                # local_gamma >= 1e9 disables the per-chunk far/near
                # gate: every walk-accepted node stays on the kernel
                # path (the fused kernel runs at its roof, while the
                # [C, U, NC] m2l panel measured ~5 ms/chunk at 8M —
                # the dominant slice cost, r4 ablation). The grid
                # far-field inherit below still applies.
                L = jnp.zeros((center.shape[0], NC), dtype)
            if cfg.farfield == "grid" and Lgrid is not None:
                # inherit the dense stencil far field: leaf-grid cell
                # expansion recentred to the tile center
                from . import grid as gridmod
                ndim = td.pos.shape[1]
                L0 = gridmod.effective_grid_level(cfg, n)
                flat = gridmod.rowmajor_cell_index(tcell, ndim, L0)
                Lg = Lgrid[flat]                        # [C, NC]
                s0 = td.box_size * (2.0 ** -L0)
                ccenter = (tcell.astype(dtype) + 0.5) * s0 - td.box_size / 2
                shift = jnp.where(tvalid[:, None], center - ccenter, 0.0)
                L = L + jnp.where(
                    tvalid[:, None],
                    expansion.l2l(Lg, shift, cfg.local_order), 0.0)
            if extra is not None:
                e_pos, e_mass = extra
                far_e, near_e = expansion.far_split(
                    center, rad2, e_pos, e_mass,
                    jnp.broadcast_to(tvalid[:, None],
                                     (tvalid.shape[0], e_pos.shape[0])),
                    cfg.local_gamma)
                L = L + expansion.m2l(center, e_pos, e_mass, far_e,
                                      eps, cfg.local_order)
            acc_l, pot_l = expansion.l2p(L, center, tpos, G,
                                         cfg.local_order)
        src_pos, src_mass, src_idx = src.pos, src.mass, src.idx
        if extra is not None:
            if cfg.farfield == "m2p":
                near_e = jnp.broadcast_to(
                    tvalid[:, None], (tvalid.shape[0], extra[0].shape[0]))
            src_pos = jnp.concatenate([src_pos, extra[0]], axis=0)
            src_mass = jnp.concatenate([src_mass, extra[1]], axis=0)
            src_idx = jnp.concatenate(
                [src_idx, jnp.full(extra[0].shape[0], -1, I32)], axis=0)
            mask = jnp.concatenate([mask, near_e], axis=1)
        acc, pot = dispatch.eval_shared(
            cfg, tpos, tidx, src_pos, src_mass, src_idx, mask, eps, G,
            mode=mode, src_quad=src.quad)
        if acc_l is not None:
            acc = acc + acc_l
            pot = pot + pot_l
        # already aligned with (m2p_cap, p2p_leaf_cap, p2p_src_cap,
        # frontier_cap)
        return acc, pot, src.overflow, src.maxima
    il = traversal.build_interaction_lists(td, cfg, theta, blo, bhi)
    m_pos, m_mass, m_quad, p_pos, p_mass, p_idx = _gather_sources(
        td, cfg, il, dtype)
    acc, pot = dispatch.eval_tiles(
        cfg, tpos, tidx, m_pos, m_mass, m_quad, p_pos, p_mass, p_idx,
        eps, G, m2p_cnt=il.m2p_count, p2p_cnt=il.p2p_count)
    return acc, pot, il.overflow, il.maxima


def _gwalk_impl(td: TreeData, cfg: TreeConfig, theta, eps, G, tiles,
                Lgrid, mode: str = "both"):
    """gwalk query (traversal_mode='gwalk'): ONE global (tile, node)
    incidence walk (traversal4.build_global_incidences), ONE block-
    aligned source pool (build_pool, window-packed), ONE pool-kernel
    launch — no per-chunk re-walks, union masks, or materialization
    (the ~5 ms/chunk in-context cost that bounded the shared engine at
    8M, PLAN r4 wrap). Far field: 'm2p' needs nothing extra; 'grid'
    adds the dense stencil far field via per-tile L2L/L2P exactly like
    the chunk engine (the local_gamma far/near Taylor gate is NOT
    applied — every walk-accepted node rides the kernel, which is the
    gamma >= 1e9 configuration the 8M headline already uses).

    Returns (acc_u, pot_u, ovf[4], maxima[4]) in the standard cap
    order; in gwalk mode the caps have global meaning (config.py).

    farfield='grid2': tiles are cell-clipped at grid2's L0 (build.py),
    so the walk drop and pool-row psep filter are exactly the per-pair
    coverage tests of the chunk engines; the conv-M2L pyramid far field
    itself (grid2.far_field) is added by the CALLER once per query
    (acc_pot_u / acc_pot_u_host), mirroring the chunked path."""
    from . import traversal4
    from .kernels import dispatch
    n, ndim = td.pos.shape
    dtype = td.pos.dtype
    T = cfg.ncrit
    (tpos, tidx, blo, bhi, tcell), gx = _split_tiles(tiles)
    nc, CH = tpos.shape[:2]
    G0 = nc * CH
    tpos_f = tpos.reshape(G0, T, ndim)
    tidx_f = tidx.reshape(G0, T)
    blo_f = blo.reshape(G0, ndim)
    bhi_f = bhi.reshape(G0, ndim)
    tcell_f = tcell.reshape(G0, ndim)
    tvalid = tidx_f[:, 0] < n

    use_grid = cfg.farfield in ("grid", "grid2")
    kw = {}
    if use_grid:
        kw = dict(tcell_lo=tcell_f, tcell_hi=tcell_f)
    gl = traversal4.build_global_incidences(
        td, cfg, theta, blo_f, bhi_f, tile_valid=tvalid, **kw)

    block = cfg.pool_block
    W = cfg.pool_window
    Wb = W // block
    # whole-window pool: the kernel views the pool as [NW, Wb, block]
    # planes, so building it window-multiple avoids a full pad-copy of
    # every plane per query
    pool_cap = -(-cfg.p2p_src_cap // W) * W
    pkw = {}
    if use_grid:
        from . import traversal2 as _t2
        from .grid2 import particle_cells
        L0 = _t2._grid_l0(cfg, n)
        if L0 > 0:
            pkw = dict(pcell=particle_cells(td.pos, td.box_size,
                                            cfg.max_depth, L0),
                       tcell_lo=tcell_f, tcell_hi=tcell_f,
                       sep=_t2._grid_sep(cfg), cell_bits=L0)
    from .build import _quad_dim
    qd = _quad_dim(ndim) if cfg.multipole_order >= 2 else 0
    pool = traversal4.build_pool(td, gl, G0, block, pool_cap,
                                 window_blocks=Wb, quad_dim=qd,
                                 group=cfg.pool_group, **pkw)

    # the pool is already window-multiple; derive the per-tile schedule
    NW = pool_cap // W
    ppos = pool.pos[:pool_cap]
    pmass = pool.mass[:pool_cap]
    pidx = pool.idx[:pool_cap]
    pquad = pool.quad[:pool_cap] if qd else None
    # overflow-safe clamps (an overflowed pool flags + retries; the
    # clamped schedule just keeps the kernel's reads in bounds)
    win = jnp.clip(pool.m2p_blk // Wb, 0, NW - 1)
    start = jnp.clip(pool.m2p_blk - win * Wb, 0, Wb - 1)
    m_nb = jnp.clip(pool.m2p_nblk, 0, jnp.maximum(Wb - start, 0))
    p_nb = jnp.clip(pool.p2p_nblk, 0,
                    jnp.maximum(Wb - start - m_nb, 0))
    sched = jnp.stack([win, start, m_nb, p_nb], axis=1)

    acc, pot = dispatch.eval_pool(
        cfg, tpos_f, tidx_f, ppos, pmass, pidx, sched, W, block,
        eps, G, mode=mode, pool_quad=pquad)

    if use_grid and Lgrid is not None:
        from . import expansion, grid as gridmod
        L0 = gridmod.effective_grid_level(cfg, n)
        flat = gridmod.rowmajor_cell_index(tcell_f, ndim, L0)
        Lg = Lgrid[flat]                                 # [G0, NC]
        s0 = td.box_size * (2.0 ** -L0)
        ccenter = (tcell_f.astype(dtype) + 0.5) * s0 - td.box_size / 2
        center = 0.5 * (blo_f + bhi_f)
        shift = jnp.where(tvalid[:, None], center - ccenter, 0.0)
        L = jnp.where(tvalid[:, None],
                      expansion.l2l(Lg, shift, cfg.local_order), 0.0)
        acc_l, pot_l = expansion.l2p(L, center, tpos_f, G,
                                     cfg.local_order)
        if mode in ("both", "acc"):
            acc = acc + jnp.where(tvalid[:, None, None], acc_l, 0.0)
        if mode in ("both", "pot"):
            pot = pot + jnp.where(tvalid[:, None], pot_l, 0.0)

    acc_u, pot_u = _assemble_impl(td, cfg, acc, pot)
    # standard-order overflow/maxima (caps global in gwalk mode)
    ovf = jnp.stack([gl.overflow[0], gl.overflow[1],
                     pool.overflow, gl.overflow[3]])
    mx = jnp.stack([gl.maxima[0], pool.total_rows,
                    gl.maxima[3], gl.maxima[1]])
    return acc_u, pot_u, ovf, mx, gl.round_counts


def acc_pot_u(td: TreeData, cfg: TreeConfig, theta, eps, G=1.0,
              with_stats: bool = False, extra=None, mode: str = "both"):
    """Accelerations and potentials for all particles, Morton order.

    Returns (acc [N, D], pot [N], overflow [4] bool) and, with
    with_stats, a [4] int32 vector of max (m2p, p2p_src, frontier,
    p2p_leaf) counts for cap auto-tuning. Jittable; cfg static. extra: optional
    (pos [E, D], mass [E]) sources added to every tile (LET imports)."""
    n, ndim = td.pos.shape
    dtype = td.pos.dtype
    tiles = _gather_tiles(td, cfg)
    if cfg.traversal_mode == "gwalk":
        if extra is not None:
            raise NotImplementedError(
                "LET imports ride the shared/lmac engines, not gwalk")
        Lgrid = _grid_farfield(td, cfg, eps)
        acc_u, pot_u, ovf, mx, _rc = _gwalk_impl(td, cfg, theta, eps, G,
                                                 tiles, Lgrid, mode=mode)
        if cfg.farfield == "grid2":
            from . import grid2
            acc_f, pot_f = grid2.far_field(td, cfg, eps, G)
            acc_u = acc_u + acc_f
            pot_u = pot_u + pot_f
        if with_stats:
            return acc_u, pot_u, ovf, mx
        return acc_u, pot_u, ovf
    (tiles_pos, tiles_idx, box_lo, box_hi, tiles_cell), gx = \
        _split_tiles(tiles)
    tables = _make_tables(td, cfg)
    Lgrid = _grid_farfield(td, cfg, eps)

    def chunk_fn(args):
        if gx is not None:
            tpos, tidx, blo, bhi, tcell, tpc, clo, chi = args
            tcells = (tpc, clo, chi)
        else:
            tpos, tidx, blo, bhi, tcell = args
            tcells = None
        acc, pot, ovf, mx = _eval_chunk(td, cfg, theta, eps, G, dtype,
                                        tpos, tidx, blo, bhi,
                                        tables=tables, tcell=tcell,
                                        Lgrid=Lgrid, extra=extra,
                                        mode=mode, tcells=tcells)
        return acc, pot, tidx, ovf, mx

    acc, pot, tidx, ovf, mx = jax.lax.map(chunk_fn, tiles)
    # Particles are partitioned by tiles in Morton order, so results map
    # back by a monotone gather: particle i lives in the tile whose begin
    # is the last one <= i, at offset i - begin (scatter-free).
    TCp = tidx.shape[0] * tidx.shape[1]
    tb_padded = jnp.pad(td.tile_begin, (0, TCp - td.tile_begin.shape[0]),
                        constant_values=n)
    # searchsorted rightmost: first tile with begin > i, minus one
    p = jnp.arange(n, dtype=I32)
    t_of_p = su.searchsorted_1d(
        jnp.where(jnp.arange(TCp, dtype=I32) < td.n_tiles,
                  tb_padded, n), p + 1) - 1
    t_of_p = jnp.clip(t_of_p, 0, TCp - 1)
    off = p - tb_padded[jnp.clip(t_of_p, 0, td.tile_begin.shape[0] - 1)]
    off = jnp.clip(off, 0, cfg.ncrit - 1)
    T = cfg.ncrit
    acc_u = acc.reshape(-1, T, ndim)[t_of_p, off]
    pot_u = pot.reshape(-1, T)[t_of_p, off]
    if cfg.farfield == "grid2":
        # dense conv-M2L far field, per-particle L2P (grid2.py) — once
        # per query, outside the chunk loop
        from . import grid2
        acc_f, pot_f = grid2.far_field(td, cfg, eps, G)
        acc_u = acc_u + acc_f
        pot_u = pot_u + pot_f
    ovf4 = jnp.any(ovf, axis=0)  # [4]: m2p/p2p_leaf/p2p_src/frontier
    if with_stats:
        return acc_u, pot_u, ovf4, jnp.max(mx, axis=0)
    return acc_u, pot_u, ovf4


# --------------------------------------------------------------------------
# Host-sliced query driver.
#
# The TPU runtime kills executables that run longer than its hang watchdog
# (~60 s observed on this platform: a 165-chunk lax.map crashed the worker
# while 4 chunks ran fine). For large N the chunk loop is therefore driven
# from the host in bounded slices: one jitted gather of the tile tables,
# repeated calls of a K-chunk slice executable at different offsets, and a
# final jitted assembly. Dispatch overhead (~26 ms) is negligible against
# multi-second slices.
# --------------------------------------------------------------------------

def _make_tables(td, cfg):
    if _use_shared(cfg):
        return _traversal_mod(cfg).make_tables(td, cfg)
    return None


def _grid_farfield(td, cfg, eps):
    """Dense stencil far field (grid.py) when enabled; else None."""
    if (cfg.farfield != "grid"
            or cfg.traversal_mode not in ("shared", "gwalk")
            or cfg.multipole_order >= 2):
        return None
    from . import grid as gridmod
    n, ndim = td.pos.shape
    L0 = gridmod.effective_grid_level(cfg, n)
    if L0 <= 0:
        return None
    pyr = gridmod.build_pyramid(td, ndim, cfg.max_depth, L0)
    return gridmod.dense_far_field(pyr, ndim, L0, td.box_size, eps,
                                   cfg.local_order)


@partial(jax.jit, static_argnames=("cfg",))
def _tiles_jit(td, cfg):
    return _gather_tiles(td, cfg), _make_tables(td, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def _grid_jit(td, cfg, eps):
    return _grid_farfield(td, cfg, eps)


@partial(jax.jit, static_argnames=("cfg",))
def _far_jit(td, cfg, eps, G):
    """grid2 per-particle far field (one executable per query)."""
    from . import grid2
    return grid2.far_field(td, cfg, eps, G)


@partial(jax.jit, static_argnames=("cfg", "K", "mode"))
def _slice_query_jit(td, cfg, theta, eps, G, tiles, tables, Lgrid,
                     start, K, mode="both"):
    dtype = td.pos.dtype
    _, gx = _split_tiles(tiles)

    def sl(a):
        return jax.lax.dynamic_slice_in_dim(a, start, K, axis=0)

    sliced = tuple(sl(a) for a in tiles)

    # lmac slice-level pre-filter: ONE relevance pass + compaction over
    # the full node table for the whole slice; each chunk's predicate
    # then runs over the GCAP candidate rows instead of all M nodes.
    # This is what makes the walk scale: per-query cost goes from
    # n_chunks x M (≈ N^2/(C·T·max_leaf)) to n_slices x M + n_chunks x
    # GCAP. Bit-identical results (traversal3.GroupCand).
    cand = None
    if cfg.traversal_mode == "lmac" and _use_shared(cfg):
        from . import traversal3
        n = td.pos.shape[0]
        (tpos_a, tidx_a, blo_a, bhi_a, tc_a), sgx = _split_tiles(sliced)
        D = blo_a.shape[-1]
        flat_lo = blo_a.reshape(-1, D)
        flat_hi = bhi_a.reshape(-1, D)
        flat_valid = (tidx_a[..., 0] < n).reshape(-1)
        if sgx is not None:                       # grid2: per-tile range
            kw = dict(tcell_lo=sgx[1].reshape(-1, D),
                      tcell_hi=sgx[2].reshape(-1, D))
        else:
            # farfield="grid": tiles are cell-clipped, one cell per tile
            kw = dict(tcell_lo=tc_a.reshape(-1, D),
                      tcell_hi=tc_a.reshape(-1, D))
        cand = traversal3.build_group_candidates(
            td, cfg, theta, flat_lo, flat_hi, tables,
            tile_valid=flat_valid, **kw)

    # Batched walk: build every chunk's SharedSources in ONE vmapped
    # executable instead of per-chunk op streams inside lax.map. The
    # walk is launch-bound (~40 tiny XLA ops per round x ~12 rounds x
    # C chunks measured ~5-7 ms/chunk of the 9.7 ms chunk total at 8M);
    # vmapping amortizes every launch across the slice's K chunks. The
    # kernel stays in the lax.map below (its pallas launch is one op
    # per chunk and its VMEM working set must stay per-chunk).
    import os as _os
    srcs = None
    if (_use_shared(cfg)
            and _os.environ.get("RAKAU_WALK_VMAP", "0") == "1"):
        n = td.pos.shape[0]
        traversal_mod = _traversal_mod(cfg)
        (tpos_a, tidx_a, blo_a, bhi_a, tc_a), sgx = _split_tiles(sliced)
        tvalid_a = tidx_a[..., 0] < n
        kw = {"cand": cand} if cand is not None else {}
        if cfg.farfield == "grid2":
            srcs = jax.vmap(
                lambda blo, bhi, tv, clo, chi:
                traversal_mod.build_shared_sources(
                    td, cfg, theta, blo, bhi, tables=tables,
                    tile_valid=tv, tcell_lo=clo, tcell_hi=chi, **kw)
            )(blo_a, bhi_a, tvalid_a, sgx[1], sgx[2])
        else:
            srcs = jax.vmap(
                lambda blo, bhi, tv, tcell:
                traversal_mod.build_shared_sources(
                    td, cfg, theta, blo, bhi, tables=tables,
                    tile_cell=tcell, tile_valid=tv, **kw)
            )(blo_a, bhi_a, tvalid_a, tc_a)

    def chunk_fn(args):
        if srcs is not None:
            args, src = args
        else:
            src = None
        if gx is not None:
            tpos, tidx, blo, bhi, tcell, tpc, clo, chi = args
            tcells = (tpc, clo, chi)
        else:
            tpos, tidx, blo, bhi, tcell = args
            tcells = None
        return _eval_chunk(td, cfg, theta, eps, G, dtype, tpos, tidx,
                           blo, bhi, tables=tables, tcell=tcell,
                           Lgrid=Lgrid, mode=mode, tcells=tcells,
                           cand=cand, src=src)

    xs = (sliced, srcs) if srcs is not None else sliced
    unroll = int(_os.environ.get("RAKAU_SLICE_UNROLL", "1"))
    if unroll > 1:
        # kernel-skip forensics (r4): the lax.map/while iteration
        # machinery costs ~5 ms/chunk on the axon backend — more than
        # the kernel itself. Unrolling the chunk loop into straight
        # line code removes it at the price of a K-times-larger trace
        # (slower cold compile).
        acc, pot, ovf, mx = jax.lax.scan(
            lambda c, x: (c, chunk_fn(x)), None, xs,
            unroll=min(unroll, K))[1]
    else:
        acc, pot, ovf, mx = jax.lax.map(chunk_fn, xs)
    ovf = jnp.any(ovf, axis=0)
    mx = jnp.max(mx, axis=0)
    if cand is not None:
        # group-table capacity rides the frontier slot (cap 3 / max 2)
        ovf = ovf.at[3].set(ovf[3] | cand.overflow)
        mx = mx.at[2].set(jnp.maximum(mx[2], cand.count))
    return acc, pot, ovf, mx


def _assemble_impl(td, cfg, acc_tiles, pot_tiles):
    """Map per-tile results (chunk-stacked) back to Morton particle order
    via the monotone tile-begin binary search."""
    n, ndim = td.pos.shape
    T = cfg.ncrit
    acc_flat = acc_tiles.reshape(-1, T, ndim)
    pot_flat = pot_tiles.reshape(-1, T)
    TCp = acc_flat.shape[0]
    tb_padded = jnp.pad(td.tile_begin, (0, max(0, TCp - td.tile_begin.shape[0])),
                        constant_values=n)
    p = jnp.arange(n, dtype=I32)
    t_of_p = su.searchsorted_1d(
        jnp.where(jnp.arange(TCp, dtype=I32) < td.n_tiles,
                  tb_padded[:TCp], n), p + 1) - 1
    t_of_p = jnp.clip(t_of_p, 0, TCp - 1)
    off = p - tb_padded[jnp.clip(t_of_p, 0, td.tile_begin.shape[0] - 1)]
    off = jnp.clip(off, 0, T - 1)
    return acc_flat[t_of_p, off], pot_flat[t_of_p, off]


_assemble_jit = partial(jax.jit, static_argnames=("cfg",))(_assemble_impl)

_gwalk_jit = partial(jax.jit,
                     static_argnames=("cfg", "mode"))(_gwalk_impl)


def tune_gwalk(td, cfg: TreeConfig, theta, eps, G=1.0,
               max_retries: int = 6):
    """Fit the gwalk global caps AND per-round frontier caps from one
    (or a few, under overflow-retry) dynamic-walk queries. Returns the
    fitted config (gwalk_round_caps set — subsequent queries run the
    unrolled walk whose shapes match the measured frontiers)."""
    import numpy as np
    from .config import fit_caps, fit_round_caps
    cfg_dyn = cfg.with_(gwalk_round_caps=None)
    dt = td.pos.dtype
    theta = jnp.asarray(theta, dt)
    eps = jnp.asarray(eps, dt)
    G = jnp.asarray(G, dt)
    _OVF = ("m2p_cap", "p2p_leaf_cap", "p2p_src_cap", "frontier_cap")
    for _ in range(max_retries):
        tiles, tables, Lgrid = _query_state(td, cfg_dyn, eps)
        _, _, ovf, mx, rcnt = _gwalk_jit(td, cfg_dyn, theta, eps, G,
                                         tiles, Lgrid)
        flags = np.asarray(ovf)
        if not flags.any():
            break
        if flags[2] and int(mx[1]) <= cfg_dyn.p2p_src_cap:
            # pool flag with rows under cap = a GROUP straddled the
            # window (build_pool win_ovf): the fix is a wider window,
            # not more pool rows
            cfg_dyn = cfg_dyn.with_(pool_window=2 * cfg_dyn.pool_window)
            flags = flags.copy()
            flags[2] = False
        cfg_dyn = cfg_dyn.with_(**{f: 2 * getattr(cfg_dyn, f)
                                   for f, hit in zip(_OVF, flags)
                                   if hit})
    fitted = fit_caps(cfg_dyn, np.asarray(mx))
    return fitted.with_(gwalk_round_caps=fit_round_caps(np.asarray(rcnt)))


# Derived per-tree query state (tiles gather + traversal tables + grid
# far field): reused across repeated queries on the same tree — the 8M
# tiles gather alone measured 0.39 s/call (windowed [TC, T] gather),
# paid per call without this. Tiny LRU: entries pin device memory
# (~180 MB of tile panels at 8M), so keep only the last two trees.
_QUERY_STATE_CACHE: dict = {}


def _query_state(td, cfg, eps):
    # keyed/guarded on BOTH pos and mass identity: the tables embed node
    # mass/COM, so a tree sharing a position buffer with different
    # masses must miss (ADVICE r4: a mass-only update that skips the
    # pos gather would otherwise return stale physics)
    key = (id(td.pos), id(td.mass), cfg, float(jnp.asarray(eps)))
    hit = _QUERY_STATE_CACHE.get(key)
    # id() can be reused after GC; verify the cached tree is the caller's
    if hit is not None and hit[0] is td.pos and hit[1] is td.mass:
        return hit[2]
    tiles, tables = _tiles_jit(td, cfg)
    Lgrid = _grid_jit(td, cfg, eps)
    while len(_QUERY_STATE_CACHE) >= 2:
        _QUERY_STATE_CACHE.pop(next(iter(_QUERY_STATE_CACHE)))
    _QUERY_STATE_CACHE[key] = (td.pos, td.mass, (tiles, tables, Lgrid))
    return tiles, tables, Lgrid


def acc_pot_u_host(td, cfg: TreeConfig, theta, eps, G=1.0,
                   slice_chunks: int = None, mode: str = "both"):
    """Host-driven query: like acc_pot_u(with_stats=True) but each device
    dispatch covers at most `slice_chunks` tile chunks (watchdog-safe).
    Returns (acc, pot, ovf[4], maxima[4])."""
    import numpy as np
    if slice_chunks is None:
        # keep ~1024 tiles per device dispatch regardless of chunk
        # width: the vmapped slice walk amortizes launches over the
        # slice, and small chunks would otherwise shrink the batch
        slice_chunks = max(32, 1024 // max(cfg.tile_chunk, 1))
    dt = td.pos.dtype
    theta = jnp.asarray(theta, dt)
    eps = jnp.asarray(eps, dt)
    G = jnp.asarray(G, dt)
    tiles, tables, Lgrid = _query_state(td, cfg, eps)
    if cfg.traversal_mode == "gwalk":
        # one executable: walk + pool + single kernel launch (well under
        # the ~60 s dispatch watchdog — the whole 8M query is seconds)
        acc_u, pot_u, ovf, mx = _gwalk_jit(td, cfg, theta, eps, G,
                                           tiles, Lgrid, mode=mode)[:4]
        if cfg.farfield == "grid2":
            acc_f, pot_f = _far_jit(td, cfg, eps, G)
            acc_u = acc_u + acc_f
            pot_u = pot_u + pot_f
        return acc_u, pot_u, ovf, mx
    n_chunks = tiles[0].shape[0]
    CH = tiles[0].shape[1]
    # Only slices containing real tiles need processing (tile capacity
    # includes padding; each padding chunk would cost a full walk+eval).
    n_live = max(1, -(-int(td.n_tiles) // CH))
    n_live = min(n_live, n_chunks)
    K = min(slice_chunks, n_live)
    accs, pots, ovfs, mxs = [], [], [], []
    for s in range(0, n_live, K):
        start = min(s, n_live - K)  # final slice overlaps; results align
        a, p, o, m = _slice_query_jit(td, cfg, theta, eps, G, tiles,
                                      tables, Lgrid, start, K, mode=mode)
        if start < s:  # trim the overlap of the final slice
            keep = n_live - s
            a, p = a[-keep:], p[-keep:]
        accs.append(a)
        pots.append(p)
        # collect lazily — an eager `ovf | o` here dispatches through
        # the tunnel between slices (~4 ops x 26 ms RTT x n_slices was
        # ~2 s of the 8M query, r4 forensics); reduce once below
        ovfs.append(o)
        mxs.append(m)
    ovf = jnp.any(jnp.stack(ovfs), axis=0)
    mx = jnp.max(jnp.stack(mxs), axis=0)
    acc_tiles = jnp.concatenate(accs, axis=0)
    pot_tiles = jnp.concatenate(pots, axis=0)
    # pad tail (unprocessed padding chunks) so assembly shapes match
    pad_rows = (n_chunks - n_live) * CH
    acc_tiles = acc_tiles.reshape(-1, cfg.ncrit, td.pos.shape[1])
    pot_tiles = pot_tiles.reshape(-1, cfg.ncrit)
    if pad_rows:
        acc_tiles = jnp.concatenate(
            [acc_tiles, jnp.zeros((pad_rows, cfg.ncrit, td.pos.shape[1]),
                                  dt)], axis=0)
        pot_tiles = jnp.concatenate(
            [pot_tiles, jnp.zeros((pad_rows, cfg.ncrit), dt)], axis=0)
    acc_u, pot_u = _assemble_jit(td, cfg, acc_tiles, pot_tiles)
    if cfg.farfield == "grid2":
        acc_f, pot_f = _far_jit(td, cfg, eps, G)
        acc_u = acc_u + acc_f
        pot_u = pot_u + pot_f
    return acc_u, pot_u, ovf, mx

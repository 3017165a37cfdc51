"""Shared-candidate traversal: one union walk per tile-chunk with exact
per-tile decision masks.

The list-building traversal (traversal.py) pays ~10 ns/element irregular
access for every (tile, candidate) pair — measured 40 s/query at 1M.
This version exploits that neighboring tiles visit almost the same nodes:

  * ONE union frontier per chunk of C tiles walks the tree (1-row
    gathers of node fields per round — negligible irregular volume);
  * per-tile MAC decisions are dense elementwise [C, K] panels over the
    shared candidates, using the SAME criterion as the per-tile list
    traversal (distance from tile AABB to node COM; bh or bh_geom), so
    accuracy matches rakau's envelope exactly;
  * the per-round decision masks are stored in a [rounds, K, C] stack
    (contiguous DUS writes); materialization turns the union into one
    shared source array per chunk (M2P node entries + P2P leaves
    expanded to particles) and row-gathers the exact per-tile masks;
  * the kernel evaluates every tile against the shared sources weighted
    by its mask plane — per-tile gathers are gone entirely.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import scan_utils as su
from .build import TreeData
from .config import TreeConfig, MAC_BH, MAC_BH_GEOM

I32 = jnp.int32


class SharedSources(NamedTuple):
    """Per-chunk shared source set (padded static shapes) with exact
    per-tile contribution masks."""
    pos: jnp.ndarray        # [S, D] source position (node COM or particle)
    mass: jnp.ndarray       # [S]
    idx: jnp.ndarray        # [S] int32 Morton particle id; -1 for nodes
    mask: jnp.ndarray       # [C, S] bool: source contributes to tile c
    count: jnp.ndarray      # [] int32 valid entries
    overflow: jnp.ndarray   # [4] bool (union, leaf-list, p2p expansion, frontier)
                            # aligned with TreeConfig cap fields
    maxima: jnp.ndarray     # [3] int32 (union nodes, total sources, frontier)


def _point_dist2(lo, hi, p):
    """Squared distance from tile AABBs [C,1,D] to points p [K,D]."""
    d = jnp.maximum(jnp.maximum(lo - p[None], p[None] - hi), 0.0)
    return jnp.sum(d * d, axis=-1)


class TraversalTables(NamedTuple):
    """Node fields packed into row-gatherable tables (a row gather costs
    ~7 ns/ROW on this platform vs ~10 ns/ELEMENT for separate field
    gathers — packing is a ~7x traversal saving).

    ff [M, 12] f32: com_x..com_z (padded to 3), mass, size, thresh_extra
    (bh_geom delta or 0), leaf flag, node level, cell_x..cell_z at the
    node's own level (exact in f32: coords < 2^21 < 2^24), unused pad.
    ii [M, 2] i32: child_begin, child_count."""
    ff: jnp.ndarray
    ii: jnp.ndarray


def make_tables(td: TreeData, cfg: TreeConfig) -> TraversalTables:
    dtype = td.pos.dtype
    M = td.node_level.shape[0]
    size = td.box_size * jnp.exp2(-td.node_level.astype(dtype))
    D = td.pos.shape[1]
    cols = [td.node_com[:, d] for d in range(D)]
    cols += [jnp.zeros(M, dtype)] * (3 - D)
    cols += [td.node_mass, size,
             td.node_delta if cfg.mac == MAC_BH_GEOM
             else jnp.zeros(M, dtype),
             td.node_is_leaf.astype(dtype),
             td.node_level.astype(dtype)]
    cols += [td.node_cell[:, d].astype(dtype) for d in range(D)]
    cols += [jnp.zeros(M, dtype)] * (3 - D) + [jnp.zeros(M, dtype)]
    ff = jnp.stack(cols, axis=1)
    ii = jnp.stack([td.node_child_begin, td.node_child_count], axis=1)
    return TraversalTables(ff=ff, ii=ii)


def build_shared_sources(td: TreeData, cfg: TreeConfig, theta,
                         box_lo, box_hi,
                         tables: TraversalTables = None,
                         tile_cell=None, tile_valid=None) -> SharedSources:
    """One chunk's union walk. box_lo/hi: [C, D] tile AABBs. Jittable.

    With cfg.farfield == "grid", candidates covered by the dense stencil
    far field are dropped (node's own-level cell separation >= 3 from the
    tile's ancestor cell; grid.py coverage proof) and nodes above the
    leaf-grid level are never MAC-accepted (their far part is in the
    grid, their near part must descend); tile_cell [C, D] are the tiles'
    leaf-grid cells. tile_valid [C] masks padding tiles out of the walk."""
    C, D = box_lo.shape
    dtype = td.pos.dtype
    theta_inv = 1.0 / jnp.asarray(theta, dtype)
    lo = box_lo[:, None, :]
    hi = box_hi[:, None, :]
    n = td.pos.shape[0]
    if tables is None:
        tables = make_tables(td, cfg)
    use_grid = cfg.farfield == "grid"
    L0 = 0
    if use_grid:
        from .grid import effective_grid_level
        L0 = effective_grid_level(cfg, n)
        use_grid = L0 > 0
    if tile_valid is None:
        tile_valid = jnp.ones((C,), bool)

    fcap = cfg.frontier_cap
    k8 = 2 ** cfg.ndim
    K = fcap * k8
    R = cfg.max_depth + 1          # rounds (root round r=0 included)

    vary0 = (box_lo[0, 0] * 0).astype(I32)

    def classify(ids, par_active_kc):
        """ids [K] node slots (-1 invalid); par_active [K, C]: tile c
        opened the parent. Returns (m2p accept, p2p leaf-open, next
        frontier activity), each [K, C]."""
        valid = ids >= 0
        ids_c = jnp.where(valid, ids, 0)
        row = tables.ff[ids_c]                          # one row gather
        com = row[:, :D]
        mass = row[:, 3]
        size = row[:, 4]
        extra = row[:, 5]
        leaf = row[:, 6] > 0.5
        d2 = _point_dist2(lo, hi, com)                  # [C, K]
        thresh = size * theta_inv + extra
        acc = d2 > (thresh * thresh)[None, :]
        use = par_active_kc.T & valid[None, :]          # [C, K]
        if use_grid:
            lvl = row[:, 7].astype(I32)                 # [K]
            ncell = row[:, 8:8 + D].astype(I32)         # [K, D]
            # compare at l_eff = min(node level, L0)
            sh_n = jnp.maximum(lvl - L0, 0)             # node deeper: >> to L0
            sh_t = jnp.maximum(L0 - lvl, 0)             # node shallower
            ncell_e = ncell >> sh_n[:, None]            # [K, D]
            tcell_e = (tile_cell[:, None, :] >> sh_t[None, :, None])
            sep = jnp.max(jnp.abs(ncell_e[None, :, :] - tcell_e),
                          axis=-1)                      # [C, K]
            use = use & (sep < 3)                       # covered -> drop
            acc = acc & (lvl >= L0)[None, :]            # never accept above
        accepted = acc & use & (mass > 0)[None, :]
        opened = (~acc) & use
        m2p_m = accepted.T                              # [K, C]
        p2p_m = (opened & leaf[None, :]).T
        next_a = (opened & (~leaf)[None, :]).T
        return m2p_m, p2p_m, next_a

    # mask stacks [R, K, C] written contiguously per round
    m2p_stack = jnp.zeros((R, K, C), bool) & (vary0 > 0)
    p2p_stack = jnp.zeros((R, K, C), bool) & (vary0 > 0)
    id_stack = jnp.full((R, K), -1, I32) + vary0

    # round 0: the root alone (padding tiles excluded from the walk)
    root_ids = jnp.concatenate([jnp.zeros(1, I32),
                                jnp.full(K - 1, -1, I32)])
    root_act = (jnp.arange(K)[:, None] < 1) & tile_valid[None, :]
    m0, p0, next0 = classify(root_ids, root_act)
    m2p_stack = m2p_stack.at[0].set(m0)
    p2p_stack = p2p_stack.at[0].set(p0)
    id_stack = id_stack.at[0].set(root_ids)

    idxs, cnt0 = su.compact_indices(jnp.any(next0, axis=1), fcap)
    idxs_c = jnp.clip(idxs, 0, K - 1)
    frontier = jnp.where(idxs < K, root_ids[idxs_c], 0)
    f_active = next0[idxs_c] & (idxs < K)[:, None]
    f_cnt = jnp.minimum(cnt0, fcap)
    f_max = jnp.maximum(cnt0, 1 + vary0)
    ovf_frontier = vary0 > 0

    def round_body(r, carry):
        (frontier, f_cnt, f_active, m2p_stack, p2p_stack, id_stack,
         ovf_frontier, f_max) = carry
        fvalid = jnp.arange(fcap, dtype=I32) < f_cnt
        fr = jnp.where(fvalid, frontier, 0)
        rowi = tables.ii[fr]                            # one row gather
        cb = rowi[:, 0]
        cc = rowi[:, 1]
        kids = (cb[:, None] + jnp.arange(k8, dtype=I32)).reshape(-1)
        kval = ((jnp.arange(k8, dtype=I32)[None, :] < cc[:, None])
                .reshape(-1) & jnp.repeat(fvalid, k8))
        ids = jnp.where(kval, kids, -1)
        par_active = jnp.repeat(f_active, k8, axis=0)   # [K, C]
        m2p_m, p2p_m, next_a = classify(ids, par_active)
        m2p_stack = jax.lax.dynamic_update_slice(
            m2p_stack, m2p_m[None], (r, 0, 0))
        p2p_stack = jax.lax.dynamic_update_slice(
            p2p_stack, p2p_m[None], (r, 0, 0))
        id_stack = jax.lax.dynamic_update_slice(
            id_stack, ids[None], (r, 0))
        f_sel = jnp.any(next_a, axis=1)
        idxs, cnt = su.compact_indices(f_sel, fcap)
        idxs_c = jnp.clip(idxs, 0, K - 1)
        frontier = jnp.where(idxs < K, ids[idxs_c], 0)
        f_active = next_a[idxs_c] & (idxs < K)[:, None]
        ovf_frontier = ovf_frontier | (cnt > fcap)
        f_max = jnp.maximum(f_max, cnt)
        return (frontier, jnp.minimum(cnt, fcap), f_active, m2p_stack,
                p2p_stack, id_stack, ovf_frontier, f_max)

    carry = (frontier, f_cnt, f_active, m2p_stack, p2p_stack, id_stack,
             ovf_frontier, f_max)
    carry = jax.lax.fori_loop(1, R, round_body, carry)
    (frontier, f_cnt, f_active, m2p_stack, p2p_stack, id_stack,
     ovf_frontier, f_max) = carry

    # ---- materialize the union ----------------------------------------
    ids_flat = id_stack.reshape(R * K)
    m2p_flat = m2p_stack.reshape(R * K, C)
    p2p_flat = p2p_stack.reshape(R * K, C)
    any_m2p = jnp.any(m2p_flat, axis=1)
    any_p2p = jnp.any(p2p_flat, axis=1)

    sentinel = jnp.asarray(4.0, dtype) * td.box_size
    ucap = cfg.m2p_cap

    # M2P rows: nodes accepted by >= 1 tile
    uidx, ucnt = su.compact_indices(any_m2p, ucap)
    uidx_c = jnp.clip(uidx, 0, R * K - 1)
    uvalid = uidx < R * K
    un_ids = jnp.where(uvalid, ids_flat[uidx_c], 0)
    m_pos = jnp.where(uvalid[:, None], td.node_com[un_ids], sentinel)
    m_mass = jnp.where(uvalid, td.node_mass[un_ids], 0.0)
    m_idx = jnp.full(ucap, -1, I32)
    m_mask = m2p_flat[uidx_c] & uvalid[:, None]          # [ucap, C]
    ovf_uni = ucnt > ucap

    # P2P rows: leaves opened by >= 1 tile, expanded to their particles
    pcap = cfg.p2p_src_cap
    lcap = cfg.p2p_leaf_cap
    lidx, lcnt = su.compact_indices(any_p2p, lcap)
    lidx_c = jnp.clip(lidx, 0, R * K - 1)
    lvalid = lidx < R * K
    lf_ids = jnp.where(lvalid, ids_flat[lidx_c], 0)
    ovf_leaf = lcnt > lcap
    lb = jnp.where(lvalid, td.node_begin[lf_ids], 0)
    lc = jnp.where(lvalid, td.node_end[lf_ids] - td.node_begin[lf_ids], 0)
    offs = jnp.cumsum(lc) - lc
    total_p = offs[-1] + lc[-1]
    ovf_p2p = total_p > pcap
    # row-of-particle via start marks + cumsum (a pcap-sized searchsorted
    # here costs ~7 ms/chunk; the scatter is lcap-sized and trivial)
    kq = jnp.arange(pcap, dtype=I32)
    marks = jnp.zeros(pcap + 1, I32).at[
        jnp.where(lc > 0, jnp.minimum(offs, pcap), pcap)].add(1)
    row = jnp.cumsum(marks[:pcap]) - 1
    row = jnp.maximum(row, 0)
    rvalid = kq < jnp.minimum(total_p, pcap)
    row_c = jnp.clip(row, 0, lcap - 1)
    pidx = jnp.where(rvalid, lb[row_c] + (kq - offs[row_c]), -1)
    pidx_c = jnp.clip(pidx, 0, n - 1)
    p_pos = jnp.where(rvalid[:, None], td.pos[pidx_c], sentinel)
    p_mass = jnp.where(rvalid, td.mass[pidx_c], 0.0)
    leaf_mask = p2p_flat[lidx_c] & lvalid[:, None]       # [lcap, C]
    p_mask = leaf_mask[row_c] & rvalid[:, None]          # [pcap, C]
    if use_grid:
        # Leaves ABOVE the grid level span several leaf-grid cells; their
        # particles in stencil-covered cells (L0 separation >= 3 from the
        # tile cell) are already in the dense far field — filter them per
        # particle. Particles of deeper leaves share the leaf's cell and
        # pass automatically (their leaf was not dropped).
        from . import particles as pmod
        pcell = (pmod.discretize(p_pos, td.box_size, cfg.max_depth)
                 >> jnp.asarray(cfg.max_depth - L0, jnp.uint32)
                 ).astype(I32)                           # [pcap, D]
        psep = jnp.max(jnp.abs(pcell[:, None, :] - tile_cell[None, :, :]),
                       axis=-1)                          # [pcap, C]
        p_mask = p_mask & (psep < 3)

    pos = jnp.concatenate([m_pos, p_pos], axis=0).astype(dtype)
    mass = jnp.concatenate([m_mass, p_mass], axis=0).astype(dtype)
    idx = jnp.concatenate([m_idx, pidx], axis=0)
    mask = jnp.concatenate([m_mask, p_mask], axis=0).T   # [C, S]

    return SharedSources(
        pos=pos, mass=mass, idx=idx, mask=mask,
        count=jnp.minimum(ucnt, ucap) + jnp.minimum(total_p, pcap),
        overflow=jnp.stack([ovf_uni, ovf_leaf, ovf_p2p, ovf_frontier]),
        maxima=jnp.stack([ucnt, ucnt + total_p, f_max]))

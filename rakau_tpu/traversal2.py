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
    maxima: jnp.ndarray     # [4] int32 (union nodes, total sources,
                            # frontier, p2p leaves)
    cell: jnp.ndarray = None  # [S, D] int32 leaf-grid cell (grid2 mode
                              # only): the per-pair coverage test operand;
                              # -1 marks rows exempt from the test
    quad: jnp.ndarray = None  # [m2p_cap, Q] raw second moments of the
                              # M2P node rows (multipole_order>=2 only);
                              # the kernels' quadrupole correction operand


def _point_dist2(lo, hi, p):
    """Squared distance from tile AABBs [C,1,D] to points p [K,D]."""
    d = jnp.maximum(jnp.maximum(lo - p[None], p[None] - hi), 0.0)
    return jnp.sum(d * d, axis=-1)


class TraversalTables(NamedTuple):
    """Node fields packed into row-gatherable tables (one [K, W] row
    gather per round is ~an order cheaper than W separate field gathers;
    the per-round [8192, W] gather is the round loop's top cost, so W is
    squeezed to 8).

    ff [M, 8] f32: com_x..com_z (padded to 3), mass, size,
    level + 64*leaf_flag, packed effective cell (cell coords at
    min(level, L0), D fields of L0 bits each — exact in f32: <= 21 bits),
    bh_geom delta (or 0).
    ii [M, 2] i32: child_begin, child_count.
    nm [M, 4(+1)] f32: com (padded to 3) + mass (+ packed eff cell in
    grid/grid2 mode) — materialization row gather.
    pm [N, 4] f32: particle pos (padded to 3) + mass — P2P row gather."""
    ff: jnp.ndarray
    ii: jnp.ndarray
    nm: jnp.ndarray
    pm: jnp.ndarray


def _grid_l0(cfg: TreeConfig, n: int) -> int:
    if cfg.farfield == "grid":
        from .grid import effective_grid_level
        return effective_grid_level(cfg, n)
    if cfg.farfield == "grid2":
        from .grid2 import effective_grid_level
        return effective_grid_level(cfg, n)
    return 0


def _grid_sep(cfg: TreeConfig) -> int:
    return cfg.grid_sep if cfg.farfield == "grid2" else 3


def make_tables(td: TreeData, cfg: TreeConfig) -> TraversalTables:
    dtype = td.pos.dtype
    M = td.node_level.shape[0]
    n = td.pos.shape[0]
    size = td.box_size * jnp.exp2(-td.node_level.astype(dtype))
    D = td.pos.shape[1]
    L0 = _grid_l0(cfg, n)
    # effective cell at min(level, L0), packed D x L0-bit fields
    sh = jnp.maximum(td.node_level - L0, 0)
    cpack = jnp.zeros(M, I32)
    for d in range(D):
        cpack = cpack | ((td.node_cell[:, d] >> sh) << (d * L0))
    cols = [td.node_com[:, d] for d in range(D)]
    cols += [jnp.zeros(M, dtype)] * (3 - D)
    cols += [td.node_mass, size,
             (td.node_level + 64 * td.node_is_leaf.astype(I32)
              ).astype(dtype),
             cpack.astype(dtype),
             td.node_delta if cfg.mac == MAC_BH_GEOM
             else jnp.zeros(M, dtype)]
    ff = jnp.stack(cols, axis=1)
    ii = jnp.stack([td.node_child_begin, td.node_child_count], axis=1)
    nm_cols = [ff[:, :3], td.node_mass[:, None]]
    if L0 > 0:
        nm_cols.append(cpack.astype(dtype)[:, None])
    if cfg.multipole_order >= 2:
        nm_cols.append(td.node_quad)
    nm = jnp.concatenate(nm_cols, axis=1)
    pmc = [td.pos[:, d] for d in range(D)]
    pmc += [jnp.zeros(n, dtype)] * (3 - D) + [td.mass]
    pm = jnp.stack(pmc, axis=1)
    return TraversalTables(ff=ff, ii=ii, nm=nm, pm=pm)


def build_shared_sources(td: TreeData, cfg: TreeConfig, theta,
                         box_lo, box_hi,
                         tables: TraversalTables = None,
                         tile_cell=None, tile_valid=None,
                         tcell_lo=None, tcell_hi=None) -> SharedSources:
    """One chunk's union walk. box_lo/hi: [C, D] tile AABBs. Jittable.

    With cfg.farfield in ("grid", "grid2"), candidates covered by the
    dense stencil far field are dropped and nodes above the leaf-grid
    level are never MAC-accepted (their far part is in the grid, their
    near part must descend). The drop test is against the tile's leaf-
    grid cell RANGE [tcell_lo, tcell_hi] ([C, D] each): a node is
    dropped iff its interval separation >= S, i.e. EVERY tile particle's
    pair is stencil-covered (grid2.py coverage proof; with "grid" tiles
    are cell-clipped so lo == hi == tile_cell and this reduces to the
    round-1 per-tile test). tile_valid [C] masks padding tiles out of
    the walk. grid2 additionally emits per-source leaf cells for the
    kernels' exact per-pair coverage masking."""
    import os as _os
    _ablate = set(_os.environ.get("RAKAU_T2_ABLATE", "").split(","))
    C, D = box_lo.shape
    dtype = td.pos.dtype
    theta_inv = 1.0 / jnp.asarray(theta, dtype)
    lo = box_lo[:, None, :]
    hi = box_hi[:, None, :]
    n = td.pos.shape[0]
    if tables is None:
        tables = make_tables(td, cfg)
    use_grid = cfg.farfield in ("grid", "grid2")
    emit_cells = cfg.farfield == "grid2"
    S_sep = _grid_sep(cfg)
    L0 = 0
    if use_grid:
        L0 = _grid_l0(cfg, n)
        use_grid = L0 > 0
    emit_cells = emit_cells and use_grid
    if tcell_lo is None:
        tcell_lo = tile_cell
    if tcell_hi is None:
        tcell_hi = tile_cell
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
        lvl_leaf = row[:, 5].astype(I32)
        leaf = lvl_leaf >= 64
        extra = row[:, 7]
        d2 = _point_dist2(lo, hi, com)                  # [C, K]
        thresh = size * theta_inv + extra
        acc = d2 > (thresh * thresh)[None, :]
        use = par_active_kc.T & valid[None, :]          # [C, K]
        if use_grid:
            lvl = lvl_leaf & 63                         # [K]
            cp = row[:, 6].astype(I32)                  # packed eff cell
            # node cell already at l_eff = min(level, L0); shift the tile
            # cell range down when the node is shallower
            sh_t = jnp.maximum(L0 - lvl, 0)             # [K]
            fmask = (1 << L0) - 1
            sep = jnp.zeros((C, K), I32)
            for d in range(D):
                nc = (cp >> (d * L0)) & fmask           # [K]
                tl = tcell_lo[:, None, d] >> sh_t[None, :]
                th = tcell_hi[:, None, d] >> sh_t[None, :]
                sd = jnp.maximum(jnp.maximum(nc[None, :] - th,
                                             tl - nc[None, :]), 0)
                sep = jnp.maximum(sep, sd)
            use = use & (sep < S_sep)                   # covered -> drop
            acc = acc & (lvl >= L0)[None, :]            # never accept above
        # zero-mass nodes source nothing: never accept AND never open
        # (keeps padding-sentinel subtrees — LET exchange slots, uneven-N
        # fill — out of the walk, the lists, and the export sets)
        accepted = acc & use & (mass > 0)[None, :]
        opened = (~acc) & use & (mass > 0)[None, :]
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

    def round_body(carry):
        (r, frontier, f_cnt, f_active, m2p_stack, p2p_stack, id_stack,
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
        z = jnp.zeros((), I32)
        m2p_stack = jax.lax.dynamic_update_slice(
            m2p_stack, m2p_m[None], (r, z, z))
        p2p_stack = jax.lax.dynamic_update_slice(
            p2p_stack, p2p_m[None], (r, z, z))
        id_stack = jax.lax.dynamic_update_slice(
            id_stack, ids[None], (r, z))
        f_sel = jnp.any(next_a, axis=1)
        idxs, cnt = su.compact_indices(f_sel, fcap)
        idxs_c = jnp.clip(idxs, 0, K - 1)
        frontier = jnp.where(idxs < K, ids[idxs_c], 0)
        f_active = next_a[idxs_c] & (idxs < K)[:, None]
        ovf_frontier = ovf_frontier | (cnt > fcap)
        f_max = jnp.maximum(f_max, cnt)
        return (r + 1, frontier, jnp.minimum(cnt, fcap), f_active,
                m2p_stack, p2p_stack, id_stack, ovf_frontier, f_max)

    # early exit once the frontier drains (shallow chunks stop in a few
    # rounds instead of always paying max_depth of them)
    carry = (jnp.ones((), I32) + vary0, frontier, f_cnt, f_active,
             m2p_stack, p2p_stack, id_stack, ovf_frontier, f_max)
    carry = jax.lax.while_loop(
        lambda c: (c[0] < R) & (c[2] > 0), round_body, carry)
    (_, frontier, f_cnt, f_active, m2p_stack, p2p_stack, id_stack,
     ovf_frontier, f_max) = carry

    # ---- materialize the union ----------------------------------------
    ids_flat = id_stack.reshape(R * K)
    m2p_flat = m2p_stack.reshape(R * K, C)
    p2p_flat = p2p_stack.reshape(R * K, C)
    any_m2p = jnp.any(m2p_flat, axis=1)
    any_p2p = jnp.any(p2p_flat, axis=1)

    sentinel = jnp.asarray(4.0, dtype) * td.box_size
    ucap = cfg.m2p_cap

    # M2P rows: nodes accepted by >= 1 tile. Rows are re-sorted by the
    # node's Morton position (node_begin) before the gathers: Morton-
    # contiguous tiles then see their active sources CLUSTERED, so the
    # kernel's per-tile active-block lists shrink ~4x (the BFS level-
    # major compaction order scatters a tile's actives across the row).
    uidx, ucnt = su.compact_indices(any_m2p, ucap)
    uidx_c = jnp.clip(uidx, 0, R * K - 1)
    uvalid = uidx < R * K
    un_ids0 = jnp.where(uvalid, ids_flat[uidx_c], 0)
    if "sorts" not in _ablate:
        ukey = jnp.where(uvalid, td.node_begin[un_ids0], n)
        _, uidx_c, un_ids, uvalid = jax.lax.sort(
            (ukey, uidx_c, un_ids0, uvalid), num_keys=1)
    else:
        un_ids = un_ids0
    m_row = tables.nm[un_ids]                            # one row gather
    m_pos = jnp.where(uvalid[:, None], m_row[:, :D], sentinel)
    m_mass = jnp.where(uvalid, m_row[:, 3], 0.0)
    m_idx = jnp.full(ucap, -1, I32)
    if "masks" not in _ablate:
        m_mask = m2p_flat[uidx_c] & uvalid[:, None]      # [ucap, C]
    else:
        m_mask = jnp.broadcast_to(uvalid[:, None], (ucap, C))
    ovf_uni = ucnt > ucap
    m_cell = None
    if emit_cells:
        # accepted nodes have level >= L0, so the packed effective cell
        # IS the leaf-grid cell
        cp = m_row[:, 4].astype(I32)
        fmask = (1 << L0) - 1
        m_cell = jnp.stack([(cp >> (d * L0)) & fmask for d in range(D)],
                           axis=1)                       # [ucap, D]
    m_quad = None
    if cfg.multipole_order >= 2:
        qoff = 5 if (use_grid and L0 > 0) else 4
        qdim = D * (D + 1) // 2
        m_quad = jnp.where(uvalid[:, None],
                           m_row[:, qoff:qoff + qdim], 0.0)  # [ucap, Q]

    # P2P rows: leaves opened by >= 1 tile, expanded to their particles
    pcap = cfg.p2p_src_cap
    lcap = cfg.p2p_leaf_cap
    lidx, lcnt = su.compact_indices(any_p2p, lcap)
    lidx_c = jnp.clip(lidx, 0, R * K - 1)
    lvalid = lidx < R * K
    lf_ids0 = jnp.where(lvalid, ids_flat[lidx_c], 0)
    # spatial re-sort (see M2P above): the expanded particle rows then
    # form one globally Morton-ordered stream (particles within a leaf
    # are already Morton-contiguous)
    if "sorts" not in _ablate:
        lkey = jnp.where(lvalid, td.node_begin[lf_ids0], n)
        _, lidx_c, lf_ids, lvalid = jax.lax.sort(
            (lkey, lidx_c, lf_ids0, lvalid), num_keys=1)
    else:
        lf_ids = lf_ids0
    ovf_leaf = lcnt > lcap
    lb = jnp.where(lvalid, td.node_begin[lf_ids], 0)
    lc = jnp.where(lvalid, td.node_end[lf_ids] - td.node_begin[lf_ids], 0)
    offs = jnp.cumsum(lc) - lc
    total_p = offs[-1] + lc[-1]
    ovf_p2p = total_p > pcap
    # row-of-particle via start marks + cumsum (a pcap-sized searchsorted
    # here costs ~7 ms/chunk; the scatter is lcap-sized and trivial)
    kq = jnp.arange(pcap, dtype=I32)
    if "rowmap" not in _ablate:
        marks = jnp.zeros(pcap + 1, I32).at[
            jnp.where(lc > 0, jnp.minimum(offs, pcap), pcap)].add(1)
        row = jnp.cumsum(marks[:pcap]) - 1
        row = jnp.maximum(row, 0)
    else:
        row = kq % lcap
    rvalid = kq < jnp.minimum(total_p, pcap)
    row_c = jnp.clip(row, 0, lcap - 1)
    pidx = jnp.where(rvalid, lb[row_c] + (kq - offs[row_c]), -1)
    pidx_c = jnp.clip(pidx, 0, n - 1)
    p_row = tables.pm[pidx_c]                            # one row gather
    p_pos = jnp.where(rvalid[:, None], p_row[:, :D], sentinel)
    p_mass = jnp.where(rvalid, p_row[:, 3], 0.0)
    if "masks" not in _ablate:
        leaf_mask = p2p_flat[lidx_c] & lvalid[:, None]   # [lcap, C]
        p_mask = (leaf_mask[row_c] & rvalid[:, None]
                  & (p_mass > 0)[:, None])               # [pcap, C]
    else:
        p_mask = jnp.broadcast_to(rvalid[:, None], (pcap, C))
    p_cell = None
    if use_grid and ("psep" not in _ablate or emit_cells):
        # Leaves ABOVE the grid level span several leaf-grid cells; their
        # particles in stencil-covered cells (L0 separation >= S from
        # every tile cell) are already in the dense far field — filter
        # them per particle against the tile's cell range (conservative;
        # grid2 closes the per-pair remainder in the kernel). Particles
        # of deeper leaves share the leaf's cell and pass automatically.
        from . import particles as pmod
        pcell = (pmod.discretize(p_pos, td.box_size, cfg.max_depth)
                 >> jnp.asarray(cfg.max_depth - L0, jnp.uint32)
                 ).astype(I32)                           # [pcap, D]
        pd = jnp.maximum(jnp.maximum(
            pcell[:, None, :] - tcell_hi[None, :, :],
            tcell_lo[None, :, :] - pcell[:, None, :]), 0)
        psep = jnp.max(pd, axis=-1)                      # [pcap, C]
        p_mask = p_mask & (psep < S_sep)
        if emit_cells:
            p_cell = pcell

    pos = jnp.concatenate([m_pos, p_pos], axis=0).astype(dtype)
    mass = jnp.concatenate([m_mass, p_mass], axis=0).astype(dtype)
    idx = jnp.concatenate([m_idx, pidx], axis=0)
    mask = jnp.concatenate([m_mask, p_mask], axis=0).T   # [C, S]
    cell = None
    if emit_cells:
        cell = jnp.concatenate([m_cell, p_cell], axis=0)  # [S, D]

    return SharedSources(
        pos=pos, mass=mass, idx=idx, mask=mask,
        count=jnp.minimum(ucnt, ucap) + jnp.minimum(total_p, pcap),
        overflow=jnp.stack([ovf_uni, ovf_leaf, ovf_p2p, ovf_frontier]),
        maxima=jnp.stack([ucnt, ucnt + total_p, f_max, lcnt]),
        cell=cell, quad=m_quad)

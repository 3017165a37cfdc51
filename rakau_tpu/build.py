"""One-shot, scatter-free tree construction.

The reference builds its node list with recursive TBB tasks over sorted
Morton codes (`tree.hpp` build internals, SURVEY.md C3/C4). The TPU
restructuring here goes further than a level loop: on this hardware,
N-sized scatters cost ~10ns/element while sorts, cumulative scans and
elementwise ops run at full vector rate, so the whole tree is derived in
one shot from the common-prefix-length (LCP) structure of the sorted codes
(Cornerstone lineage, [P: 2307.06345]):

  1. ONE key sort carries every particle payload (positions, masses,
     cells) — no post-sort gathers; the inverse permutation comes from a
     second sort, not a scatter.
  2. cpl[i] = LCP level of neighbors (i-1, i) fully determines cell
     boundaries; a per-level pass of two running scans yields per-particle
     leaf levels (deepest ancestor that still splits) and tile-group
     levels — all elementwise.
  3. Every node is (level, head-particle): particle i heads exactly the
     levels (cpl[i], leaf_level[i]], so the node table is an exclusive
     cumsum + batched binary search + ONE small sort into level-major
     order (children contiguous by construction).
  4. Node mass/COM/quadrupole come from double-double prefix sums over
     the sorted particles, read back by boundary gathers — exact segment
     sums with no scatter and no cancellation.

Capacity overflow is detected and reported, never silently truncated.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import morton, particles
from . import scan_utils as su
from .config import TreeConfig

I32 = jnp.int32
U32 = jnp.uint32


class TreeData(NamedTuple):
    """Flat tree + Morton-ordered particle store (a pytree of arrays).

    Particle arrays are in internal Morton order ("unordered"/`_u` view of
    the reference, SURVEY.md C9); `perm[i]` is the original index of Morton
    slot i, `inv_perm` its inverse. Nodes are level-major (slot 0 = root);
    each node's children occupy contiguous slots.
    """
    # particles (Morton order)
    pos: jnp.ndarray          # [N, D]
    mass: jnp.ndarray         # [N]
    code_hi: jnp.ndarray      # [N] uint32
    code_lo: jnp.ndarray      # [N] uint32
    perm: jnp.ndarray         # [N] int32
    inv_perm: jnp.ndarray     # [N] int32
    # flat nodes
    node_com: jnp.ndarray     # [M, D]
    node_mass: jnp.ndarray    # [M]
    node_begin: jnp.ndarray   # [M] int32 particle range start
    node_end: jnp.ndarray     # [M] int32 particle range end (exclusive)
    node_child_begin: jnp.ndarray  # [M] int32 (first child slot)
    node_child_count: jnp.ndarray  # [M] int32
    node_is_leaf: jnp.ndarray      # [M] bool
    node_level: jnp.ndarray        # [M] int32
    node_delta: jnp.ndarray        # [M] dist(COM, cell geometric center)
    node_quad: jnp.ndarray         # [M, Q] quadrupole moments about COM
    node_center: jnp.ndarray       # [M, D] geometric cell center
    node_parent: jnp.ndarray       # [M] int32 parent slot (root -> 0)
    node_cell: jnp.ndarray         # [M, D] int32 cell coords at own level
    n_nodes: jnp.ndarray           # [] int32 total nodes used
    overflow: jnp.ndarray          # [] bool node or tile capacity exceeded
    box_size: jnp.ndarray          # [] dtype
    # target tiles: ncrit-wide Morton slices within each deepest >ncrit
    # node (TPU re-tuning of rakau's critical nodes; cell-bounded extent).
    # With farfield="grid" tiles are additionally clipped at leaf-grid
    # cell boundaries so every tile lies in exactly one grid cell (the
    # stencil-coverage drop tests are then exact per tile, grid.py).
    tile_begin: jnp.ndarray        # [TC] int32 first particle
    tile_cnt: jnp.ndarray          # [TC] int32 particle count (0 = padding)
    tile_cell: jnp.ndarray         # [TC, D] int32 leaf-grid cell coords
    n_tiles: jnp.ndarray           # [] int32


def _quad_dim(ndim: int) -> int:
    return ndim * (ndim + 1) // 2


def sort_by_code(code_hi, code_lo, *arrays):
    """Lexicographic sort by (hi, lo) carrying arrays as sort payloads
    (payload columns ride the sort; no post-sort gathers).

    This is the ONLY sort path: the r1-r4 "near-sorted blockwise
    re-sort" (SURVEY C11 / BASELINE config #3's incremental label) was
    measured refuted at device scale — its in-graph verification failed
    on every step of both leapfrog workloads (cold collapse at dt=1e-3
    and the 32M disk), so both paths full-sorted and the machinery was
    pure overhead (PLAN r4 session 4; deleted per VERDICT r4 item 5)."""
    n = code_hi.shape[0]
    iota = jnp.arange(n, dtype=I32)
    cols = []
    splits = []
    for a in arrays:
        if a.ndim == 1:
            cols.append(a)
            splits.append(None)
        else:
            splits.append(a.shape[1])
            for d in range(a.shape[1]):
                cols.append(a[:, d])
    out = jax.lax.sort((code_hi, code_lo, iota) + tuple(cols), num_keys=2)
    hi_s, lo_s, perm = out[0], out[1], out[2]
    rest = list(out[3:])
    sorted_arrays = []
    for a, s in zip(arrays, splits):
        if s is None:
            sorted_arrays.append(rest.pop(0))
        else:
            sorted_arrays.append(jnp.stack([rest.pop(0) for _ in range(s)],
                                           axis=1))
    return hi_s, lo_s, perm, tuple(sorted_arrays)


def _inv_permutation(perm):
    """Inverse permutation via sort (scatter-free)."""
    n = perm.shape[0]
    _, inv = jax.lax.sort((perm, jnp.arange(n, dtype=I32)), num_keys=1)
    return inv


def build_tree(pos, mass, cfg: TreeConfig, box_size=None) -> TreeData:
    """Construct the tree (jittable; cfg static). Update paths re-sort
    in full: the near-sorted incremental re-sort was measured refuted
    and deleted (see sort_by_code)."""
    if box_size is None:
        box_size = particles.auto_box_size(pos)
    box_size = jnp.asarray(box_size, pos.dtype)
    n, ndim = pos.shape
    depth = cfg.max_depth
    B = cfg.code_bits
    qdim = _quad_dim(ndim)
    dtype = pos.dtype

    # ---- 1. encode + payload sort -------------------------------------
    cells = particles.discretize(pos, box_size, depth)
    chi, clo = morton.encode(cells, ndim, depth)
    hi_s, lo_s, perm, (pos_s, mass_s, cells_s) = sort_by_code(
        chi, clo, pos, mass, cells)
    inv_perm = _inv_permutation(perm)
    pidx = jnp.arange(n, dtype=I32)

    # ---- 2. LCP structure --------------------------------------------
    # cpl[i] = number of whole ndim-bit groups shared by codes i-1, i.
    xh = hi_s[1:] ^ hi_s[:-1]
    xl = lo_s[1:] ^ lo_s[:-1]
    eqbits = su.clz64_pair(xh, xl) - (64 - B)
    cpl = jnp.concatenate([jnp.zeros(1, I32),
                           jnp.minimum(eqbits // ndim, depth)])

    # Per-particle deepest splitting level (for leaves) and deepest
    # >ncrit level (for tile groups): counts are non-increasing in level,
    # so one forward cummax + one backward cummin per level suffice.
    # Levels are processed in BATCHED groups (one [G, N] multi-row scan
    # instead of G sequential [N] scans — the sequential per-level loop
    # was ~40 ms of device time at 1M); group size is memory-capped so
    # 64M-particle builds stay within HBM.
    lgroup = max(1, min(depth + 1, (64 << 20) // max(n, 1)))

    def level_counts_batch(ls):
        """ls [G] levels -> (R [G, N], cnt [G, N])."""
        is_head = (pidx[None, :] == 0) | (cpl[None, :] < ls[:, None])
        L = jax.lax.cummax(jnp.where(is_head, pidx[None, :], -1), axis=1)
        nxt = jnp.where(is_head, pidx[None, :], n)
        nxt = jnp.concatenate(
            [nxt[:, 1:], jnp.full((ls.shape[0], 1), n, I32)], axis=1)
        R = jnp.flip(jax.lax.cummin(jnp.flip(nxt, 1), axis=1), 1)
        return R, R - L

    # carry init derives from cpl (not a fresh constant) so that under
    # shard_map the "varying manual axes" of input and output carries
    # match; XLA constant-folds the arithmetic anyway.
    init_m1 = cpl * 0 - 1
    s_leaf, s_grp = init_m1, init_m1
    for l0 in range(0, depth + 1, lgroup):
        ls = jnp.arange(l0, min(l0 + lgroup, depth + 1), dtype=I32)
        R, cnt = level_counts_batch(ls)
        lcol = ls[:, None]
        s_leaf = jnp.maximum(s_leaf, jnp.max(jnp.where(
            (cnt > cfg.max_leaf_n) & (lcol < depth), lcol, -1), axis=0))
        s_grp = jnp.maximum(s_grp, jnp.max(jnp.where(
            cnt > cfg.ncrit, lcol, -1), axis=0))
    lam = jnp.clip(s_leaf + 1, 0, depth)       # leaf level per particle
    glvl = jnp.maximum(s_grp, 0)               # tile-group level

    # ---- 3. node table ------------------------------------------------
    # Particle i heads the nodes at levels (cpl[i], lam[i]].
    nc = jnp.maximum(0, lam - cpl)
    cum_nc = jnp.cumsum(nc)
    m1 = cum_nc[-1]
    M = cfg.node_capacity(n)
    overflow = (m1 + 1) > M

    k = jnp.arange(M - 1, dtype=I32)
    p_k = su.searchsorted_1d(cum_nc, k + 1)            # head particle
    valid_k = k < m1
    p_c = jnp.clip(p_k, 0, n - 1)
    prev_cum = jnp.where(p_c > 0, cum_nc[jnp.maximum(p_c - 1, 0)], 0)
    l_k = cpl[p_c] + 1 + (k - prev_cum)
    # level-major sort via packed key (level in top 5 bits; begin below —
    # requires n < 2^27, fine for single-chip shards)
    key = jnp.where(valid_k,
                    (l_k.astype(U32) << 27) | p_c.astype(U32),
                    jnp.asarray(0xFFFFFFFF, U32))
    skey, sp = jax.lax.sort((key, p_c), num_keys=1)
    svalid = skey != jnp.asarray(0xFFFFFFFF, U32)
    slvl = jnp.where(svalid, (skey >> 27).astype(I32), 0)
    sbegin = jnp.where(svalid, sp, 0)

    # prepend root (level 0, full range); root key is 0 which sorts first
    # among real keys only if no level-0 dupes exist — prepend explicitly.
    node_key = jnp.concatenate([jnp.zeros(1, U32), skey])
    node_level = jnp.concatenate([jnp.zeros(1, I32), slvl])
    node_begin = jnp.concatenate([jnp.zeros(1, I32), sbegin])
    node_valid = jnp.concatenate([jnp.ones(1, bool), svalid])
    n_nodes = m1 + 1

    # ---- 4. per-node counts via (batched) per-level boundary scans ----
    # Level groups are ALIGNED with step 2's loop (same `ls` arrays), so
    # XLA CSE evaluates each level's cummax/cummin pair ONCE for both
    # consumers — this halves the build's scan-pass volume (the build's
    # top cost at 8M; VERDICT r1 item 6). Level-0 rows are exact too
    # (R_0(0) = n), making the root row a plain member of the loop.
    node_cnt = jnp.full(M, 0, I32) + init_m1[0] + 1  # varying zero
    node_cnt = node_cnt.at[0].set(n)  # root (single-element update)
    bc = jnp.clip(node_begin, 0, n - 1)
    for l0 in range(0, depth + 1, lgroup):
        ls = jnp.arange(l0, min(l0 + lgroup, depth + 1), dtype=I32)
        R, _ = level_counts_batch(ls)
        g = ls.shape[0]
        inb = node_valid & (node_level >= l0) & (node_level < l0 + g)
        flat = jnp.clip(node_level - l0, 0, g - 1) * n + bc
        r = R.reshape(-1)[flat]
        node_cnt = jnp.where(inb, r - node_begin, node_cnt)
    node_end = node_begin + node_cnt

    # leaf flag: node level equals its head particle's leaf level
    lam_h = lam[jnp.clip(node_begin, 0, n - 1)]
    node_is_leaf = jnp.where(node_valid, node_level >= lam_h, True)

    # ---- 5. children: binary search in the level-major key order ------
    lvl1 = jnp.clip(node_level + 1, 0, 31).astype(U32)
    q_lo = (lvl1 << 27) | node_begin.astype(U32)
    q_hi = (lvl1 << 27) | node_end.astype(U32)
    cb = su.searchsorted_1d(node_key, q_lo).astype(I32)
    ce = su.searchsorted_1d(node_key, q_hi).astype(I32)
    internal = node_valid & ~node_is_leaf
    node_child_begin = jnp.where(internal, cb, 0)
    node_child_count = jnp.where(internal, ce - cb, 0)

    # ---- 6. mass/COM/quad via double-double prefix sums ---------------
    # ONE BATCHED [N, 1+ndim(+qdim)] dd scan + one batched boundary
    # gather covers mass, COM moments AND raw second moments (was
    # 1+ndim+qdim separate full-N scans/gathers; VERDICT r1 item 6
    # "cut the dd_cumsum count").
    mcols = [mass_s] + [mass_s * pos_s[:, d] for d in range(ndim)]
    if cfg.multipole_order >= 2:
        for a in range(ndim):
            for b2 in range(a, ndim):
                mcols.append(mass_s * pos_s[:, a] * pos_s[:, b2])
    mhi, mlo = su.dd_cumsum_cols(jnp.stack(mcols, axis=1))
    msegs_hi, msegs_lo = su.segment_sum_from_prefix_cols(
        mhi, mlo, node_begin, node_end, dd_out=True)  # [M, 1+D(+Q)]
    msegs = msegs_hi + msegs_lo

    msum = msegs[:, 0]
    node_mass = jnp.where(node_valid, msum, 0.0).astype(dtype)
    safe_m = jnp.where(msum != 0, msum, 1.0)
    node_com = (msegs[:, 1:1 + ndim] / safe_m[:, None]).astype(dtype)

    if cfg.multipole_order >= 2:
        comps = []
        ci = 1 + ndim
        for a in range(ndim):
            for b2 in range(a, ndim):
                # Parallel-axis shift about the COM: S_ab - M c_a c_b.
                # The shift nearly cancels S for tight far-from-origin
                # nodes, so subtract from the dd hi word (Sterbenz-exact
                # regime) and recover the low bits afterwards.
                t = msum * node_com[:, a] * node_com[:, b2]
                comps.append((msegs_hi[:, ci] - t) + msegs_lo[:, ci])
                ci += 1
        node_quad = jnp.stack(comps, axis=1).astype(dtype)
        node_quad = jnp.where(node_valid[:, None], node_quad, 0.0)
    else:
        node_quad = jnp.zeros((M, qdim), dtype)

    # ---- 7. cell centers, bh_geom delta, parents ----------------------
    head_cells = cells_s[jnp.clip(node_begin, 0, n - 1)]
    centers = particles.cell_center(head_cells, box_size, depth,
                                    node_level)
    dvec = node_com - centers
    node_delta = jnp.where(
        node_valid, jnp.sqrt(jnp.sum(dvec * dvec, axis=-1)), 0.0
    ).astype(dtype)
    node_center = jnp.where(node_valid[:, None], centers, 0.0).astype(dtype)

    # parent slot: the unique internal node whose contiguous child range
    # [child_begin, child_begin+count) contains the slot (binary search
    # over child_begin sorted with its slot payload).
    slots = jnp.arange(M, dtype=I32)
    cb_eff = jnp.where(node_child_count > 0, node_child_begin, M + 1)
    cb_sorted, slot_sorted = jax.lax.sort((cb_eff, slots), num_keys=1)
    ppos = jnp.clip(su.searchsorted_1d(cb_sorted, slots + 1) - 1, 0, M - 1)
    cand_par = slot_sorted[ppos]
    par_ok = ((slots >= node_child_begin[cand_par])
              & (slots < node_child_begin[cand_par]
                 + node_child_count[cand_par]) & node_valid)
    node_parent = jnp.where(par_ok, cand_par, 0)

    # ---- 8. tile table ------------------------------------------------
    glvl_prev = jnp.concatenate([jnp.zeros(1, I32), glvl[:-1]])
    head_g = (pidx == 0) | (glvl != glvl_prev) | (cpl < glvl)
    L0 = 0
    if cfg.farfield == "grid":
        from .grid import effective_grid_level
        L0 = effective_grid_level(cfg, n)
    elif cfg.farfield == "grid2" and cfg.traversal_mode == "gwalk":
        # gwalk has no per-pair kernel coverage mask; single-cell tiles
        # make the pool-row coverage drop exact per pair (engine.
        # _gwalk_impl), so clip tiles exactly like farfield="grid"
        from .grid2 import effective_grid_level as _g2lvl
        L0 = _g2lvl(cfg, n)
    if L0 > 0:
        # clip tile runs at leaf-grid cell boundaries (tiles must sit
        # inside one grid cell for exact stencil-coverage drops)
        head_g = head_g | (cpl < L0)
    seg_begin = jax.lax.cummax(jnp.where(head_g, pidx, 0))
    pos_in = pidx - seg_begin
    head_t = head_g | (pos_in % cfg.ncrit == 0)
    cum_t = jnp.cumsum(head_t.astype(I32))
    n_tiles = cum_t[-1]
    TC = cfg.tile_capacity(n)
    overflow = overflow | (n_tiles > TC)
    tq = jnp.arange(1, TC + 1, dtype=I32)
    tile_begin = su.searchsorted_1d(cum_t, tq)          # == n if none
    tnext = jnp.concatenate([tile_begin[1:], jnp.full(1, n, I32)])
    tvalid = tq <= n_tiles
    tile_begin = jnp.where(tvalid, tile_begin, 0)
    tile_cnt = jnp.where(tvalid, jnp.minimum(tnext, n) - tile_begin, 0)
    # leaf-grid cell of each tile (head particle's cell; exact because
    # tiles are clipped at grid-cell boundaries in grid mode)
    tile_cell = (cells_s[tile_begin] >> jnp.asarray(depth - L0, U32)
                 ).astype(I32)
    tile_cell = jnp.where(tvalid[:, None], tile_cell, 0)

    # per-node cell coords at the node's own level (traversal drop tests)
    shift_node = jnp.clip(depth - node_level, 0, 31).astype(U32)
    node_cell = (head_cells >> shift_node[:, None]).astype(I32)
    node_cell = jnp.where(node_valid[:, None], node_cell, 0)

    return TreeData(
        pos=pos_s, mass=mass_s, code_hi=hi_s, code_lo=lo_s,
        perm=perm, inv_perm=inv_perm,
        node_com=node_com, node_mass=node_mass,
        node_begin=jnp.where(node_valid, node_begin, 0),
        node_end=jnp.where(node_valid, node_end, 0),
        node_child_begin=node_child_begin,
        node_child_count=node_child_count,
        node_is_leaf=node_is_leaf, node_level=node_level,
        node_delta=node_delta, node_quad=node_quad,
        node_center=node_center, node_parent=node_parent,
        node_cell=node_cell,
        n_nodes=n_nodes, overflow=overflow, box_size=box_size,
        tile_begin=tile_begin, tile_cnt=tile_cnt, tile_cell=tile_cell,
        n_tiles=n_tiles)

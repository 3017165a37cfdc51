"""Walk-free shared-candidate traversal via a monotone local MAC
(`traversal_mode="lmac"`).

traversal2's union walk still pays per-round taxes that dominate device
time at scale (measured @1M: ~4.4 ms walk + ~7 ms materialization vs
~4.5 ms kernel per 64-tile chunk): per-round [C, K] decision panels,
frontier compaction scatters, and [K, W] node-row gathers. This module
removes the walk entirely by restructuring the MAC so that membership in
the interaction set is a PURE PER-NODE PREDICATE — one fused elementwise
pass over the flat node table per chunk, one compaction, one row gather.

The key is a *monotone* acceptance criterion measured box-to-box:

    A(t, v) :=  dist_min(tile_box_t, cell_box_v)^2  >  R_v^2,
    R_v     :=  edge_v / theta  (+ delta_v for mac="bh_geom").

Because a child's cell box is contained in its parent's and R halves
with the edge, A(t, parent) implies A(t, child) — exactly (for bh_geom
this additionally needs delta_c <= delta_p + edge_p/(2 theta), which
holds whenever theta <= 2/sqrt(D) since delta <= sqrt(D)/2 * edge; the
engine asserts theta within that range for lmac+bh_geom). Along any
root-to-leaf path A is therefore 0...0 1...1 with a unique transition,
so the classic path-dependent walk collapses to a local rule:

    tile t takes node v as M2P  iff  A(t, v) and not A(t, parent(v));
    tile t takes leaf v as P2P  iff  not A(t, v).

Every unit of mass is counted exactly once (the transition node), with
NO traversal state. Accuracy: A is *stricter* than the reference's
COM-distance bh test (dist_min to the cell box <= dist to the COM), so
the error envelope is at most the walk's at equal theta; equal-error
operating points sit at a larger theta (~ +0.2 at theta=0.75).

Chunk-level candidate selection is the same rule evaluated conservatively
against the chunk's bounding box (dist_min for "some tile might open",
dist_max for "every tile accepts"), giving a per-node relevance bit; the
compacted survivors become the chunk's shared source rows and the exact
per-tile masks are ONE dense elementwise [C, S] panel — the kernels and
the engine's far-field gates consume the result through the same
SharedSources contract as traversal2.

grid2/grid far fields compose exactly as in traversal2: acceptance is
additionally gated to levels >= L0 (A_g(t,v) := A(t,v) and lvl_v >= L0,
still monotone since levels increase downward), and stencil-covered
pairs (cell separation >= S at the node's effective grid level) are
dropped; coverage persists under refinement (grid2.py), so the combined
predicate A_full = A_g or covered stays monotone and the partition
argument is unchanged.

Reference mapping (SURVEY.md C7): this replaces the recursive/stack
traversal and interaction-list machinery; rakau resolves path dependence
with per-thread stacks, the TPU answer is to make the criterion
path-free.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import scan_utils as su
from .build import TreeData
from .config import TreeConfig, MAC_BH_GEOM
from .traversal2 import SharedSources, _grid_l0, _grid_sep

I32 = jnp.int32


class LmacTables:
    """Packed per-node table for the predicate pass and row gathers.

    lm [M, W] f32 columns (D = ndim, Q = quad dim if multipole_order>=2):
      0..D-1      com                  (kernel source position)
      D           mass                 (0 for invalid/sentinel nodes)
      D+1..2D     center               (own cell-box center)
      2D+1        lvl + 64*leaf_flag
      2D+2        plvl                 (parent level; -9 for the root so
                                        R_parent is effectively infinite)
      2D+3        delta  (bh_geom COM offset; else 0)
      2D+4        pdelta (parent's delta; else 0)
      2D+5        cellpack (effective grid cell, D x L0-bit fields; 0 if
                            no grid far field)
      2D+6..3D+5  pcenter              (parent cell-box center)
      3D+6..      quad (Q cols, multipole_order>=2 only)
    pm [N, 4] f32: particle pos (padded to 3) + mass (P2P row gather).
    """

    def __init__(self, lm, pm, ndim, L0):
        self.lm = lm
        self.pm = pm
        self.ndim = ndim
        self.L0 = L0

    # pytree protocol so tables pass through jit boundaries like the
    # traversal2 NamedTuple does
    def tree_flatten(self):
        return (self.lm, self.pm), (self.ndim, self.L0)

    @classmethod
    def tree_unflatten(cls, aux, children):
        lm, pm = children
        return cls(lm, pm, aux[0], aux[1])


jax.tree_util.register_pytree_node(
    LmacTables, LmacTables.tree_flatten, LmacTables.tree_unflatten)


def make_tables(td: TreeData, cfg: TreeConfig) -> LmacTables:
    dtype = td.pos.dtype
    M = td.node_level.shape[0]
    n, D = td.pos.shape
    L0 = _grid_l0(cfg, n)
    box = td.box_size

    lvl = td.node_level
    leaf = td.node_is_leaf
    # effective grid cell at min(level, L0), packed D x L0-bit fields
    sh = jnp.maximum(lvl - L0, 0)
    cpack = jnp.zeros(M, I32)
    if L0 > 0:
        for d in range(D):
            cpack = cpack | ((td.node_cell[:, d] >> sh) << (d * L0))

    # parent cell-box center: closed form from own cell coords (children
    # live inside their parent's cell), no parent gather needed
    plvl = jnp.maximum(lvl - 1, 0)
    pcs = box * jnp.exp2(-plvl.astype(dtype))
    pcenter = ((td.node_cell >> 1).astype(dtype) + 0.5) * pcs[:, None] \
        - box / 2
    is_root = jnp.arange(M, dtype=I32) == 0
    pcenter = jnp.where(is_root[:, None], td.node_center, pcenter)
    plvl_f = jnp.where(is_root, -9.0, (lvl - 1).astype(dtype))

    if cfg.mac == MAC_BH_GEOM:
        delta = td.node_delta
        pdelta = jnp.where(is_root, 0.0, td.node_delta[td.node_parent])
    else:
        delta = jnp.zeros(M, dtype)
        pdelta = delta

    cols = [td.node_com[:, d] for d in range(D)]
    cols.append(td.node_mass)
    cols += [td.node_center[:, d] for d in range(D)]
    cols.append((lvl + 64 * leaf.astype(I32)).astype(dtype))
    cols.append(plvl_f)
    cols.append(delta)
    cols.append(pdelta)
    cols.append(cpack.astype(dtype))
    cols += [pcenter[:, d] for d in range(D)]
    lm = jnp.stack(cols, axis=1)
    if cfg.multipole_order >= 2:
        lm = jnp.concatenate([lm, td.node_quad], axis=1)

    pmc = [td.pos[:, d] for d in range(D)]
    pmc += [jnp.zeros(n, dtype)] * (3 - D) + [td.mass]
    pm = jnp.stack(pmc, axis=1)
    return LmacTables(lm=lm, pm=pm, ndim=D, L0=L0)


def _box_dist2_min(alo, ahi, blo, bhi):
    """Min squared distance between boxes [..., D] (broadcasting)."""
    d = jnp.maximum(jnp.maximum(blo - ahi, alo - bhi), 0.0)
    return jnp.sum(d * d, axis=-1)


def _box_dist2_max_pt(alo, ahi, blo, bhi):
    """max over a in A of dist(a, B)^2 (for the every-tile-accepts test)."""
    d = jnp.maximum(jnp.maximum(blo - alo, ahi - bhi), 0.0)
    return jnp.sum(d * d, axis=-1)


def _clamp_theta(cfg: TreeConfig, theta, dtype, D: int):
    """bh_geom monotonicity clamp (see build_shared_sources)."""
    theta = jnp.asarray(theta, dtype)
    if cfg.mac == MAC_BH_GEOM:
        theta = jnp.minimum(theta, jnp.asarray(2.0 / D ** 0.5, dtype))
    return theta


def _box_selection(lm, D, box, dtype, theta_inv, bh_geom, use_grid,
                   L0, S_sep, ch_lo, ch_hi, ch_clo, ch_chi):
    """The ONE fused elementwise relevance pass over node rows `lm`
    against a bounding box (a tile chunk's or a whole slice group's).

    Returns (m2p_sel, p2p_sel): conservative supersets of "some target
    box inside [ch_lo, ch_hi] takes this row as M2P / P2P". Conservative
    in the box: enlarging the box only enlarges both sets (dist_min
    shrinks, dist_max grows, cell separations shrink), which is what
    makes group-level pre-filtering sound (build_group_candidates)."""
    M = lm.shape[0]
    mass = lm[:, D]
    center = lm[:, D + 1:2 * D + 1]
    lvl_leaf = lm[:, 2 * D + 1].astype(I32)
    lvl = lvl_leaf & 63
    leaf = lvl_leaf >= 64
    plvl = lm[:, 2 * D + 2]
    delta = lm[:, 2 * D + 3]
    pdelta = lm[:, 2 * D + 4]
    cpack = lm[:, 2 * D + 5].astype(I32)
    pcenter = lm[:, 2 * D + 6:3 * D + 6]

    e_v = box * jnp.exp2(-lvl.astype(dtype))                    # [M]
    e_p = box * jnp.exp2(-plvl)
    R_v = e_v * theta_inv + (delta if bh_geom else 0.0)
    R_p = e_p * theta_inv + (pdelta if bh_geom else 0.0)
    vlo = center - 0.5 * e_v[:, None]
    vhi = center + 0.5 * e_v[:, None]
    plo = pcenter - 0.5 * e_p[:, None]
    phi = pcenter + 0.5 * e_p[:, None]

    # "some target might open the parent" (conservative): the box is
    # within R_p of the parent's cell box, and the parent is acceptable
    # at all (below-L0 parents are never accepted -> always opened).
    d2_p = _box_dist2_min(ch_lo, ch_hi, plo, phi)               # [M]
    par_acc_all = d2_p > R_p * R_p
    if use_grid:
        par_acc_all = par_acc_all & (plvl >= L0)
    relevant = ~par_acc_all & (mass > 0)
    if use_grid:
        # whole box covered by the stencil at v -> v contributes nothing
        sh_t = jnp.maximum(L0 - lvl, 0)                          # [M]
        fmask = (1 << L0) - 1
        sep = None
        for d in range(D):
            nc = (cpack >> (d * L0)) & fmask                     # [M]
            tl = ch_clo[d] >> sh_t
            th = ch_chi[d] >> sh_t
            sd = jnp.maximum(jnp.maximum(nc - th, tl - nc), 0)
            sep = sd if sep is None else jnp.maximum(sep, sd)
        relevant = relevant & (sep < S_sep)
    d2_vmin = _box_dist2_min(ch_lo, ch_hi, vlo, vhi)
    d2_vmax = _box_dist2_max_pt(ch_lo, ch_hi, vlo, vhi)
    some_accepts = d2_vmax > R_v * R_v            # conservative superset
    some_opens = d2_vmin <= R_v * R_v
    if use_grid:
        some_accepts = some_accepts & (lvl >= L0)
        some_opens = some_opens | (lvl < L0)
    m2p_sel = relevant & some_accepts
    p2p_sel = relevant & leaf & some_opens
    return m2p_sel, p2p_sel


class GroupCand:
    """Slice-level candidate node rows (the lmac group pre-filter).

    The per-chunk predicate pass costs O(node_capacity) per chunk — at
    8M that is ~2M rows x ~660 chunks, the walk's scaling wall. A slice
    of K chunks first runs the SAME selection against the slice's
    bounding box (a conservative superset of every chunk's selection,
    see _box_selection), compacts the survivors once, and hands the
    per-chunk passes a GCAP-row candidate table instead of the full node
    table. Results are bit-identical: the chunk predicate re-runs
    exactly on the surviving rows, and the table is pre-sorted ONCE by
    (node_begin, node_idx) — the key the per-chunk Morton re-sorts used
    — so per-chunk compaction (which preserves row order) already
    yields that order and build_shared_sources skips its two per-chunk
    lax.sorts entirely when given a cand table."""

    def __init__(self, lm, begin, end, overflow, count):
        self.lm = lm            # [GCAP, W] candidate rows (lm layout)
        self.begin = begin      # [GCAP] int32 node_begin (0 for padding)
        self.end = end          # [GCAP] int32 node_end (0 for padding)
        self.overflow = overflow  # [] bool
        self.count = count      # [] int32

    def tree_flatten(self):
        return (self.lm, self.begin, self.end, self.overflow,
                self.count), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    GroupCand, GroupCand.tree_flatten, GroupCand.tree_unflatten)


def build_group_candidates(td: TreeData, cfg: TreeConfig, theta,
                           box_lo, box_hi, tables: LmacTables,
                           tile_valid=None, tcell_lo=None, tcell_hi=None,
                           cap: int = None) -> GroupCand:
    """Conservative relevance pre-filter for a GROUP of tiles (jittable).

    box_lo/box_hi [G, D]: every tile box in the group (typically one
    host-driver slice = slice_chunks x tile_chunk tiles); tile_valid [G];
    tcell_lo/tcell_hi [G, D] in grid2 mode. cap defaults to
    cfg.frontier_cap — lmac has no walk frontier, so that capacity knob
    (and its overflow flag / maxima slot) is reused for the group table;
    the standard overflow-retry/tune_caps machinery then sizes it."""
    dtype = td.pos.dtype
    D = box_lo.shape[1]
    theta = _clamp_theta(cfg, theta, dtype, D)
    theta_inv = 1.0 / theta
    lm = tables.lm
    M = lm.shape[0]
    use_grid = cfg.farfield in ("grid", "grid2") and tables.L0 > 0
    L0 = tables.L0 if use_grid else 0
    S_sep = _grid_sep(cfg)
    if cap is None:
        cap = cfg.frontier_cap
    if tile_valid is None:
        tile_valid = jnp.ones((box_lo.shape[0],), bool)
    big = jnp.asarray(jnp.finfo(dtype).max / 4, dtype)
    tv = tile_valid[:, None]
    g_lo = jnp.min(jnp.where(tv, box_lo, big), axis=0)
    g_hi = jnp.max(jnp.where(tv, box_hi, -big), axis=0)
    g_clo = g_chi = None
    if use_grid:
        bigc = jnp.asarray(1 << 30, I32)
        g_clo = jnp.min(jnp.where(tv, tcell_lo, bigc), axis=0)
        g_chi = jnp.max(jnp.where(tv, tcell_hi, -1), axis=0)

    m2p_sel, p2p_sel = _box_selection(
        lm, D, td.box_size, dtype, theta_inv, cfg.mac == MAC_BH_GEOM,
        use_grid, L0, S_sep, g_lo, g_hi, g_clo, g_chi)
    sel = m2p_sel | p2p_sel
    gidx, gcnt = su.compact_indices(sel, cap)
    gvalid = gidx < M
    gidx_c = jnp.clip(gidx, 0, M - 1)
    # Pre-sort the candidate table by (node_begin, node_idx) ONCE per
    # slice. Per-chunk compaction preserves row order, so every chunk's
    # selected rows come out already in the (begin, node_idx) order the
    # per-chunk Morton re-sorts used to produce — build_shared_sources
    # skips its two lax.sorts when given a cand table. Bit-identical:
    # the chunk sort was stable on begin with compaction (= ascending
    # node idx) ties, which is exactly this key pair.
    n = td.pos.shape[0]
    gkey = jnp.where(gvalid, td.node_begin[gidx_c], n)
    _, gidx_c, gvalid = jax.lax.sort((gkey, gidx_c, gvalid), num_keys=1)
    glm = jnp.where(gvalid[:, None], lm[gidx_c], 0.0)
    # padding rows: mass column already 0 -> never relevant downstream
    begin = jnp.where(gvalid, td.node_begin[gidx_c], 0)
    end = jnp.where(gvalid, td.node_end[gidx_c], 0)
    return GroupCand(lm=glm, begin=begin, end=end,
                     overflow=gcnt > cap, count=gcnt)


def build_shared_sources(td: TreeData, cfg: TreeConfig, theta,
                         box_lo, box_hi, tables: LmacTables = None,
                         tile_cell=None, tile_valid=None,
                         tcell_lo=None, tcell_hi=None,
                         cand: GroupCand = None) -> SharedSources:
    """One chunk's shared sources by the local-MAC predicate (jittable).

    Same contract as traversal2.build_shared_sources. With `cand` (the
    slice-level pre-filter from build_group_candidates) the predicate
    pass runs over the GCAP candidate rows instead of the full node
    table — bit-identical results, O(GCAP) instead of O(node_capacity)
    per chunk; cand's own overflow rides overflow[3] (the frontier slot,
    which lmac does not otherwise use)."""
    C, D = box_lo.shape
    dtype = td.pos.dtype
    n = td.pos.shape[0]
    # bh_geom monotonicity clamp: the partition proof (module docstring)
    # needs A(t, parent) => A(t, child), which with bh_geom's delta term
    # holds only for theta <= 2/sqrt(D). Clamp HERE — not at the API
    # layer — so no direct caller (engine, LET, sharded, benchmarks) can
    # run a non-monotone acceptance that double/zero-counts node masses.
    # Clamping only tightens the MAC; Tree._query raises loudly too.
    theta = _clamp_theta(cfg, theta, dtype, D)
    theta_inv = 1.0 / theta
    if tables is None:
        tables = make_tables(td, cfg)
    if cand is not None:
        lm = cand.lm
        node_begin, node_end = cand.begin, cand.end
        ovf_cand = cand.overflow
    else:
        lm = tables.lm
        node_begin, node_end = td.node_begin, td.node_end
        ovf_cand = jnp.zeros((), bool)
    M = lm.shape[0]
    use_grid = cfg.farfield in ("grid", "grid2") and tables.L0 > 0
    emit_cells = cfg.farfield == "grid2" and use_grid
    L0 = tables.L0 if use_grid else 0
    S_sep = _grid_sep(cfg)
    if tcell_lo is None:
        tcell_lo = tile_cell
    if tcell_hi is None:
        tcell_hi = tile_cell
    if tile_valid is None:
        tile_valid = jnp.ones((C,), bool)

    box = td.box_size
    bh_geom = cfg.mac == MAC_BH_GEOM

    # ---- EXACT per-tile membership panels over all candidate rows ------
    # Selection by the chunk's bounding box (a conservative superset) is
    # catastrophic for concentrated distributions: a chunk of scattered
    # sparse tiles has a bounding box wrapping the whole core, so its
    # m2p/p2p capacity — and every chunk's padded panel cost — was sized
    # by rows NO tile actually uses (measured at 262k Plummer: worst
    # chunk 54 real targets, 252k p2p rows). One elementwise [C, K]
    # panel pass over the candidate rows instead gives the exact
    # per-tile predicate BEFORE compaction; rows are kept iff SOME tile
    # takes them, and the per-tile masks are sliced from the same
    # panels. Cost: O(C * K) elementwise — the pass the per-tile masks
    # needed anyway, now reused for selection.
    mass_r = lm[:, D]
    center_r = lm[:, D + 1:2 * D + 1]
    lvl_leaf_r = lm[:, 2 * D + 1].astype(I32)
    lvl_r = lvl_leaf_r & 63
    leaf_r = lvl_leaf_r >= 64
    plvl_r = lm[:, 2 * D + 2]
    e_r = box * jnp.exp2(-lvl_r.astype(dtype))
    R_r = e_r * theta_inv + (lm[:, 2 * D + 3] if bh_geom else 0.0)
    pe_r = box * jnp.exp2(-plvl_r)
    pR_r = pe_r * theta_inv + (lm[:, 2 * D + 4] if bh_geom else 0.0)
    pctr_r = lm[:, 2 * D + 6:3 * D + 6]
    cpack_r = lm[:, 2 * D + 5].astype(I32)

    tlo = box_lo[:, None, :]                                     # [C,1,D]
    thi = box_hi[:, None, :]

    def tile_accepts(ctr, e, R):
        """[C, K] A(t, row) for row cell boxes (center ctr, edge e)."""
        rlo = ctr - 0.5 * e[:, None]
        rhi = ctr + 0.5 * e[:, None]
        d2 = _box_dist2_min(tlo, thi, rlo[None], rhi[None])
        return d2 > (R * R)[None, :]

    acc_v_all = tile_accepts(center_r, e_r, R_r)                 # [C, K]
    acc_p_all = tile_accepts(pctr_r, pe_r, pR_r)
    if use_grid:
        acc_v_all = acc_v_all & (lvl_r >= L0)[None, :]
        acc_p_all = acc_p_all & (plvl_r >= L0)[None, :]
    live = tile_valid[:, None] & (mass_r > 0)[None, :]
    m2p_pan = acc_v_all & ~acc_p_all & live                      # [C, K]
    p2p_pan = ~acc_v_all & leaf_r[None, :] & live
    if use_grid:
        # per-tile stencil-coverage drop (sep >= S at the row's
        # effective grid level against this tile's cell range) — sound
        # for leaves above L0 too: separation at a coarser level only
        # scales up under refinement
        sh_t = jnp.maximum(L0 - lvl_r, 0)
        fmask = (1 << L0) - 1
        sep = None
        for d in range(D):
            nc = (cpack_r >> (d * L0)) & fmask
            tl2 = tcell_lo[:, d:d + 1] >> sh_t[None, :]
            th2 = tcell_hi[:, d:d + 1] >> sh_t[None, :]
            sd = jnp.maximum(jnp.maximum(nc[None, :] - th2,
                                         tl2 - nc[None, :]), 0)
            sep = sd if sep is None else jnp.maximum(sep, sd)
        keep = sep < S_sep
        m2p_pan = m2p_pan & keep
        p2p_pan = p2p_pan & keep
    m2p_sel = jnp.any(m2p_pan, axis=0)                           # [K]
    p2p_sel = jnp.any(p2p_pan, axis=0)

    sentinel = jnp.asarray(4.0, dtype) * box
    ucap = cfg.m2p_cap

    # M2P rows: Morton re-sort by node_begin (clusters a tile's active
    # sources for the fused kernel's block compaction, as traversal2).
    # A cand table is already (begin, node_idx)-sorted by
    # build_group_candidates, and compaction preserves row order — skip
    # the per-chunk sort entirely in that case (bit-identical order).
    uidx, ucnt = su.compact_indices(m2p_sel, ucap)
    uvalid = uidx < M
    uidx_c = jnp.clip(uidx, 0, M - 1)
    if cand is not None:
        un_ids = uidx_c
    else:
        ukey = jnp.where(uvalid, node_begin[uidx_c], n)
        _, un_ids, uvalid = jax.lax.sort((ukey, uidx_c, uvalid),
                                         num_keys=1)
    m_row = lm[un_ids]                               # ONE row gather
    m_pos = jnp.where(uvalid[:, None], m_row[:, :D], sentinel)
    m_mass = jnp.where(uvalid, m_row[:, D], 0.0)
    m_idx = jnp.full(ucap, -1, I32)
    ovf_uni = ucnt > ucap

    # per-tile mask = the SAME panel, sliced at the compacted rows
    m_mask = (jnp.take_along_axis(m2p_pan, un_ids[None, :], axis=1)
              & uvalid[None, :]).T                               # [ucap, C]
    m_cell = None
    if emit_cells:
        m_cpack = m_row[:, 2 * D + 5].astype(I32)
        fmask = (1 << L0) - 1
        m_cell = jnp.stack(
            [(m_cpack >> (d * L0)) & fmask for d in range(D)], axis=1)
        m_cell = jnp.where(uvalid[:, None], m_cell, -1)
    m_quad = None
    if cfg.multipole_order >= 2:
        qdim = D * (D + 1) // 2
        m_quad = jnp.where(uvalid[:, None],
                           m_row[:, 3 * D + 6:3 * D + 6 + qdim], 0.0)

    # ---- P2P: leaves some tile opens, expanded to their particles ------
    pcap = cfg.p2p_src_cap
    lcap = cfg.p2p_leaf_cap
    lidx, lcnt = su.compact_indices(p2p_sel, lcap)
    lvalid = lidx < M
    lidx_c = jnp.clip(lidx, 0, M - 1)
    if cand is not None:
        lf_ids = lidx_c
    else:
        lkey = jnp.where(lvalid, node_begin[lidx_c], n)
        _, lf_ids, lvalid = jax.lax.sort((lkey, lidx_c, lvalid),
                                         num_keys=1)
    ovf_leaf = lcnt > lcap
    leaf_mask = (jnp.take_along_axis(p2p_pan, lf_ids[None, :], axis=1)
                 ).T & lvalid[:, None]                           # [lcap, C]

    lb = jnp.where(lvalid, node_begin[lf_ids], 0)
    lc = jnp.where(lvalid, node_end[lf_ids] - node_begin[lf_ids], 0)
    offs = jnp.cumsum(lc) - lc
    total_p = offs[-1] + lc[-1]
    ovf_p2p = total_p > pcap
    kq = jnp.arange(pcap, dtype=I32)
    marks = jnp.zeros(pcap + 1, I32).at[
        jnp.where(lc > 0, jnp.minimum(offs, pcap), pcap)].add(1)
    row = jnp.cumsum(marks[:pcap]) - 1
    row = jnp.maximum(row, 0)
    rvalid = kq < jnp.minimum(total_p, pcap)
    row_c = jnp.clip(row, 0, lcap - 1)
    pidx = jnp.where(rvalid, lb[row_c] + (kq - offs[row_c]), -1)
    pidx_c = jnp.clip(pidx, 0, n - 1)
    p_row = tables.pm[pidx_c]                        # ONE row gather
    p_pos = jnp.where(rvalid[:, None], p_row[:, :D], sentinel)
    p_mass = jnp.where(rvalid, p_row[:, 3], 0.0)
    p_mask = (leaf_mask[row_c] & rvalid[:, None]
              & (p_mass > 0)[:, None])                           # [pcap, C]
    p_cell = None
    if use_grid:
        # per-particle coverage refinement for leaves above L0 (exact per
        # pair in grid2's kernels; conservative range test here)
        from . import particles as pmod
        pcell = (pmod.discretize(p_pos, box, cfg.max_depth)
                 >> jnp.asarray(cfg.max_depth - L0, jnp.uint32)
                 ).astype(I32)
        pd = jnp.maximum(jnp.maximum(
            pcell[:, None, :] - tcell_hi[None, :, :],
            tcell_lo[None, :, :] - pcell[:, None, :]), 0)
        psep = jnp.max(pd, axis=-1)                              # [pcap, C]
        p_mask = p_mask & (psep < S_sep)
        if emit_cells:
            p_cell = pcell

    pos = jnp.concatenate([m_pos, p_pos], axis=0).astype(dtype)
    mass_o = jnp.concatenate([m_mass, p_mass], axis=0).astype(dtype)
    idx = jnp.concatenate([m_idx, pidx], axis=0)
    mask = jnp.concatenate([m_mask, p_mask], axis=0).T           # [C, S]
    cell = None
    if emit_cells:
        cell = jnp.concatenate([m_cell, p_cell], axis=0)

    vary0 = (ucnt * 0)
    return SharedSources(
        pos=pos, mass=mass_o, idx=idx, mask=mask,
        count=jnp.minimum(ucnt, ucap) + jnp.minimum(total_p, pcap),
        overflow=jnp.stack([ovf_uni, ovf_leaf, ovf_p2p,
                            ovf_cand | (vary0 > 0)]),
        maxima=jnp.stack([ucnt, ucnt + total_p, vary0, lcnt]),
        cell=cell, quad=m_quad)

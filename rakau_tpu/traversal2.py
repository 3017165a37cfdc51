"""Shared-candidate traversal: one union walk per tile-chunk, per-tile
masks by a hereditary MAC.

The list-building traversal (traversal.py) pays ~10 ns/element irregular
access for every (tile, candidate) pair — measured 40 s/query at 1M.
This version exploits that neighboring tiles share almost all of their
interaction lists:

  * ONE union frontier per chunk of C tiles walks the tree (1-row
    gathers of node fields per round — negligible volume);
  * per-tile decisions are dense elementwise [C, K] panels over the
    shared candidates;
  * the MAC measures the distance from the tile AABB to the node's CELL
    BOX (not its COM). Cell boxes nest and sizes halve per level, so
    rejection is *hereditary*: reject(parent) => reject(every ancestor).
    A node therefore contributes to tile c exactly when
        accept_c(node) AND reject_c(parent),
    a two-term test recomputable from (node box, parent box) alone —
    no per-round mask storage, no per-tile lists;
  * the walk emits one shared source array per chunk (M2P node entries
    + P2P leaf entries expanded to particles, Morton-ordered) carrying
    the geometry needed for the two-term mask; the kernel (or the XLA
    fallback) evaluates masks on the fly.

Box-distance MAC is conservative versus rakau's COM-distance MAC (it
opens at least as much), so accuracy per theta is preserved or slightly
improved. bh_geom adds the COM offset delta exactly as before.
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
    """Per-chunk shared source set (padded static shapes).

    Each source is either a node monopole (M2P; src_idx == -1) or a real
    particle (P2P). Geometry columns drive the per-tile hereditary mask:
    a source contributes to tile c iff
        dist(tileAABB_c, nbox) >  nsize/theta (+delta)   [accept node]
     AND dist(tileAABB_c, pbox) <= psize/theta (+pdelta) [parent opened]
    For P2P entries the "node" box is the leaf's box and acceptance is
    inverted (leaf must be rejected): stored sign column handles it."""
    pos: jnp.ndarray        # [S, D] source position (COM or particle)
    mass: jnp.ndarray       # [S]
    idx: jnp.ndarray        # [S] int32 Morton particle id; -1 for nodes
    is_p2p: jnp.ndarray     # [S] bool
    nbox_c: jnp.ndarray     # [S, D] own cell-box center
    nbox_s: jnp.ndarray     # [S] own cell size (edge)
    ndelta: jnp.ndarray     # [S] own bh_geom delta
    pbox_c: jnp.ndarray     # [S, D] parent cell-box center
    pbox_s: jnp.ndarray     # [S] parent cell size
    pdelta: jnp.ndarray     # [S] parent bh_geom delta
    count: jnp.ndarray      # [] int32 valid entries
    overflow: jnp.ndarray   # [3] bool (frontier, union, p2p expansion)
    maxima: jnp.ndarray     # [3] int32 (union nodes, total sources, frontier)


def _box_dist2(lo, hi, bc, bs):
    """Squared distance tile-AABB [C,1,D] <-> cell box (bc [*,D], bs [*]).
    Returns [C, K]."""
    half = 0.5 * bs[..., None]
    blo = bc - half
    bhi = bc + half
    d = jnp.maximum(jnp.maximum(lo - bhi[None], blo[None] - hi), 0.0)
    return jnp.sum(d * d, axis=-1)


def _accept(cfg, theta_inv, d2, size, delta):
    thresh = size * theta_inv
    if cfg.mac == MAC_BH_GEOM:
        thresh = thresh + delta
    return d2 > thresh * thresh


def build_shared_sources(td: TreeData, cfg: TreeConfig, theta,
                         box_lo, box_hi) -> SharedSources:
    """One chunk's union walk. box_lo/hi: [C, D] tile AABBs."""
    C, D = box_lo.shape
    dtype = td.pos.dtype
    theta_inv = 1.0 / jnp.asarray(theta, dtype)
    lo = box_lo[:, None, :]
    hi = box_hi[:, None, :]
    M = td.node_level.shape[0]
    n = td.pos.shape[0]

    fcap = cfg.frontier_cap
    k8 = 2 ** cfg.ndim
    K = fcap * k8

    ucap = cfg.m2p_cap          # union node entries cap (m2p + p2p leaves)
    # Zero-inits derive from an input so their sharding/varying type
    # matches loop-carry outputs under shard_map (scan-vma tracking).
    vary0 = (box_lo[0, 0] * 0).astype(I32)
    # union accumulators: one growing union list via per-round append
    # with 1-row compaction (cheap at these sizes).
    uni = jnp.full(ucap, -1, I32) + vary0
    uni_cnt = vary0
    ovf_uni = vary0 > 0

    # frontier: union of per-tile open sets, with per-tile active masks
    # stored [fcap, C] (lane-major for cheap row gathers on compaction)
    frontier = jnp.zeros(fcap, I32)
    f_cnt = jnp.asarray(1, I32)                 # root
    f_active = jnp.zeros((fcap, C), bool).at[0].set(True)
    ovf_frontier = jnp.asarray(False)
    f_max = jnp.asarray(1, I32)

    node_center = td.node_center
    node_size = td.box_size * jnp.exp2(-td.node_level.astype(dtype))

    def classify(ids, par_active_kc):
        """ids [K] node slots (-1 invalid); par_active [K, C] whether the
        parent was opened by tile c. Returns per-node union-selection and
        next-frontier data."""
        valid = ids >= 0
        ids_c = jnp.where(valid, ids, 0)
        bc = node_center[ids_c]                        # [K, D]
        bs = node_size[ids_c]                          # [K]
        delta = td.node_delta[ids_c]
        leaf = td.node_is_leaf[ids_c]
        mass = td.node_mass[ids_c]
        d2 = _box_dist2(lo, hi, bc, bs)                # [C, K]
        acc = _accept(cfg, theta_inv, d2, bs[None, :], delta[None, :])
        pa = par_active_kc.T                           # [C, K]
        use = pa & valid[None, :]
        accepted = acc & use                           # m2p for tile c
        opened = (~acc) & use                          # descends / p2p
        sel_m2p = jnp.any(accepted & (mass > 0)[None, :], axis=0)
        sel_p2p = jnp.any(opened & leaf[None, :], axis=0)
        next_active = opened & (~leaf)[None, :]        # [C, K]
        return sel_m2p | sel_p2p, next_active

    def append_union(uni, uni_cnt, ovf, sel, ids):
        idxs, cnt = su.compact_indices(sel, ucap)
        take = jnp.where(idxs < sel.shape[0], ids[jnp.clip(idxs, 0,
                                                           sel.shape[0] - 1)],
                         -1)
        # write at offset uni_cnt via roll-free dynamic slice union
        pos = jnp.arange(ucap, dtype=I32)
        src_slot = pos - uni_cnt
        grab = (src_slot >= 0) & (src_slot < jnp.minimum(cnt, ucap))
        vals = take[jnp.clip(src_slot, 0, ucap - 1)]
        uni = jnp.where(grab, vals, uni)
        new_cnt = uni_cnt + cnt
        return uni, jnp.minimum(new_cnt, ucap), ovf | (new_cnt > ucap)

    def round_body(r, carry):
        (frontier, f_cnt, f_active, uni, uni_cnt, ovf_uni, ovf_frontier,
         f_max) = carry
        fvalid = jnp.arange(fcap, dtype=I32) < f_cnt
        fr = jnp.where(fvalid, frontier, 0)
        cb = td.node_child_begin[fr]
        cc = td.node_child_count[fr]
        kids = (cb[:, None] + jnp.arange(k8, dtype=I32)).reshape(-1)
        kval = (jnp.arange(k8, dtype=I32)[None, :]
                < cc[:, None]).reshape(-1) & jnp.repeat(fvalid, k8)
        ids = jnp.where(kval, kids, -1)                # [K]
        par_active = jnp.repeat(f_active, k8, axis=0)  # [K, C]
        sel, next_active = classify(ids, par_active)
        uni, uni_cnt, ovf_uni = append_union(uni, uni_cnt, ovf_uni, sel,
                                             ids)
        # compact next frontier (union of next_active over tiles)
        f_sel = jnp.any(next_active, axis=0)           # [K]
        idxs, cnt = su.compact_indices(f_sel, fcap)
        idxs_c = jnp.clip(idxs, 0, K - 1)
        frontier = jnp.where(idxs < K, ids[idxs_c], 0)
        f_active = next_active.T[idxs_c] & (idxs < K)[:, None]
        ovf_frontier = ovf_frontier | (cnt > fcap)
        f_max = jnp.maximum(f_max, cnt)
        return (frontier, jnp.minimum(cnt, fcap), f_active, uni, uni_cnt,
                ovf_uni, ovf_frontier, f_max)

    # round 0: root
    root_ids = jnp.concatenate([jnp.zeros(1, I32),
                                jnp.full(K - 1, -1, I32)])
    root_active = jnp.zeros((K, C), bool).at[0].set(True)
    sel0, next0 = classify(root_ids, root_active)
    uni, uni_cnt, ovf_uni = append_union(uni, uni_cnt, ovf_uni, sel0,
                                         root_ids)
    idxs, cnt0 = su.compact_indices(jnp.any(next0, axis=0), fcap)
    idxs_c = jnp.clip(idxs, 0, K - 1)
    frontier = jnp.where(idxs < K, root_ids[idxs_c], 0)
    f_active = next0.T[idxs_c] & (idxs < K)[:, None]
    f_cnt = jnp.minimum(cnt0, fcap)

    carry = (frontier, f_cnt, f_active, uni, uni_cnt, ovf_uni,
             ovf_uni & False, jnp.maximum(f_max + vary0, cnt0))
    carry = jax.lax.fori_loop(1, cfg.max_depth + 1, round_body, carry)
    (frontier, f_cnt, f_active, uni, uni_cnt, ovf_uni, ovf_frontier,
     f_max) = carry

    return _materialize(td, cfg, uni, uni_cnt, ovf_uni, ovf_frontier,
                        f_max, node_center, node_size, dtype)


def _materialize(td, cfg, uni, uni_cnt, ovf_uni, ovf_frontier, f_max,
                 node_center, node_size, dtype):
    """Union node list -> shared source arrays (m2p entries + p2p leaf
    expansion), with geometry for the two-term mask."""
    M = td.node_level.shape[0]
    n = td.pos.shape[0]
    ucap = uni.shape[0]
    uvalid = uni >= 0
    uids = jnp.where(uvalid, uni, 0)
    leaf = td.node_is_leaf[uids] & uvalid

    # parent boxes: parent slot precomputed at build time.
    parent = td.node_parent[uids]
    pc = node_center[parent]
    ps = node_size[parent]
    pd = td.node_delta[parent]
    # root's parent: itself with "always rejected" semantics -> size inf
    is_root = uids == 0
    ps = jnp.where(is_root, jnp.asarray(jnp.inf, dtype), ps)

    # ---- M2P part: node entries as-is ----
    m2p_rows = (~leaf) | (~uvalid)  # non-leaf entries are m2p-only
    # Leaves can be BOTH m2p (for far tiles) and p2p (for near tiles):
    # keep every node as an m2p row, and additionally expand leaves to
    # particles for p2p. The mask logic sorts out which applies per tile.
    sentinel = jnp.asarray(4.0, dtype) * td.box_size
    m_pos = jnp.where(uvalid[:, None], td.node_com[uids], sentinel)
    m_mass = jnp.where(uvalid, td.node_mass[uids], 0.0)
    m_idx = jnp.full(ucap, -1, I32)
    m_isp = jnp.zeros(ucap, bool)
    m_nc = jnp.where(uvalid[:, None], node_center[uids], sentinel)
    m_ns = jnp.where(uvalid, node_size[uids], 0.0)
    m_nd = jnp.where(uvalid, td.node_delta[uids], 0.0)

    # ---- P2P part: expand union leaves into particles ----
    pcap = cfg.p2p_src_cap
    lsel = leaf
    lb = jnp.where(lsel, td.node_begin[uids], 0)
    lc = jnp.where(lsel, td.node_end[uids] - td.node_begin[uids], 0)
    offs = jnp.cumsum(lc) - lc
    total_p = offs[-1] + lc[-1]
    ovf_p2p = total_p > pcap
    # particle k of the expansion belongs to union leaf row
    # row(k) = searchsorted(cumsum(lc), k+1)
    cum_lc = jnp.cumsum(lc)
    kq = jnp.arange(pcap, dtype=I32)
    row = su.searchsorted_1d(cum_lc, kq + 1)
    rvalid = kq < jnp.minimum(total_p, pcap)
    row_c = jnp.clip(row, 0, ucap - 1)
    pidx = jnp.where(rvalid, lb[row_c] + (kq - offs[row_c]), -1)
    pidx_c = jnp.clip(pidx, 0, n - 1)
    p_pos = jnp.where(rvalid[:, None], td.pos[pidx_c], sentinel)
    p_mass = jnp.where(rvalid, td.mass[pidx_c], 0.0)
    p_isp = rvalid
    # geometry: the particle's LEAF box (own) and the leaf's parent box
    p_nc = jnp.where(rvalid[:, None], m_nc[row_c], sentinel)
    p_ns = jnp.where(rvalid, m_ns[row_c], 0.0)
    p_nd = jnp.where(rvalid, m_nd[row_c], 0.0)
    p_pc = jnp.where(rvalid[:, None], pc[row_c], sentinel)
    p_ps = jnp.where(rvalid, ps[row_c], 0.0)
    p_pd = jnp.where(rvalid, pd[row_c], 0.0)

    pos = jnp.concatenate([m_pos, p_pos], axis=0)
    mass = jnp.concatenate([m_mass, p_mass], axis=0)
    idx = jnp.concatenate([m_idx, pidx], axis=0)
    isp = jnp.concatenate([m_isp, p_isp], axis=0)
    nbox_c = jnp.concatenate([m_nc, p_nc], axis=0)
    nbox_s = jnp.concatenate([m_ns, p_ns], axis=0)
    ndelta = jnp.concatenate([m_nd, p_nd], axis=0)
    pbox_c = jnp.concatenate([jnp.where(uvalid[:, None], pc, sentinel),
                              p_pc], axis=0)
    pbox_s = jnp.concatenate([jnp.where(uvalid, ps, 0.0), p_ps], axis=0)
    pdelta = jnp.concatenate([jnp.where(uvalid, pd, 0.0), p_pd], axis=0)

    return SharedSources(
        pos=pos.astype(dtype), mass=mass.astype(dtype), idx=idx,
        is_p2p=isp, nbox_c=nbox_c.astype(dtype),
        nbox_s=nbox_s.astype(dtype), ndelta=ndelta.astype(dtype),
        pbox_c=pbox_c.astype(dtype), pbox_s=pbox_s.astype(dtype),
        pdelta=pdelta.astype(dtype),
        count=uni_cnt + jnp.minimum(total_p, pcap),
        overflow=jnp.stack([ovf_frontier, ovf_uni, ovf_p2p]),
        maxima=jnp.stack([uni_cnt, uni_cnt + jnp.minimum(total_p, pcap),
                          f_max]))


def tile_masks(cfg: TreeConfig, src: SharedSources, theta, box_lo,
               box_hi):
    """Per-tile contribution masks [C, S] from the two-term hereditary
    MAC (dense elementwise; used by the XLA fallback and for the kernel's
    precomputed mask planes)."""
    dtype = src.pos.dtype
    theta_inv = 1.0 / jnp.asarray(theta, dtype)
    lo = box_lo[:, None, :]
    hi = box_hi[:, None, :]
    d2n = _box_dist2(lo, hi, src.nbox_c, src.nbox_s)
    d2p = _box_dist2(lo, hi, src.pbox_c, src.pbox_s)
    acc_n = _accept(cfg, theta_inv, d2n, src.nbox_s[None], src.ndelta[None])
    acc_p = _accept(cfg, theta_inv, d2p, src.pbox_s[None], src.pdelta[None])
    parent_open = ~acc_p
    m2p_mask = acc_n & parent_open & (~src.is_p2p)[None]
    p2p_mask = (~acc_n) & parent_open & src.is_p2p[None]
    return (m2p_mask | p2p_mask) & (src.mass > 0)[None]
"""Batched MAC-driven traversal: tree -> dense padded interaction lists.

This replaces the reference's recursive/branchy heart (per-critical-node DFS
with per-node MAC tests on CPU, per-thread stack traversal on GPU;
`tree.hpp` acc_pot_impl + `src/*.cu`, SURVEY.md C7/C13). TPUs cannot hide
traversal divergence behind stacks, so the walk is restructured
level-synchronously (SURVEY.md §4.5 note, Cornerstone/Bonsai lineage):

  * targets are the build's tile table: ncrit-wide Morton slices bounded
    by one tree cell (the TPU re-tuning of the reference's critical
    nodes), with static width and per-tile AABBs;
  * each tile carries a frontier of undecided nodes, expanded one tree
    level per round — every candidate child is MAC-tested against the
    tile's AABB in bulk;
  * MAC-accepted nodes append to the tile's M2P list, rejected leaves to
    its P2P list, rejected internal nodes to the next frontier;
  * all lists are dense padded [tiles x cap] arrays with counts and
    overflow flags (never silent truncation).

The group MAC uses the minimum distance from the tile's AABB to the node
COM, which is conservative for every particle in the tile (opens at least
as much as the reference's per-target criterion).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .build import TreeData
from .config import TreeConfig, MAC_BH, MAC_BH_GEOM

I32 = jnp.int32


class InteractionLists(NamedTuple):
    m2p_nodes: jnp.ndarray   # [C, m2p_cap] int32 node slots (-1 pad)
    m2p_count: jnp.ndarray   # [C]
    p2p_src: jnp.ndarray     # [C, p2p_src_cap] int32 particle slots (-1 pad)
    p2p_count: jnp.ndarray   # [C]
    overflow: jnp.ndarray    # [4] bool: (m2p, p2p_leaf, p2p_src, frontier)
                             # cap exceeded in this chunk (never silent)


def tile_aabbs(pos, n_tiles: int, tile: int):
    """AABB (lo, hi) of each tile of `tile` consecutive Morton-ordered
    particles. pos is padded to n_tiles*tile; padding rows must be +inf/-inf
    neutral — callers pass a mask."""
    ndim = pos.shape[-1]
    p = pos.reshape(n_tiles, tile, ndim)
    return jnp.min(p, axis=1), jnp.max(p, axis=1)


def _append(lst, cnt, mask, values, cap: int):
    """Append `values` where `mask` into per-row padded lists.

    lst [C, cap], cnt [C], mask/values [C, K]. Returns updated
    (lst, cnt, overflow_row [C])."""
    C = lst.shape[0]
    pos = cnt[:, None] + jnp.cumsum(mask.astype(I32), axis=1) - 1
    idx = jnp.where(mask & (pos < cap), pos, cap)
    rows = jnp.arange(C, dtype=I32)[:, None]
    lst = lst.at[rows, idx].set(values, mode="drop")
    new_cnt = cnt + jnp.sum(mask, axis=1, dtype=I32)
    return lst, jnp.minimum(new_cnt, cap), new_cnt > cap


def box_point_dist2(lo, hi, p):
    """Squared distance from AABB [lo, hi] to point p (0 if inside).
    lo/hi [C, 1, D] against p [C, K, D] -> [C, K]."""
    d = jnp.maximum(jnp.maximum(lo - p, p - hi), 0.0)
    return jnp.sum(d * d, axis=-1)


def build_interaction_lists(td: TreeData, cfg: TreeConfig, theta,
                            box_lo, box_hi) -> InteractionLists:
    """Traverse for one chunk of tiles. box_lo/box_hi: [C, D] tile AABBs.

    theta is a traced scalar (per-call, reference kwarg parity).
    Jittable; the round loop is unrolled (max_depth static)."""
    C = box_lo.shape[0]
    dtype = td.pos.dtype
    theta = jnp.asarray(theta, dtype)
    inv_theta = 1.0 / theta
    lo = box_lo[:, None, :]
    hi = box_hi[:, None, :]

    m2p = jnp.full((C, cfg.m2p_cap), -1, I32)
    m2p_cnt = jnp.zeros(C, I32)
    p2p_leaf = jnp.full((C, cfg.p2p_leaf_cap), -1, I32)
    p2p_leaf_cnt = jnp.zeros(C, I32)
    ovf_m2p = jnp.zeros(C, bool)
    ovf_leaf = jnp.zeros(C, bool)
    ovf_frontier = jnp.zeros(C, bool)

    # Round 0 processes the root itself (handles the root-is-leaf case);
    # round r >= 1 processes children at level r.
    frontier = jnp.zeros((C, 1), I32)          # root slot
    f_valid = jnp.ones((C, 1), bool)

    for r in range(cfg.max_depth + 1):
        if r == 0:
            cand = frontier
            cvalid = f_valid
        else:
            cb = td.node_child_begin[jnp.where(f_valid, frontier, 0)]
            cc = td.node_child_count[jnp.where(f_valid, frontier, 0)]
            k = 2 ** cfg.ndim
            cand = (cb[:, :, None] + jnp.arange(k, dtype=I32)).reshape(C, -1)
            cvalid = ((jnp.arange(k, dtype=I32) < cc[:, :, None])
                      & f_valid[:, :, None]).reshape(C, -1)

        cand_s = jnp.where(cvalid, cand, 0)
        com = td.node_com[cand_s]                       # [C, K, D]
        is_leaf = td.node_is_leaf[cand_s]
        mass = td.node_mass[cand_s]
        # Cell edge length at this level: box / 2^r (static per round).
        size = td.box_size * (0.5 ** r)

        d2 = box_point_dist2(lo, hi, com)               # [C, K]
        if cfg.mac == MAC_BH:
            # Open when size/d >= theta  <=>  accept when d > size/theta.
            thresh = size * inv_theta
            accept = d2 > thresh * thresh
        else:  # bh_geom: accept when d > size/theta + delta
            delta = td.node_delta[cand_s]
            thresh = size * inv_theta + delta
            accept = d2 > thresh * thresh

        accept = accept & cvalid & (mass > 0)
        reject = cvalid & ~accept
        to_p2p = reject & is_leaf
        to_next = reject & ~is_leaf

        m2p, m2p_cnt, ovf1 = _append(m2p, m2p_cnt, accept, cand, cfg.m2p_cap)
        p2p_leaf, p2p_leaf_cnt, ovf2 = _append(
            p2p_leaf, p2p_leaf_cnt, to_p2p, cand, cfg.p2p_leaf_cap)
        ovf_m2p = ovf_m2p | ovf1
        ovf_leaf = ovf_leaf | ovf2

        if r == cfg.max_depth:
            break
        # Compact the next frontier.
        fcap = min(cfg.frontier_cap, 2 ** (cfg.ndim * (r + 1)))
        pos = jnp.cumsum(to_next.astype(I32), axis=1) - 1
        idx = jnp.where(to_next & (pos < fcap), pos, fcap)
        rows = jnp.arange(C, dtype=I32)[:, None]
        frontier = jnp.full((C, fcap), 0, I32).at[rows, idx].set(
            cand, mode="drop")
        nf = jnp.sum(to_next, axis=1, dtype=I32)
        ovf_frontier = ovf_frontier | (nf > fcap)
        f_valid = jnp.arange(fcap, dtype=I32)[None, :] < jnp.minimum(nf, fcap)[:, None]

    # Expand P2P leaves into a compact per-tile source-particle index list.
    leaf_s = jnp.where(p2p_leaf >= 0, p2p_leaf, 0)
    lb = jnp.where(p2p_leaf >= 0, td.node_begin[leaf_s], 0)
    lc = jnp.where(p2p_leaf >= 0, td.node_end[leaf_s] - td.node_begin[leaf_s],
                   0)
    offs = jnp.cumsum(lc, axis=1) - lc                   # exclusive prefix
    total = offs[:, -1] + lc[:, -1]
    L = cfg.max_leaf_n
    ar = jnp.arange(L, dtype=I32)
    pos2 = offs[:, :, None] + ar                         # [C, P, L]
    val2 = ar < lc[:, :, None]
    vals = lb[:, :, None] + ar
    scap = cfg.p2p_src_cap
    idx2 = jnp.where(val2 & (pos2 < scap), pos2, scap).reshape(C, -1)
    rows = jnp.arange(C, dtype=I32)[:, None]
    p2p_src = jnp.full((C, scap), -1, I32).at[rows, idx2].set(
        vals.reshape(C, -1), mode="drop")
    ovf_src = total > scap

    return InteractionLists(
        m2p_nodes=m2p, m2p_count=m2p_cnt,
        p2p_src=p2p_src, p2p_count=jnp.minimum(total, scap),
        overflow=jnp.stack([jnp.any(ovf_m2p), jnp.any(ovf_leaf),
                            jnp.any(ovf_src), jnp.any(ovf_frontier)]))

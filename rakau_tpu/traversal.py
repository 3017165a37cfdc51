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
    maxima: jnp.ndarray      # [4] int32: max (m2p, p2p_src, frontier, p2p_leaf)
                             # counts in this chunk (for cap auto-tuning)


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
    # round r >= 1 MAC-tests the children (at level r) of the surviving
    # frontier. Rounds 1..max_depth run as ONE fori_loop body with a
    # uniform frontier width (compile time independent of depth; the
    # unrolled form emits several scatter lowerings per level and takes
    # minutes to compile on XLA:TPU).
    fcap = cfg.frontier_cap
    k = 2 ** cfg.ndim

    def classify(cand, cvalid, size, m2p, m2p_cnt, p2p_leaf, p2p_leaf_cnt,
                 ovf_m2p, ovf_leaf):
        cand_s = jnp.where(cvalid, cand, 0)
        com = td.node_com[cand_s]                       # [C, K, D]
        is_leaf = td.node_is_leaf[cand_s]
        mass = td.node_mass[cand_s]
        d2 = box_point_dist2(lo, hi, com)               # [C, K]
        if cfg.mac == MAC_BH:
            # Open when size/d >= theta  <=>  accept when d > size/theta.
            thresh = size * inv_theta
        else:  # bh_geom: accept when d > size/theta + delta
            thresh = size * inv_theta + td.node_delta[cand_s]
        accept = (d2 > thresh * thresh) & cvalid & (mass > 0)
        reject = cvalid & ~accept
        to_p2p = reject & is_leaf
        to_next = reject & ~is_leaf
        m2p, m2p_cnt, ovf1 = _append(m2p, m2p_cnt, accept, cand,
                                     cfg.m2p_cap)
        p2p_leaf, p2p_leaf_cnt, ovf2 = _append(
            p2p_leaf, p2p_leaf_cnt, to_p2p, cand, cfg.p2p_leaf_cap)
        return (to_next, m2p, m2p_cnt, p2p_leaf, p2p_leaf_cnt,
                ovf_m2p | ovf1, ovf_leaf | ovf2)

    # round 0: the root alone
    root = jnp.zeros((C, 1), I32)
    (to_next0, m2p, m2p_cnt, p2p_leaf, p2p_leaf_cnt, ovf_m2p,
     ovf_leaf) = classify(root, jnp.ones((C, 1), bool), td.box_size,
                          m2p, m2p_cnt, p2p_leaf, p2p_leaf_cnt,
                          ovf_m2p, ovf_leaf)
    # Derive zero-inits from a (possibly shard_map-varying) input so the
    # fori_loop carry types match under shard_map's varying-axes tracking.
    vary0 = (box_lo[:, 0] * 0).astype(I32)              # [C] zeros
    frontier = jnp.zeros((C, fcap), I32) + vary0[:, None]
    ovf_frontier = ovf_frontier | (vary0 > 0)
    nf = jnp.sum(to_next0, axis=1, dtype=I32)           # 0 or 1

    def round_body(r, carry):
        (frontier, nf, m2p, m2p_cnt, p2p_leaf, p2p_leaf_cnt,
         ovf_m2p, ovf_leaf, ovf_frontier, nf_max) = carry
        f_valid = jnp.arange(fcap, dtype=I32)[None, :] < nf[:, None]
        fr = jnp.where(f_valid, frontier, 0)
        cb = td.node_child_begin[fr]
        cc = td.node_child_count[fr]
        cand = (cb[:, :, None] + jnp.arange(k, dtype=I32)).reshape(C, -1)
        cvalid = ((jnp.arange(k, dtype=I32) < cc[:, :, None])
                  & f_valid[:, :, None]).reshape(C, -1)
        size = td.box_size * jnp.exp2(-r.astype(dtype))
        (to_next, m2p, m2p_cnt, p2p_leaf, p2p_leaf_cnt, ovf_m2p,
         ovf_leaf) = classify(cand, cvalid, size, m2p, m2p_cnt, p2p_leaf,
                              p2p_leaf_cnt, ovf_m2p, ovf_leaf)
        # Compact the next frontier.
        pos = jnp.cumsum(to_next.astype(I32), axis=1) - 1
        idx = jnp.where(to_next & (pos < fcap), pos, fcap)
        rows = jnp.arange(C, dtype=I32)[:, None]
        frontier = jnp.zeros((C, fcap), I32).at[rows, idx].set(
            cand, mode="drop")
        nf_new = jnp.sum(to_next, axis=1, dtype=I32)
        # The final round's frontier must be empty (max-depth nodes are
        # always leaves), so unflushed frontier entries can't be lost.
        ovf_frontier = ovf_frontier | (nf_new > fcap)
        nf_max = jnp.maximum(nf_max, jnp.max(nf_new))
        return (frontier, jnp.minimum(nf_new, fcap), m2p, m2p_cnt,
                p2p_leaf, p2p_leaf_cnt, ovf_m2p, ovf_leaf, ovf_frontier,
                nf_max)

    carry = (frontier, nf, m2p, m2p_cnt, p2p_leaf, p2p_leaf_cnt,
             ovf_m2p, ovf_leaf, ovf_frontier, jnp.max(nf))
    carry = jax.lax.fori_loop(1, cfg.max_depth + 1, round_body, carry)
    (frontier, nf, m2p, m2p_cnt, p2p_leaf, p2p_leaf_cnt,
     ovf_m2p, ovf_leaf, ovf_frontier, nf_max) = carry

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
                            jnp.any(ovf_src), jnp.any(ovf_frontier)]),
        maxima=jnp.stack([jnp.max(m2p_cnt), jnp.max(total), nf_max,
                          jnp.max(p2p_leaf_cnt)]))

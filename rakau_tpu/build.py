"""Vectorized, level-synchronous tree construction.

The reference builds its node list with recursive TBB tasks over the sorted
Morton codes (`tree.hpp` build internals, SURVEY.md C3/C4): each node stores a
particle range, children info, COM + total mass, and splits until
`max_leaf_n`. TPU-native restructuring (SURVEY.md §8 M2, Cornerstone lineage
[P: 2307.06345]): one pass per level over the sorted code array —

  * segment heads found by comparing adjacent code prefixes,
  * per-node reductions (count, mass, COM, bh_geom delta, optional
    quadrupole) via `segment_sum` scatters into a flat static-capacity node
    array,
  * "alive" particles (those inside nodes that still split) carried to the
    next level,

producing a flat, level-major node array in which each node's children are
contiguous (nodes are created in sorted-key order). All shapes static; the
level loop is unrolled at trace time (max_depth iterations). Capacity
overflow is detected and reported, never silently truncated.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import morton, particles
from .config import TreeConfig, MAC_BH_GEOM

I32 = jnp.int32


class TreeData(NamedTuple):
    """Flat tree + Morton-ordered particle store (a pytree of arrays).

    Particle arrays are in internal Morton order ("unordered"/`_u` view of
    the reference, SURVEY.md C9); `perm[i]` is the original index of Morton
    slot i, `inv_perm` its inverse.
    """
    # particles (Morton order)
    pos: jnp.ndarray          # [N, D]
    mass: jnp.ndarray         # [N]
    code_hi: jnp.ndarray      # [N] uint32
    code_lo: jnp.ndarray      # [N] uint32
    perm: jnp.ndarray         # [N] int32
    inv_perm: jnp.ndarray     # [N] int32
    # flat nodes (level-major; slot 0 = root)
    node_com: jnp.ndarray     # [M, D]
    node_mass: jnp.ndarray    # [M]
    node_begin: jnp.ndarray   # [M] int32 particle range start
    node_end: jnp.ndarray     # [M] int32 particle range end (exclusive)
    node_child_begin: jnp.ndarray  # [M] int32 (first child slot)
    node_child_count: jnp.ndarray  # [M] int32
    node_is_leaf: jnp.ndarray      # [M] bool
    node_level: jnp.ndarray        # [M] int32
    node_delta: jnp.ndarray        # [M] dist(COM, cell geometric center)
    node_quad: jnp.ndarray         # [M, Q] quadrupole moments (Q=6 for 3D, 3 for 2D; zeros if order<2)
    n_nodes: jnp.ndarray           # [] int32 total nodes used
    overflow: jnp.ndarray          # [] bool node or tile capacity exceeded
    box_size: jnp.ndarray          # [] dtype
    # target tiles (critical nodes, sub-tiled to <= ncrit particles each;
    # the reference's traversal work units, SURVEY.md C4 "critical nodes")
    tile_begin: jnp.ndarray        # [TC] int32 first particle (Morton order)
    tile_cnt: jnp.ndarray          # [TC] int32 particle count (0 = padding)
    tile_lo: jnp.ndarray           # [TC, D] AABB of the tile's particles
    tile_hi: jnp.ndarray           # [TC, D]
    n_tiles: jnp.ndarray           # [] int32


def _quad_dim(ndim: int) -> int:
    return ndim * (ndim + 1) // 2


def _quad_products(dx):
    """Upper-triangular outer products of dx [..., D] -> [..., Q]."""
    ndim = dx.shape[-1]
    comps = []
    for a in range(ndim):
        for b in range(a, ndim):
            comps.append(dx[..., a] * dx[..., b])
    return jnp.stack(comps, axis=-1)


def sort_by_code(code_hi, code_lo, *arrays):
    """Lexicographic sort by (hi, lo); returns sorted codes, perm, arrays."""
    n = code_hi.shape[0]
    iota = jnp.arange(n, dtype=I32)
    out = jax.lax.sort((code_hi, code_lo, iota), num_keys=2)
    hi_s, lo_s, perm = out
    sorted_arrays = tuple(a[perm] for a in arrays)
    return hi_s, lo_s, perm, sorted_arrays


def build_tree(pos, mass, cfg: TreeConfig, box_size=None) -> TreeData:
    """Construct the tree (jittable; cfg static)."""
    if box_size is None:
        box_size = particles.auto_box_size(pos)
    box_size = jnp.asarray(box_size, pos.dtype)
    n, ndim = pos.shape
    depth = cfg.max_depth
    B = cfg.code_bits
    qdim = _quad_dim(ndim)

    cells = particles.discretize(pos, box_size, depth)
    chi, clo = morton.encode(cells, ndim, depth)
    hi_s, lo_s, perm, (pos_s, mass_s, cells_s) = sort_by_code(
        chi, clo, pos, mass, cells)
    inv_perm = jnp.zeros(n, I32).at[perm].set(jnp.arange(n, dtype=I32))

    M = cfg.node_capacity(n)
    dtype = pos.dtype
    node_com = jnp.zeros((M, ndim), dtype)
    node_mass = jnp.zeros(M, dtype)
    node_begin = jnp.zeros(M, I32)
    node_end = jnp.zeros(M, I32)
    node_child_begin = jnp.zeros(M, I32)
    node_child_count = jnp.zeros(M, I32)
    node_is_leaf = jnp.ones(M, bool)
    node_level = jnp.zeros(M, I32)
    node_delta = jnp.zeros(M, dtype)
    node_quad = jnp.zeros((M, qdim), dtype)

    pidx = jnp.arange(n, dtype=I32)
    mpos = mass_s[:, None] * pos_s

    # --- root (slot 0) ---
    total_m = jnp.sum(mass_s)
    safe_m = jnp.where(total_m > 0, total_m, jnp.ones_like(total_m))
    root_com = jnp.sum(mpos, axis=0) / safe_m
    node_com = node_com.at[0].set(root_com)
    node_mass = node_mass.at[0].set(total_m)
    node_begin = node_begin.at[0].set(0)
    node_end = node_end.at[0].set(n)
    root_leaf = n <= cfg.max_leaf_n
    node_is_leaf = node_is_leaf.at[0].set(root_leaf)
    node_delta = node_delta.at[0].set(
        jnp.sqrt(jnp.sum(root_com * root_com)))  # root cell center = origin
    if cfg.multipole_order >= 2:
        node_quad = node_quad.at[0].set(
            jnp.sum(mass_s[:, None] * _quad_products(pos_s - root_com),
                    axis=0))

    # per-particle state
    alive = jnp.full(n, n > cfg.max_leaf_n)          # inside a splitting node
    parent_slot = jnp.zeros(n, I32)                  # current node per particle
    offset = jnp.asarray(1, I32)                     # next free node slot
    overflow = jnp.asarray(False)

    # Target-tile grouping: group(i) = deepest node on particle i's path
    # with count > ncrit. Tiles are ncrit-particle Morton slices *within*
    # one group, so a tile's AABB is bounded by one tree cell — this is the
    # TPU re-tuning of rakau's critical nodes (fixed-width work units with
    # cell-bounded extent instead of ragged <=ncrit cells; SURVEY.md §8
    # "ncrit retuning").
    group_slot = jnp.zeros(n, I32)               # root is everyone's default

    # One level per fori_loop iteration (identical shapes each level; the
    # per-level code-prefix shift is a traced loop variable). Unrolling
    # instead would emit ~10 scatter lowerings per level and makes the
    # XLA:TPU compile time scale with max_depth.
    def level_body(lvl, carry):
        (alive, parent_slot, group_slot, offset, overflow,
         node_com, node_mass, node_begin, node_end, node_child_begin,
         node_child_count, node_is_leaf, node_level, node_delta,
         node_quad) = carry
        shift = B - lvl * ndim
        khi, klo = morton.pair_shr_dyn(hi_s, lo_s, shift)
        prev_same = jnp.concatenate([
            jnp.asarray([False]),
            (khi[1:] == khi[:-1]) & (klo[1:] == klo[:-1])])
        prev_alive = jnp.concatenate([jnp.asarray([False]), alive[:-1]])
        head = alive & (~prev_same | ~prev_alive)
        seg = jnp.cumsum(head.astype(I32)) - 1       # segment id among alive
        n_new = jnp.sum(head, dtype=I32)
        slot = offset + seg
        slot_c = jnp.where(alive & (slot < M), slot, M)   # drop padding/ovf

        cnt = jax.ops.segment_sum(jnp.ones(n, I32), slot_c,
                                  num_segments=M + 1)[:M]
        msum = jax.ops.segment_sum(jnp.where(alive, mass_s, 0), slot_c,
                                   num_segments=M + 1)[:M]
        mpsum = jax.ops.segment_sum(jnp.where(alive[:, None], mpos, 0),
                                    slot_c, num_segments=M + 1)[:M]
        bmin = jax.ops.segment_min(jnp.where(alive, pidx, n), slot_c,
                                   num_segments=M + 1)[:M]
        bmax = jax.ops.segment_max(jnp.where(alive, pidx, -1), slot_c,
                                   num_segments=M + 1)[:M]

        made = cnt > 0  # slots actually written this level
        safe = jnp.where(msum > 0, msum, 1).astype(dtype)
        com_lvl = mpsum / safe[:, None]
        node_com = jnp.where(made[:, None], com_lvl, node_com)
        node_mass = jnp.where(made, msum.astype(dtype), node_mass)
        node_begin = jnp.where(made, bmin, node_begin)
        node_end = jnp.where(made, bmax + 1, node_end)
        leaf_lvl = (cnt <= cfg.max_leaf_n) | (lvl == depth)
        node_is_leaf = jnp.where(made, leaf_lvl, node_is_leaf)
        node_level = jnp.where(made, lvl, node_level)

        # bh_geom delta: |COM - geometric cell center| (SURVEY.md C6).
        centers = particles.cell_center(cells_s, box_size, depth, lvl)
        cmin = jax.ops.segment_min(
            jnp.where(alive[:, None], centers, jnp.inf), slot_c,
            num_segments=M + 1)[:M]
        dvec = com_lvl - cmin
        delta_lvl = jnp.sqrt(jnp.sum(dvec * dvec, axis=-1))
        node_delta = jnp.where(made, delta_lvl.astype(dtype), node_delta)

        if cfg.multipole_order >= 2:
            com_p = com_lvl[jnp.clip(slot, 0, M - 1)]
            qp = _quad_products(pos_s - com_p) * mass_s[:, None]
            qsum = jax.ops.segment_sum(
                jnp.where(alive[:, None], qp, 0), slot_c,
                num_segments=M + 1)[:M]
            node_quad = jnp.where(made[:, None], qsum.astype(dtype),
                                  node_quad)

        # children bookkeeping on the parents
        pslot_c = jnp.where(head, parent_slot, M)
        cb = jax.ops.segment_min(jnp.where(head, slot, M), pslot_c,
                                 num_segments=M + 1)[:M]
        cc = jax.ops.segment_sum(head.astype(I32), pslot_c,
                                 num_segments=M + 1)[:M]
        has_kids = cc > 0
        node_child_begin = jnp.where(has_kids, cb, node_child_begin)
        node_child_count = jnp.where(has_kids, cc, node_child_count)

        # next level (parent_slot must update from the *current* alive set
        # before alive shrinks: a head at the next level is alive now)
        overflow = overflow | (offset + n_new > M)
        parent_slot = jnp.where(alive & (slot < M), slot, parent_slot)
        cnt_p = cnt[jnp.clip(slot, 0, M - 1)]
        group_slot = jnp.where(alive & (slot < M) & (cnt_p > cfg.ncrit),
                               slot, group_slot)
        alive = alive & (cnt_p > cfg.max_leaf_n) & (lvl < depth) & (slot < M)
        offset = jnp.minimum(offset + n_new, M)
        return (alive, parent_slot, group_slot, offset, overflow,
                node_com, node_mass, node_begin, node_end, node_child_begin,
                node_child_count, node_is_leaf, node_level, node_delta,
                node_quad)

    carry = (alive, parent_slot, group_slot, jnp.asarray(1, I32),
             jnp.asarray(False), node_com, node_mass, node_begin, node_end,
             node_child_begin, node_child_count, node_is_leaf, node_level,
             node_delta, node_quad)
    carry = jax.lax.fori_loop(1, depth + 1, level_body, carry)
    (alive, parent_slot, group_slot, offset, overflow,
     node_com, node_mass, node_begin, node_end, node_child_begin,
     node_child_count, node_is_leaf, node_level, node_delta,
     node_quad) = carry

    # ---- target tiles: ncrit-wide Morton slices within each group ----
    # group_slot is piecewise constant over (possibly repeated) contiguous
    # segments; a tile starts at each segment head and every ncrit
    # particles after it.
    head_g = jnp.concatenate(
        [jnp.asarray([True]), group_slot[1:] != group_slot[:-1]])
    seg_begin = jax.lax.cummax(jnp.where(head_g, pidx, 0))
    pos_in = pidx - seg_begin
    head_t = head_g | (pos_in % cfg.ncrit == 0)
    tile_id = jnp.cumsum(head_t.astype(I32)) - 1
    TC = cfg.tile_capacity(n)
    n_tiles = jnp.sum(head_t, dtype=I32)
    overflow = overflow | (n_tiles > TC)
    tid_c = jnp.where(tile_id < TC, tile_id, TC)
    tile_begin = jax.ops.segment_min(pidx, tid_c, num_segments=TC + 1)[:TC]
    tile_cnt = jax.ops.segment_sum(jnp.ones(n, I32), tid_c,
                                   num_segments=TC + 1)[:TC]
    tile_begin = jnp.where(tile_cnt > 0, tile_begin, 0)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    tile_lo = jax.ops.segment_min(pos_s, tid_c, num_segments=TC + 1)[:TC]
    tile_hi = jax.ops.segment_max(pos_s, tid_c, num_segments=TC + 1)[:TC]
    tile_lo = jnp.where((tile_cnt > 0)[:, None], tile_lo, big)
    tile_hi = jnp.where((tile_cnt > 0)[:, None], tile_hi, -big)

    return TreeData(
        pos=pos_s, mass=mass_s, code_hi=hi_s, code_lo=lo_s,
        perm=perm, inv_perm=inv_perm,
        node_com=node_com, node_mass=node_mass,
        node_begin=node_begin, node_end=node_end,
        node_child_begin=node_child_begin, node_child_count=node_child_count,
        node_is_leaf=node_is_leaf, node_level=node_level,
        node_delta=node_delta, node_quad=node_quad,
        n_nodes=offset, overflow=overflow, box_size=box_size,
        tile_begin=tile_begin, tile_cnt=tile_cnt,
        tile_lo=tile_lo, tile_hi=tile_hi, n_tiles=n_tiles)

"""Locally-essential-tree (LET) execution: Morton-range domain
decomposition with coarsened halo exchange over ICI.

This is the memory-scaling multi-chip path (BASELINE config #4; SURVEY.md
§6 "long-context analog"): unlike parallel/sharded.py (which replicates
the tree and shards only compute), every chip holds ONLY its contiguous
Morton range of particles plus a conservative coarsened view of remote
matter:

  1. One global Morton sort assigns equal contiguous ranges per chip
     (phase 0; the sort itself is a single XLA sort — a distributed
     radix sort is a later optimization).
  2. Each chip builds a LOCAL tree over its range against the GLOBAL box
     (cells align across chips).
  3. Export sets: each chip walks its local tree against every remote
     domain's AABB using the SAME per-call theta MAC — the walk is
     literally traversal2.build_shared_sources with domain AABBs as
     "tiles". MAC-accepted nodes export as macro-particles (COM, mass);
     opened leaves export their raw particles (this is what makes
     near-boundary P2P exact). Conservative: dist(domain AABB, COM) <=
     dist(any tile in the domain, COM), so every export would also have
     been accepted by the destination's own per-tile MAC.
  4. Exchange via jax.lax.all_to_all (compiled to ICI collectives).
  5. Each chip queries its local tree with the imports appended as extra
     sources per tile chunk: far imports collapse into the tile local
     expansions, near imports ride the P2P kernel path (engine._eval_chunk
     `extra`).

Accuracy therefore stays inside the single-chip MAC envelope (tested on
the CPU 8-device mesh in tests/test_let.py).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import build as _build
from .. import engine as _engine
from .. import morton, particles as _particles, traversal2
from .. import scan_utils as su
from ..config import TreeConfig

I32 = jnp.int32


def _export_cfg(cfg: TreeConfig, node_cap: int, part_cap: int,
                leaf_cap: int, frontier_cap: int) -> TreeConfig:
    # farfield="local" so no grid-coverage drops apply to the domain walk
    # (the dense stencil grids are per-chip and never span shards).
    return cfg.with_(farfield="local", m2p_cap=node_cap,
                     p2p_src_cap=part_cap, p2p_leaf_cap=leaf_cap,
                     frontier_cap=frontier_cap)


def acc_pot_let(pos, mass, cfg: TreeConfig, theta, eps, G, mesh: Mesh,
                axis: str = "shards", box_size=None,
                export_cap: int = 16384, export_node_cap: int = 8192,
                export_part_cap: int = 32768, export_leaf_cap: int = 4096,
                export_frontier_cap: int = 1024):
    """Full LET pipeline; returns (acc, pot, ovf[4], export_ovf) with
    acc/pot in the INPUT order. Jittable (cfg/mesh static)."""
    ndev = mesh.shape[axis]
    n, ndim = pos.shape
    dtype = pos.dtype
    if box_size is None:
        box_size = _particles.auto_box_size(pos)
    box_size = jnp.asarray(box_size, dtype)
    depth = cfg.max_depth

    # ---- phase 0: global Morton order + equal contiguous ranges -------
    cells = _particles.discretize(pos, box_size, depth)
    chi, clo = morton.encode(cells, ndim, depth)
    _, _, perm, (pos_s, mass_s) = _build.sort_by_code(chi, clo, pos, mass)
    n_pad = -(-n // ndev) * ndev
    pad = n_pad - n
    if pad:
        # zero-mass sentinels just inside the upper box corner: they sort
        # to the end (last shard), source nothing, and their results are
        # dropped on the unpad below.
        corner = jnp.full((pad, ndim),
                          jnp.asarray(box_size, dtype) * 0.4999, dtype)
        pos_s = jnp.concatenate([pos_s, corner], axis=0)
        mass_s = jnp.concatenate([mass_s, jnp.zeros(pad, dtype)], axis=0)

    cfg_q = cfg.with_(farfield="local") if cfg.farfield == "grid" else cfg
    cfg_e = _export_cfg(cfg, export_node_cap, export_part_cap,
                        export_leaf_cap, export_frontier_cap)

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
             out_specs=(P(axis), P(axis), P(), P()))
    def run(pos_l, mass_l):
        td = _build.build_tree(pos_l, mass_l, cfg_q, box_size=box_size)
        me = jax.lax.axis_index(axis)

        # domain AABBs (zero-mass sentinels included: conservative)
        dlo = jax.lax.all_gather(jnp.min(pos_l, axis=0), axis)  # [ndev, D]
        dhi = jax.lax.all_gather(jnp.max(pos_l, axis=0), axis)
        not_me = jnp.arange(ndev, dtype=I32) != me

        # ---- export walk: domains as tiles ---------------------------
        src = traversal2.build_shared_sources(
            td, cfg_e, theta, dlo, dhi, tile_valid=not_me)
        S = src.pos.shape[0]
        idxs, cnt = su.compact_indices(src.mask, export_cap)  # [ndev, cap]
        safe = jnp.clip(idxs, 0, S - 1)
        valid = idxs < S
        sentinel = jnp.asarray(4.0, dtype) * box_size
        e_pos = jnp.where(valid[..., None], src.pos[safe], sentinel)
        e_mass = jnp.where(valid, src.mass[safe], 0.0)
        exp_ovf = jnp.any(cnt > export_cap) | jnp.any(src.overflow)

        # ---- halo exchange over ICI ----------------------------------
        imp_pos = jax.lax.all_to_all(e_pos, axis, split_axis=0,
                                     concat_axis=0, tiled=False)
        imp_mass = jax.lax.all_to_all(e_mass, axis, split_axis=0,
                                      concat_axis=0, tiled=False)
        imp_pos = imp_pos.reshape(ndev * export_cap, ndim)
        imp_mass = imp_mass.reshape(ndev * export_cap)

        # ---- local query with imports --------------------------------
        acc_u, pot_u, ovf = _engine.acc_pot_u(
            td, cfg_q, theta, eps, G, extra=(imp_pos, imp_mass))
        # back to this shard's pre-build (global-Morton) order
        inv_l = td.inv_perm
        acc_m = acc_u[inv_l]
        pot_m = pot_u[inv_l]
        ovf = jax.lax.pmax(ovf.astype(I32), axis).astype(bool)
        exp_ovf = jax.lax.pmax(exp_ovf.astype(I32), axis).astype(bool)
        return acc_m, pot_m, ovf, exp_ovf

    acc_m, pot_m, ovf, exp_ovf = run(pos_s, mass_s)
    # unpad + global Morton -> input order
    inv = _build._inv_permutation(perm)
    return acc_m[:n][inv], pot_m[:n][inv], ovf, exp_ovf

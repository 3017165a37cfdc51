"""Locally-essential-tree (LET) execution: Morton-range domain
decomposition with coarsened halo exchange over ICI.

This is the memory-scaling multi-chip path (BASELINE config #4; SURVEY.md
§6 "long-context analog"): unlike parallel/sharded.py (which replicates
the tree and shards only compute), every chip holds ONLY its contiguous
Morton range of particles plus a conservative coarsened view of remote
matter:

  1. Phase 0 assigns contiguous Morton ranges per chip. The default
     ("distributed") never materializes a global array: each chip sorts
     its own shard, all shards agree on range splitters from a gathered
     regular sample of the sorted codes (sample-sort), and rows move to
     their owner chip with ONE fixed-capacity `all_to_all` — per-chip
     memory stays O(N/ndev) end-to-end. A capacity overflow (extreme
     imbalance vs `exchange_slack`) is reported, never truncated.
     phase0="global" keeps the round-1 replicated-sort path (useful as
     a reference; O(N) per chip).
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
    # (the dense stencil grids are per-chip and never span shards), and
    # multipole_order=0 because the export walk ships MONOPOLE
    # macro-particles only (COM, mass) — quadrupole moments never ride
    # the exchange. This also keeps the config inside the product-mode
    # matrix (config.py rejects quad with farfield='local'; the r4
    # MULTICHIP regression was exactly this collision, VERDICT r4 #1).
    # local_order > 3 is a grid2-only knob — clamp it when leaving grid2
    # (caught by tests/test_product_modes.py: the accuracy-ladder config
    # carries local_order=6).
    return cfg.with_(farfield="local", multipole_order=0,
                     local_order=min(cfg.local_order, 3),
                     m2p_cap=node_cap,
                     p2p_src_cap=part_cap, p2p_leaf_cap=leaf_cap,
                     frontier_cap=frontier_cap)


def _query_cfg(cfg: TreeConfig) -> TreeConfig:
    """Local-query config for the LET path: the dense stencil far fields
    (grid/grid2) are per-chip pyramids that cannot span shards, so they
    are mapped to a shard-safe far field. Monopole maps to 'local'
    (tile-local Taylor expansions); quadrupole maps to 'm2p' (the only
    walk-local far field the quad kernel path supports, config.py
    product matrix)."""
    if cfg.farfield in ("grid", "grid2"):
        ff = "m2p" if cfg.multipole_order >= 2 else "local"
        return cfg.with_(farfield=ff,
                         local_order=min(cfg.local_order, 3))
    return cfg


def _export_query(td, cfg_q, cfg_e, theta, eps, G, box_size, ndev: int,
                  axis: str, export_cap: int, dlo, dhi, tile_valid):
    """Shared LET back half: export walk (domains as tiles), halo
    exchange over ICI, local query with imports. Returns results in the
    local pre-build order plus (ovf[4], export_ovf) pmax-reduced and
    the per-destination export counts [ndev] (this shard's halo volume
    — the docs/multislice.md traffic-budget observable)."""
    dtype = td.pos.dtype
    ndim = td.pos.shape[1]

    # ---- export walk: domains as tiles -------------------------------
    src = traversal2.build_shared_sources(
        td, cfg_e, theta, dlo, dhi, tile_valid=tile_valid)
    S = src.pos.shape[0]
    idxs, cnt = su.compact_indices(src.mask, export_cap)  # [ndev, cap]
    safe = jnp.clip(idxs, 0, S - 1)
    valid = idxs < S
    sentinel = jnp.asarray(4.0, dtype) * box_size
    e_pos = jnp.where(valid[..., None], src.pos[safe], sentinel)
    e_mass = jnp.where(valid, src.mass[safe], 0.0)
    exp_ovf = jnp.any(cnt > export_cap) | jnp.any(src.overflow)

    # ---- halo exchange over ICI ---------------------------------------
    imp_pos = jax.lax.all_to_all(e_pos, axis, split_axis=0,
                                 concat_axis=0, tiled=False)
    imp_mass = jax.lax.all_to_all(e_mass, axis, split_axis=0,
                                  concat_axis=0, tiled=False)
    imp_pos = imp_pos.reshape(ndev * export_cap, ndim)
    imp_mass = imp_mass.reshape(ndev * export_cap)

    # ---- local query with imports --------------------------------------
    acc_u, pot_u, ovf = _engine.acc_pot_u(
        td, cfg_q, theta, eps, G, extra=(imp_pos, imp_mass))
    inv_l = td.inv_perm
    acc_m = acc_u[inv_l]
    pot_m = pot_u[inv_l]
    ovf = jax.lax.pmax(ovf.astype(I32), axis).astype(bool)
    exp_ovf = jax.lax.pmax(exp_ovf.astype(I32), axis).astype(bool)
    return acc_m, pot_m, ovf, exp_ovf, cnt


def acc_pot_let(pos, mass, cfg: TreeConfig, theta, eps, G, mesh: Mesh,
                axis: str = "shards", box_size=None,
                export_cap: int = 16384, export_node_cap: int = 8192,
                export_part_cap: int = 32768, export_leaf_cap: int = 4096,
                export_frontier_cap: int = 1024,
                phase0: str = "distributed", exchange_slack: float = 2.0,
                splitter_samples: int = 128, with_stats: bool = False):
    """Full LET pipeline; returns (acc, pot, ovf[4], export_ovf) with
    acc/pot in the INPUT order (+ the [ndev, ndev] export-count matrix
    exports[src, dst] when with_stats — the measured halo volume vs the
    docs/multislice.md traffic budget). Jittable (cfg/mesh static).

    phase0="distributed" (default) runs the sample-sort domain
    assignment: per-shard local sort, splitters from a gathered regular
    sample, one fixed-capacity all_to_all redistribution (capacity
    `exchange_slack` x the balanced share), so no device ever holds a
    global array. Exchange-capacity overflow is reported through the
    export_ovf flag (retry with a larger exchange_slack), never
    truncated. phase0="global" is the replicated-global-sort reference
    path."""
    ndev = mesh.shape[axis]
    n, ndim = pos.shape
    dtype = pos.dtype
    if box_size is None:
        box_size = _particles.auto_box_size(pos)
    box_size = jnp.asarray(box_size, dtype)
    depth = cfg.max_depth

    cfg_q = _query_cfg(cfg)
    cfg_e = _export_cfg(cfg, export_node_cap, export_part_cap,
                        export_leaf_cap, export_frontier_cap)

    n_pad = -(-n // ndev) * ndev
    pad = n_pad - n
    if phase0 == "global":
        return _acc_pot_let_global(pos, mass, cfg_q, cfg_e, theta, eps, G,
                                   mesh, axis, box_size, export_cap,
                                   n, n_pad, depth)

    # ================= distributed phase 0 (sample-sort) ================
    nl = n_pad // ndev
    cap = max(1, -(-int(nl * exchange_slack) // ndev))
    nl2 = nl + ndev * cap
    s_smp = min(splitter_samples, nl)
    if pad:
        # zero-mass sentinels inside the upper box corner (results
        # dropped on the unpad below; they source nothing)
        corner = jnp.full((pad, ndim), box_size * 0.4999, dtype)
        pos = jnp.concatenate([pos, corner], axis=0)
        mass = jnp.concatenate([mass, jnp.zeros(pad, dtype)], axis=0)

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(axis), P(axis)),
             out_specs=(P(axis), P(axis), P(), P(), P(axis)))
    def run(pos_l, mass_l):
        me = jax.lax.axis_index(axis)
        # ---- local Morton sort ----------------------------------------
        cells = _particles.discretize(pos_l, box_size, depth)
        chi, clo = morton.encode(cells, ndim, depth)
        hi_s, lo_s, perm_l, (pos_ls, mass_ls) = _build.sort_by_code(
            chi, clo, pos_l, mass_l)

        # ---- splitters: gathered regular sample of sorted codes -------
        sidx = (jnp.arange(s_smp, dtype=I32) * nl) // s_smp + nl // (
            2 * s_smp)
        smp_hi = jax.lax.all_gather(hi_s[sidx], axis).reshape(-1)
        smp_lo = jax.lax.all_gather(lo_s[sidx], axis).reshape(-1)
        sh, sl = jax.lax.sort((smp_hi, smp_lo), num_keys=2)
        ranks = jnp.arange(1, ndev, dtype=I32) * s_smp
        sp_hi, sp_lo = sh[ranks], sl[ranks]              # [ndev-1]

        # ---- owner of each local row (nondecreasing along the sort) ---
        ge = (hi_s[:, None] > sp_hi[None, :]) | (
            (hi_s[:, None] == sp_hi[None, :])
            & (lo_s[:, None] >= sp_lo[None, :]))
        dest = jnp.sum(ge.astype(I32), axis=1)           # [nl]
        start = su.searchsorted_1d(dest, jnp.arange(ndev, dtype=I32))
        cnt = jnp.concatenate(
            [start[1:], jnp.full((1,), nl, I32)]) - start
        dev_ids = jnp.arange(ndev, dtype=I32)
        # self-destined rows never ride the exchange (the near-sorted
        # leapfrog steady state routes ~ALL rows to self; sizing the
        # all_to_all for that would be O(N) per chip) — only foreign
        # rows are capacity-bound
        x_ovf = jnp.any((cnt > cap) & (dev_ids != me))

        # ---- self rows: fixed [nl] buffer, validity-masked -------------
        kk_n = jnp.arange(nl, dtype=I32)
        self_rows = jnp.clip(start[me] + kk_n, 0, nl - 1)
        self_val = kk_n < cnt[me]
        corner_p = jnp.full((ndim,), box_size * 0.4999, dtype)
        sl_pos = jnp.where(self_val[:, None], pos_ls[self_rows], corner_p)
        sl_mass = jnp.where(self_val, mass_ls[self_rows], 0.0)

        # ---- foreign rows: fixed-capacity send buffers [ndev, cap] ----
        kk = jnp.arange(cap, dtype=I32)
        rows = jnp.clip(start[:, None] + kk[None, :], 0, nl - 1)
        s_val = (kk[None, :] < cnt[:, None]) & (dev_ids != me)[:, None]
        e_pos = jnp.where(s_val[..., None], pos_ls[rows], corner_p)
        e_mass = jnp.where(s_val, mass_ls[rows], 0.0)

        # ---- the ONE data redistribution ------------------------------
        f_pos = jax.lax.all_to_all(e_pos, axis, split_axis=0,
                                   concat_axis=0).reshape(-1, ndim)
        f_mass = jax.lax.all_to_all(e_mass, axis, split_axis=0,
                                    concat_axis=0).reshape(-1)
        f_val = jax.lax.all_to_all(s_val.astype(dtype), axis,
                                   split_axis=0,
                                   concat_axis=0).reshape(-1)
        r_pos = jnp.concatenate([sl_pos, f_pos], axis=0)
        r_mass = jnp.concatenate([sl_mass, f_mass], axis=0)
        r_val = jnp.concatenate([self_val.astype(dtype), f_val], axis=0)

        # ---- local Morton order of the received rows -------------------
        cr = _particles.discretize(r_pos, box_size, depth)
        rhi, rlo = morton.encode(cr, ndim, depth)
        _, _, perm_r, (pos_r, mass_r, val_f) = _build.sort_by_code(
            rhi, rlo, r_pos, r_mass, r_val)
        val_r = val_f > 0.5
        mass_r = jnp.where(val_r, mass_r, 0.0)

        # ---- local tree over my Morton range ---------------------------
        td = _build.build_tree(pos_r, mass_r, cfg_q, box_size=box_size)
        big = jnp.asarray(2.0, dtype) * box_size
        dlo_l = jnp.min(jnp.where(val_r[:, None], pos_r, big), axis=0)
        dhi_l = jnp.max(jnp.where(val_r[:, None], pos_r, -big), axis=0)
        dlo = jax.lax.all_gather(dlo_l, axis)            # [ndev, D]
        dhi = jax.lax.all_gather(dhi_l, axis)
        nonempty = jax.lax.all_gather(jnp.any(val_r), axis)
        not_me = (jnp.arange(ndev, dtype=I32) != me) & nonempty

        acc_m, pot_m, ovf, exp_ovf, e_cnt = _export_query(
            td, cfg_q, cfg_e, theta, eps, G, box_size, ndev, axis,
            export_cap, dlo, dhi, not_me)

        # ---- route results back to their input shard -------------------
        inv_pr = _build._inv_permutation(perm_r)
        acc_rcv = acc_m[inv_pr]                          # [nl2, D]
        pot_rcv = pot_m[inv_pr]
        b_acc = jax.lax.all_to_all(
            acc_rcv[nl:].reshape(ndev, cap, ndim), axis, split_axis=0,
            concat_axis=0)
        b_pot = jax.lax.all_to_all(
            pot_rcv[nl:].reshape(ndev, cap), axis, split_axis=0,
            concat_axis=0)
        jj = jnp.arange(nl, dtype=I32)
        is_self = dest == me
        slot = jj - start[dest]
        slot_f = jnp.clip(slot, 0, cap - 1)
        slot_s = jnp.clip(slot, 0, nl - 1)
        acc_ls = jnp.where(is_self[:, None], acc_rcv[slot_s],
                           b_acc[dest, slot_f])          # [nl, D]
        pot_ls = jnp.where(is_self, pot_rcv[slot_s], b_pot[dest, slot_f])
        inv_pl = _build._inv_permutation(perm_l)
        exp_ovf = exp_ovf | jax.lax.pmax(
            x_ovf.astype(I32), axis).astype(bool)
        return (acc_ls[inv_pl], pot_ls[inv_pl], ovf, exp_ovf,
                e_cnt[None])

    acc, pot, ovf, exp_ovf, e_cnt = run(pos, mass)
    if with_stats:
        return acc[:n], pot[:n], ovf, exp_ovf, e_cnt
    return acc[:n], pot[:n], ovf, exp_ovf


def _acc_pot_let_global(pos, mass, cfg_q, cfg_e, theta, eps, G, mesh,
                        axis, box_size, export_cap, n, n_pad, depth):
    """Round-1 reference phase 0: one replicated global Morton sort +
    equal contiguous ranges (O(N) memory per chip)."""
    ndev = mesh.shape[axis]
    ndim = pos.shape[1]
    dtype = pos.dtype
    cells = _particles.discretize(pos, box_size, depth)
    chi, clo = morton.encode(cells, ndim, depth)
    _, _, perm, (pos_s, mass_s) = _build.sort_by_code(chi, clo, pos, mass)
    pad = n_pad - n
    if pad:
        corner = jnp.full((pad, ndim), box_size * 0.4999, dtype)
        pos_s = jnp.concatenate([pos_s, corner], axis=0)
        mass_s = jnp.concatenate([mass_s, jnp.zeros(pad, dtype)], axis=0)

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(axis), P(axis)),
             out_specs=(P(axis), P(axis), P(), P()))
    def run(pos_l, mass_l):
        td = _build.build_tree(pos_l, mass_l, cfg_q, box_size=box_size)
        me = jax.lax.axis_index(axis)
        # domain AABBs (zero-mass sentinels included: conservative)
        dlo = jax.lax.all_gather(jnp.min(pos_l, axis=0), axis)  # [ndev, D]
        dhi = jax.lax.all_gather(jnp.max(pos_l, axis=0), axis)
        not_me = jnp.arange(ndev, dtype=I32) != me
        return _export_query(td, cfg_q, cfg_e, theta, eps, G, box_size,
                             ndev, axis, export_cap, dlo, dhi, not_me)[:4]

    acc_m, pot_m, ovf, exp_ovf = run(pos_s, mass_s)
    # unpad + global Morton -> input order
    inv = _build._inv_permutation(perm)
    return acc_m[:n][inv], pot_m[:n][inv], ovf, exp_ovf

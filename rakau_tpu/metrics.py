"""Structured per-query metrics and observability.

Reference has only phase timers + exceptions (SURVEY.md §6). The rebuild
needs interaction counts and padding-waste figures first-class — they are
the main TPU performance risk (static caps vs actual list sizes) and feed
both the benchmark harness and the adaptive cap tuner."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from . import engine, traversal
from .build import TreeData
from .config import TreeConfig


@dataclass
class QueryStats:
    n: int
    n_nodes: int
    n_tiles: int
    tile_fill: float              # mean tile occupancy / ncrit
    m2p_mean: float
    m2p_p95: float
    m2p_max: int
    m2p_cap: int
    p2p_mean: float
    p2p_p95: float
    p2p_max: int
    p2p_src_cap: int
    m2p_waste: float              # 1 - mean/cap (padded work fraction)
    p2p_waste: float
    interactions_m2p: float       # total useful pair interactions
    interactions_p2p: float

    def as_dict(self) -> Dict:
        return self.__dict__.copy()


def collect_query_stats(td: TreeData, cfg: TreeConfig, theta,
                        max_chunks: int = 16) -> QueryStats:
    """Run the per-tile list traversal (only) and report list occupancy
    statistics. Always uses traversal_mode='lists' — per-tile list sizes
    are the meaningful padding-waste diagnostic; the shared-candidate
    mode auto-tunes from its own query maxima (engine with_stats)."""
    import os
    # this IS a diagnostic: allow the lists config for the duration of
    # this call only, then restore (a permanent setdefault here silently
    # disabled product-mode validation process-wide, ADVICE r4)
    prev = os.environ.get("RAKAU_DIAG_MODES")
    os.environ["RAKAU_DIAG_MODES"] = "1"
    try:
        cfg = cfg.with_(traversal_mode="lists")
    finally:
        if prev is None:
            os.environ.pop("RAKAU_DIAG_MODES", None)
        else:
            os.environ["RAKAU_DIAG_MODES"] = prev
    tiles_pos, tiles_idx, blo, bhi, _tcell = engine._gather_tiles(td, cfg)
    nch = tiles_pos.shape[0]
    f = jax.jit(traversal.build_interaction_lists,
                static_argnames=("cfg",))
    th = jnp.asarray(theta, td.pos.dtype)
    m2p, p2p = [], []
    for c in range(min(nch, max_chunks)):
        il = f(td, cfg, th, blo[c], bhi[c])
        m2p.append(np.asarray(il.m2p_count))
        p2p.append(np.asarray(il.p2p_count))
    m2p = np.concatenate(m2p).astype(np.float64)
    p2p = np.concatenate(p2p).astype(np.float64)
    n_tiles = int(td.n_tiles)
    tc = np.asarray(td.tile_cnt)[:n_tiles].astype(np.float64)
    scale = nch / max(1, min(nch, max_chunks))  # extrapolate totals
    return QueryStats(
        n=int(td.pos.shape[0]), n_nodes=int(td.n_nodes), n_tiles=n_tiles,
        tile_fill=float(tc.mean() / cfg.ncrit) if n_tiles else 0.0,
        m2p_mean=float(m2p.mean()), m2p_p95=float(np.percentile(m2p, 95)),
        m2p_max=int(m2p.max()), m2p_cap=cfg.m2p_cap,
        p2p_mean=float(p2p.mean()), p2p_p95=float(np.percentile(p2p, 95)),
        p2p_max=int(p2p.max()), p2p_src_cap=cfg.p2p_src_cap,
        m2p_waste=float(1.0 - m2p.mean() / cfg.m2p_cap),
        p2p_waste=float(1.0 - p2p.mean() / cfg.p2p_src_cap),
        interactions_m2p=float(m2p.sum() * cfg.ncrit * scale),
        interactions_p2p=float(p2p.sum() * cfg.ncrit * scale),
    )


@dataclass
class SharedDensityStats:
    """Useful-pair density of the fused shared-candidate kernel.

    `useful_pairs` counts (valid target, mask-on source) pairs — the
    physics the query actually needs. `processed_pairs` counts the pairs
    the fused Pallas kernel computes after its per-tile active-block
    compaction (cnt x block x T per tile) — the work it really does.
    Their ratio `density` is THE number that says whether traversal
    restructuring is working (VERDICT r1 item 8): at density ~1 the
    kernel's pair rate IS the useful rate. `slot_pairs` is the
    uncompacted S*T*C slot count (what a mask-oblivious kernel would
    compute). Grid2's in-kernel cell-coverage kills (covered pairs) are
    counted as useful here — they are mask-on; the coverage test is a
    per-pair refinement inside a block that compaction cannot skip."""
    useful_pairs: float
    processed_pairs: float
    slot_pairs: float
    density: float                # useful / processed
    slot_density: float           # useful / slot
    pairs_per_particle: float     # useful / N
    chunks_sampled: int
    block: int
    subblock: int

    def as_dict(self) -> Dict:
        return self.__dict__.copy()


def collect_shared_density(td: TreeData, cfg: TreeConfig, theta,
                           eps=0.0, max_chunks: int = 8
                           ) -> SharedDensityStats:
    """Measure fused-kernel useful-pair density on sampled tile chunks.

    Replays the shared traversal (traversal2.build_shared_sources) and
    the engine's far/near mask gating for `max_chunks` chunks, then
    replicates eval_shared_fused's block compaction arithmetic on the
    masks — no kernel launch, so it is cheap enough to run inside the
    benchmark harness. Requires cfg.traversal_mode == 'shared'."""
    if not engine._use_shared(cfg):
        raise ValueError("density stats require the shared traversal")
    from . import expansion
    from .kernels import pallas as pk
    traversal2 = engine._traversal_mod(cfg)
    n = int(td.pos.shape[0])
    tiles, tables = engine._tiles_jit(td, cfg)
    (tpos_a, tidx_a, blo_a, bhi_a, tcell_a), gx = engine._split_tiles(tiles)
    n_chunks = tidx_a.shape[0]
    CH = tidx_a.shape[1]
    n_live = max(1, min(-(-int(td.n_tiles) // CH), n_chunks))
    T = cfg.ncrit

    # the kernel's block/subblock resolution, single-sourced from the
    # kernel module (pallas.fused_block_plan) so it can never drift
    grid2_mode = cfg.farfield == "grid2"
    has_quad = cfg.multipole_order >= 2
    eff_sep = cfg.grid_sep if grid2_mode else 0

    # td/tables enter as jit ARGUMENTS: closing over them embeds the
    # full tree in the HLO as constants, which blows the remote-compile
    # upload limit at 8M (HTTP 413) and defeats executable reuse.
    @jax.jit
    def chunk_stats(td, tables, tpos, tidx, blo, bhi, tcell, clo, chi):
        tvalid = tidx[:, 0] < n
        kw = dict(tables=tables, tile_valid=tvalid)
        if grid2_mode:
            kw.update(tcell_lo=clo, tcell_hi=chi)
        else:
            kw.update(tile_cell=tcell)
        src = traversal2.build_shared_sources(
            td, cfg, jnp.asarray(theta, td.pos.dtype), blo, bhi, **kw)
        mask = src.mask                                   # [C, S]
        if cfg.farfield in ("local", "grid"):
            U = cfg.m2p_cap
            center = 0.5 * (blo + bhi)
            rad2 = jnp.sum((0.5 * (bhi - blo)) ** 2, axis=-1)
            _, near = expansion.far_split(
                center, rad2, src.pos[:U], src.mass[:U], mask[:, :U],
                cfg.local_gamma)
            mask = jnp.concatenate([near, mask[:, U:]], axis=1)
        tcnt = jnp.sum(tidx < n, axis=1).astype(jnp.float32)   # [C]
        useful = jnp.sum(jnp.sum(mask, axis=1).astype(jnp.float32) * tcnt)

        # fused-kernel compaction arithmetic, via the kernel's own plan
        def seg_processed(mseg, quad_seg):
            S0 = mseg.shape[1]
            blk, sb, S, ng, gran = pk.fused_block_plan(S0, eff_sep,
                                                       quad_seg)
            m = jnp.pad(mseg.astype(jnp.float32), ((0, 0), (0, S - S0)))
            blk_any = m.reshape(m.shape[0], ng, gran).sum(axis=2) > 0
            cnt = jnp.sum(blk_any, axis=1)
            if sb:
                cnt = -(-cnt // (blk // sb))
            return jnp.sum(cnt).astype(jnp.float32) * blk * T

        if has_quad:
            # dispatch.eval_shared splits a quadrupole evaluation into a
            # quad launch on the U node rows + a mono launch on the rest
            U = cfg.m2p_cap
            processed = (seg_processed(mask[:, :U], True)
                         + seg_processed(mask[:, U:], False))
        else:
            processed = seg_processed(mask, False)
        return useful, processed

    take = min(n_live, max_chunks)
    useful = processed = slots = 0.0
    # the shared row is the m2p + p2p caps by construction
    # (traversal{2,3}.build_shared_sources concatenates exactly those);
    # host-side because a jit-returned python-int constant came back 0
    # on the axon backend (slot_density printed as useful_pairs, r3)
    s0 = cfg.m2p_cap + cfg.p2p_src_cap
    # STRIDED sample: with tile clipping (grid mode) tiles are
    # heterogeneous — the first chunks are near-empty halo tiles, and
    # extrapolating them linearly reported 3.6 useful pairs/particle on
    # a query whose RMS proved the masks were fine (r3). Bin MIDPOINTS
    # (not endpoints): the endpoint-inclusive stride always sampled the
    # last live chunk, which is partially padding, and linear
    # extrapolation over-weighted it (ADVICE r3).
    sample = sorted({int((i + 0.5) * n_live / take)
                     for i in range(take)})
    take = len(sample)
    for c in sample:
        clo = gx[1][c] if gx is not None else None
        chi = gx[2][c] if gx is not None else None
        u, p = chunk_stats(td, tables, tpos_a[c], tidx_a[c], blo_a[c],
                           bhi_a[c], tcell_a[c], clo, chi)
        useful += float(u)
        processed += float(p)
        slots += float(CH * s0 * T)
    scale = n_live / take
    useful *= scale
    processed *= scale
    slots *= scale
    blk, sb, _, _, _ = pk.fused_block_plan(
        cfg.m2p_cap + cfg.p2p_src_cap, eff_sep, False)
    return SharedDensityStats(
        useful_pairs=useful, processed_pairs=processed, slot_pairs=slots,
        density=useful / max(processed, 1.0),
        slot_density=useful / max(slots, 1.0),
        pairs_per_particle=useful / max(n, 1),
        chunks_sampled=take, block=blk, subblock=sb)


def measure_kernel_roof(cfg: TreeConfig, n_src: int = 262144,
                        reps: int = 8) -> float:
    """Measured dense ceiling of the fused shared kernel, in pairs/sec.

    Launches the SAME kernel configuration the benched query uses
    (coverage planes when farfield='grid2') with an all-on mask and all
    pairs passing the coverage test, `reps` times inside one executable
    (lax.scan) so the ~26 ms dispatch floor amortizes away. The ratio
    achieved/roof is the kernel MFU the bench reports (VERDICT r2
    missing #6: relate pair rates to a measured ceiling, not a guess)."""
    import time

    import jax
    import jax.numpy as jnp

    from .kernels import dispatch

    C, T, D = cfg.tile_chunk, cfg.ncrit, cfg.ndim
    S = n_src
    # deterministic non-degenerate positions; r2 > 0 for every pair
    tgt = (jnp.arange(C * T * D, dtype=jnp.float32)
           .reshape(C, T, D) % 251.0) * 1e-3 + 1.0
    src = (jnp.arange(S * D, dtype=jnp.float32)
           .reshape(S, D) % 257.0) * 1e-3 - 1.0
    smass = jnp.ones((S,), jnp.float32)
    sidx = jnp.full((S,), -1, jnp.int32)        # never matches a target
    tidx = jnp.arange(C * T, dtype=jnp.int32).reshape(C, T)
    mask = jnp.ones((C, S), bool)
    grid2_mode = cfg.farfield == "grid2"
    scell = jnp.zeros((S, D), jnp.int32) if grid2_mode else None
    tcell = jnp.zeros((C, T, D), jnp.int32) if grid2_mode else None
    # quadrupole roof: every source carries second-moment planes, as on
    # the benched query's node-row launch (without this the "quad" roof
    # silently measured the monopole kernel)
    squad = (jnp.ones((S, D * (D + 1) // 2), jnp.float32) * 1e-6
             if cfg.multipole_order >= 2 else None)
    ep = jnp.float32(0.0)
    g = jnp.float32(1.0)

    @jax.jit
    def run(tgt):
        def step(t, _):
            a, p = dispatch.eval_shared(cfg, t, tidx, src, smass, sidx,
                                        mask, ep, g, src_cell=scell,
                                        tgt_cell=tcell, src_quad=squad)
            # feed the output into the next iteration's targets so the
            # body cannot be hoisted as loop-invariant
            return t + 1e-12 * a, p[0, 0]

        t_fin, ps = jax.lax.scan(step, tgt, None, length=reps)
        return t_fin[0, 0, 0] + ps.sum()

    jax.block_until_ready(run(tgt))                       # compile
    t0 = time.perf_counter()
    jax.block_until_ready(run(tgt))
    dt = time.perf_counter() - t0
    return reps * C * T * S / dt


def fitted_caps(stats: QueryStats, slack: float = 1.25,
                quantum: int = 512) -> Dict[str, int]:
    """Shrink-to-fit capacities from measured maxima (adaptive-static
    tuning: measure once, re-jit with snug caps; SURVEY.md §8 'hard
    parts' #1)."""
    def fit(mx):
        want = int(np.ceil(mx * slack / quantum)) * quantum
        return max(quantum, want)

    return {
        "m2p_cap": fit(stats.m2p_max),
        "p2p_src_cap": fit(stats.p2p_max),
        "p2p_leaf_cap": max(256, fit(stats.p2p_max) // 4),
    }

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
    cfg = cfg.with_(traversal_mode="lists")
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

"""Static configuration for the TPU Barnes-Hut engine.

Mirrors the reference's two-tier config scheme (rakau `tree.hpp`: compile-time
template params NDim/F/UInt/MAC + per-call igor kwargs, SURVEY.md C12): here the
"compile-time" tier is a frozen dataclass that participates in jit static
arguments, while theta/eps/G stay per-call traced scalars.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

# Multipole acceptance criteria (reference: `enum class mac { bh, bh_geom }`,
# SURVEY.md C6).
MAC_BH = "bh"
MAC_BH_GEOM = "bh_geom"
_VALID_MACS = (MAC_BH, MAC_BH_GEOM)


def default_max_depth(ndim: int) -> int:
    # Reference uses 21 bits/dim for 3D, 31 for 2D (libmorton 63/62-bit codes,
    # SURVEY.md C1). Dual-uint32 keys hold up to 63 bits.
    return {1: 62, 2: 31, 3: 21}[ndim]


@dataclasses.dataclass(frozen=True)
class TreeConfig:
    """Hashable static config (jit static argument).

    Attributes
    ----------
    ndim: spatial dimension (2 or 3; the reference's NDim template param).
    dtype: coordinate/force dtype (fp32 on TPU; fp64 available on CPU backend).
    max_depth: maximum tree depth == bits per dimension of the Morton key.
    max_leaf_n: split a node only if it holds more particles than this
        (reference kwarg `max_leaf_n`).
    ncrit: target-tile size — consecutive Morton-ordered particles grouped as
        one traversal work unit (the reference's critical-node `ncrit` knob,
        re-tuned for TPU tile economics; SURVEY.md §8 "hard parts").
    mac: "bh" or "bh_geom".
    node_cap: capacity of the flat node array (static shape). None = auto.
    frontier_cap: per-tile traversal frontier capacity (walk modes); in
        lmac mode (which has no frontier) this knob instead caps the
        slice-level group-candidate table (traversal3.GroupCand) — the
        same overflow flag / maxima slot / tune_caps plumbing sizes it.
    m2p_cap: per-tile cap on accepted multipole (node) interactions.
    p2p_leaf_cap: per-tile cap on leaf nodes needing direct P2P.
    p2p_src_cap: per-tile cap on gathered P2P source particles.
    tile_chunk: number of target tiles traversed/evaluated per sequential
        chunk (bounds peak memory of the padded interaction lists).
    multipole_order: 0 = monopole (reference parity), 2 adds quadrupole
        (accuracy extension beyond the reference).
    """

    ndim: int = 3
    dtype: str = "float32"
    max_depth: Optional[int] = None
    max_leaf_n: int = 64
    ncrit: int = 256
    mac: str = MAC_BH
    node_cap: Optional[int] = None
    tile_cap: Optional[int] = None
    frontier_cap: int = 1024
    m2p_cap: int = 4096
    p2p_leaf_cap: int = 512
    p2p_src_cap: int = 8192
    tile_chunk: int = 64
    multipole_order: int = 0
    kernel_backend: str = "auto"  # "auto" | "xla" | "pallas"
    # "shared": per-chunk union walk with exact per-tile masks
    # (traversal2); "lmac": walk-free monotone local-MAC predicate
    # (traversal3 — strictly tighter acceptance than bh at equal theta);
    # "gwalk": ONE global (tile, node) incidence walk + block-aligned
    # source pool + single-launch pool kernel (traversal4 — no per-chunk
    # re-walk/materialization, kernel density ~1 by construction);
    # "lists": per-tile interaction lists (traversal.py).
    # In gwalk mode the walk/list capacities take GLOBAL meaning:
    # m2p_cap = total (tile, node) M2P incidences, p2p_leaf_cap = total
    # opened (tile, leaf) incidences, p2p_src_cap = total pool rows,
    # frontier_cap = peak global frontier pairs. The same overflow/
    # fit_caps machinery sizes them.
    traversal_mode: str = "shared"  # "shared" | "lists" | "lmac" | "gwalk"
    # Far-field handling (shared traversal only): "local" accumulates
    # MAC-accepted nodes that are far relative to the target tile into a
    # tile-local Taylor expansion (M2L+L2P, expansion.py) and keeps only
    # near nodes on the per-particle M2P kernel path; "m2p" evaluates
    # every accepted node per particle (reference-exact structure);
    # "grid" additionally computes everything beyond the 5^D-cell leaf-
    # grid neighborhood with dense stencil M2L (grid.py) so the walk only
    # resolves the near region ("local" rules apply inside it).
    # "grid2" is the decoupled conv-M2L far field (grid2.py): per-
    # particle leaf-cell L2P + in-kernel per-pair cell-separation
    # masking, so the grid level is independent of tile size.
    farfield: str = "local"  # "local" | "m2p" | "grid" | "grid2"
    local_order: int = 3     # Taylor (local) order; grid/local <= 3,
                             # grid2 supports 2..8
    # Leaf-grid level for farfield="grid"/"grid2" (None = auto;
    # grid.effective_grid_level / grid2.effective_grid_level).
    grid_level: Optional[int] = None
    # grid2 knobs: multipole order of the conv M2L (None = local_order),
    # minimum covered cell separation S (near field = (2S-1)^D cells),
    # and the target mean particles/cell for the auto grid level.
    grid_multipole_order: Optional[int] = None
    grid_sep: int = 3
    grid_occupancy: int = 32
    # Kernel accumulation: "fp32" or "compensated" (TwoSum across source
    # blocks — the TPU-native "mixed fp32/fp64 accumulation" of BASELINE
    # config #3; fp64 hardware accumulate does not exist on TPU).
    accum: str = "fp32"
    # gwalk pool geometry: source block rows (per-tile segments are
    # block-aligned; the kernel streams whole blocks) and the VMEM-
    # resident window rows (no tile's segment may straddle a window).
    pool_block: int = 512
    pool_window: int = 262144
    # Tiles evaluated per pool-kernel grid step (they share one VMEM
    # window; per-step overhead measured ~40 us on v5e, so one step per
    # tile made the 262k kernel launch 2.3x slower than its pair work).
    # Window packing keeps whole GROUPS inside one window.
    pool_group: int = 8
    # gwalk per-round frontier capacities (static tuple): when set, the
    # global walk unrolls with each round's shapes matched to its real
    # frontier instead of paying frontier_cap*2^D every round. Fit from
    # a tuning query's GlobalLists.round_counts via fit_round_caps.
    gwalk_round_caps: Optional[tuple] = None
    # Far gate: dist(tile_center, COM) > gamma * r_tile. gamma=4 measured
    # RMS-neutral vs the exact per-particle M2P path at theta=0.75
    # (1.99e-3 vs 1.98e-3, 16k Plummer); gamma=2 trades ~1.8x RMS for a
    # smaller near-field kernel residue.
    local_gamma: float = 4.0

    def __post_init__(self):
        if self.ndim not in (2, 3):
            raise ValueError(f"ndim must be 2 or 3, got {self.ndim}")
        if self.mac not in _VALID_MACS:
            raise ValueError(f"mac must be one of {_VALID_MACS}, got {self.mac!r}")
        md = self.max_depth
        if md is None:
            object.__setattr__(self, "max_depth", default_max_depth(self.ndim))
        elif not (1 <= md * self.ndim <= 63):
            raise ValueError(
                f"max_depth*ndim must be in [1, 63], got {md}*{self.ndim}")
        if self.max_leaf_n < 1:
            raise ValueError("max_leaf_n must be >= 1")
        if self.ncrit < 1:
            raise ValueError("ncrit must be >= 1")
        if self.multipole_order not in (0, 2):
            raise ValueError("multipole_order must be 0 (monopole) or 2 (quadrupole)")
        if self.kernel_backend not in ("auto", "xla", "pallas"):
            raise ValueError("kernel_backend must be auto|xla|pallas")
        if self.traversal_mode not in ("shared", "lists", "lmac",
                                       "gwalk"):
            raise ValueError(
                "traversal_mode must be shared|lists|lmac|gwalk")
        if self.traversal_mode == "gwalk":
            if self.farfield not in ("m2p", "grid", "grid2"):
                raise ValueError(
                    "traversal_mode='gwalk' supports farfield='m2p', "
                    "'grid' or 'grid2' (tiles are clipped at leaf-grid "
                    "cells in the grid modes so pool-row coverage tests "
                    "are exact per pair)")
            if (self.pool_block < 128
                    or self.pool_window % self.pool_block):
                raise ValueError(
                    "pool_window must be a multiple of pool_block "
                    "(>= 128)")
            if self.pool_group < 1:
                raise ValueError("pool_group must be >= 1")
        # --- product-mode matrix (r3 verdict item: dead combos raise) ---
        # Product engines: traversal "shared" with farfield
        # grid|grid2|m2p (headline theta-envelope configs) and "lmac"
        # with grid2|m2p (accuracy engine: strictly-tighter monotone box
        # MAC). "lists" (the round-1 per-tile interaction lists) and
        # quadrupole with the tile-expansion far fields (local/grid,
        # which would silently fall back to the lists path) are
        # DIAGNOSTIC-ONLY: set RAKAU_DIAG_MODES=1 to use them for
        # debugging or as the reference-exact oracle mode.
        import os as _os
        _diag = _os.environ.get("RAKAU_DIAG_MODES") == "1"
        if self.traversal_mode == "lists" and not _diag:
            raise ValueError(
                "traversal_mode='lists' is diagnostic-only (superseded "
                "by 'shared'/'lmac'; set RAKAU_DIAG_MODES=1 to allow)")
        if (self.multipole_order >= 2
                and self.farfield in ("local", "grid") and not _diag):
            raise ValueError(
                "multipole_order=2 requires farfield='m2p' or 'grid2' "
                "(with 'local'/'grid' the quadrupole falls back to the "
                "diagnostic lists path; set RAKAU_DIAG_MODES=1 to allow)")
        if self.farfield not in ("local", "m2p", "grid", "grid2"):
            raise ValueError("farfield must be local|m2p|grid|grid2")
        if self.farfield == "grid2":
            if self.traversal_mode not in ("shared", "lmac", "gwalk"):
                raise ValueError(
                    "farfield='grid2' requires traversal_mode='shared', "
                    "'lmac' (per-pair kernel coverage masks) or 'gwalk' "
                    "(cell-clipped tiles + pool-row coverage drops)")
            if not (2 <= self.local_order <= 8):
                raise ValueError("grid2 local_order must be in [2, 8]")
            gq = self.grid_multipole_order
            if gq is not None and not (0 <= gq <= 8):
                raise ValueError("grid_multipole_order must be in [0, 8]")
            if self.grid_sep < 2:
                raise ValueError("grid_sep must be >= 2")
            cap = {1: 21, 2: 10, 3: 7}[self.ndim]
            if self.grid_level is not None and not (
                    0 <= self.grid_level <= cap):
                raise ValueError(
                    f"grid2 grid_level must be in [0, {cap}] for ndim="
                    f"{self.ndim} (cell ids must pack into f32-exact "
                    "ints; grid2.effective_grid_level caps likewise)")
            if self.grid_occupancy < 1:
                raise ValueError("grid_occupancy must be >= 1")
        elif self.local_order not in (2, 3):
            raise ValueError("local_order must be 2 or 3")
        if self.local_gamma <= 1.0:
            raise ValueError("local_gamma must be > 1 (rho = 1/gamma < 1)")
        if self.accum not in ("fp32", "compensated"):
            raise ValueError("accum must be fp32|compensated")

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def code_bits(self) -> int:
        return self.max_depth * self.ndim

    def node_capacity(self, n_particles: int) -> int:
        if self.node_cap is not None:
            return self.node_cap
        # Nonempty reached nodes per level <= 2^ndim * (#split nodes at the
        # previous level) and #split <= N/(max_leaf_n+1); total across levels
        # is in practice ~2-3x N/max_leaf_n. 8x plus slack is a generous
        # static cap; overflow is detected and the host retries larger.
        cap = 8 * (n_particles // max(self.max_leaf_n, 1) + 1) + 4 ** self.ndim
        return int(cap)

    def tile_capacity(self, n_particles: int) -> int:
        """Static capacity of the target-tile table (ncrit-wide Morton
        slices within each deepest >ncrit node; actual count is
        data-dependent, typically ~1.3x N/ncrit)."""
        if self.tile_cap is not None:
            return self.tile_cap
        # actual count is ~1.3x N/ncrit; every padding tile costs a full
        # (walk + kernel) pass in a chunk, so keep this snug and rely on
        # the overflow-retry to grow it for pathological distributions.
        cap = 2 * (-(-n_particles // self.ncrit)) + 64
        L0 = 0
        if self.farfield == "grid":
            from .grid import effective_grid_level
            L0 = effective_grid_level(self, n_particles)
        elif self.farfield == "grid2" and self.traversal_mode == "gwalk":
            # gwalk clips tiles at grid2 cells too (build.py) — without
            # this term the 227-tile/cap-192 truncation silently zeroed
            # the near field of the dropped tiles (r5 grid2 bug)
            from .grid2 import effective_grid_level
            L0 = effective_grid_level(self, n_particles)
        if L0 > 0:
            # cell clipping adds up to one extra tile per occupied cell
            cap += min((1 << L0) ** self.ndim, n_particles)
        return cap

    def with_(self, **kw) -> "TreeConfig":
        return dataclasses.replace(self, **kw)


# Canonical order of the growable interaction-list capacities: the [4]
# overflow-flag / maxima vectors of engine.acc_pot_u(_host) align with
# this (bench.py, tune_caps, tune_gwalk and the retry drivers all grow
# caps through it — hand-rolled copies drifted twice, VERDICT r1/r2).
OVF_FIELDS = ("m2p_cap", "p2p_leaf_cap", "p2p_src_cap", "frontier_cap")


def grow_overflowed(cfg: TreeConfig, flags) -> TreeConfig:
    """Double exactly the capacities whose overflow flag is set."""
    return cfg.with_(**{f: 2 * getattr(cfg, f)
                        for f, hit in zip(OVF_FIELDS, flags) if hit})


def fit_caps(cfg: TreeConfig, maxima, slack: float = 1.25,
             quantum: int = 512) -> TreeConfig:
    """Shrink interaction-list capacities to the maxima measured by a
    query (the [4] int32 stats vector from engine.acc_pot_u(with_stats)/
    acc_pot_u_host: max m2p, p2p_src, frontier, p2p_leaf counts).

    SINGLE SOURCE of the cap-fitting arithmetic — Tree.tune_caps and
    bench.py both call this (their hand-rolled copies drifted twice,
    VERDICT r1/r2). Padding waste is the main TPU perf cost (SURVEY §8),
    so caps are fitted snug (slack 1.25) and quantized to keep recompiles
    rare."""
    stats = [int(x) for x in maxima]
    m2p_max, p2p_max, f_max = stats[:3]
    leaf_max = stats[3] if len(stats) > 3 else p2p_max // 4

    def fit(v, q):
        return max(q, -(-int(v * slack) // q) * q)

    return cfg.with_(
        m2p_cap=fit(m2p_max, quantum),
        p2p_src_cap=fit(p2p_max, 2 * quantum),
        p2p_leaf_cap=max(256, fit(leaf_max, 256)),
        frontier_cap=max(256, fit(f_max, 256)))


def fit_round_caps(round_counts, slack: float = 1.3,
                   quantum: int = 256) -> tuple:
    """Per-round frontier capacities for the unrolled gwalk walk from a
    tuning query's measured GlobalLists.round_counts (open pairs after
    each round). Trailing zero rounds are dropped — they become
    STATICALLY absent in the unrolled walk."""
    counts = [int(c) for c in round_counts]
    while counts and counts[-1] == 0:
        counts.pop()
    return tuple(max(quantum, -(-int(c * slack) // quantum) * quantum)
                 for c in counts)

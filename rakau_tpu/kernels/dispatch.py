"""Kernel backend dispatch (reference analog: the CPU-SIMD vs CUDA/HIP
backend choice behind rakau's heterogeneous dispatch, SURVEY.md C13-C15 —
here it picks the pure-XLA reference kernels or the Pallas TPU kernels)."""
from __future__ import annotations

import logging

import jax

from ..config import TreeConfig
from . import xla

logger = logging.getLogger("rakau_tpu")
_warned_fused_fallback = False
_warned_skip_kernel = False


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def eval_shared(cfg: TreeConfig, tgt_pos, tgt_idx, src_pos, src_mass,
                src_idx, mask, eps, G, mode: str = "both",
                src_cell=None, tgt_cell=None, src_quad=None):
    """Shared-candidate evaluation (traversal2): sources common to the
    chunk's tiles, per-tile mask planes. mode: "both" | "acc" | "pot"
    (accs-only skips the potential reduction; pots-only skips the
    acceleration reductions — the skipped output is returned as zeros).

    src_cell [S, D] / tgt_cell [C, T, D] (grid2): per-pair leaf-grid
    coverage masking with separation cfg.grid_sep (grid2.py).

    src_quad [U, Q] (multipole_order=2): raw second moments of the FIRST
    U source rows (the traversal's M2P node segment). The evaluation
    splits into two launches — quadrupole kernel on rows [0, U), plain
    monopole kernel on rows [U, S) — so the (ndim more planes, ~3x
    flops/pair) quadrupole math is paid only on the node rows."""
    backend = cfg.kernel_backend
    if backend == "auto":
        backend = "pallas" if _on_tpu() else "xla"
    comp = cfg.accum == "compensated"
    sep = cfg.grid_sep if src_cell is not None else 0
    import os as _os
    if _os.environ.get("RAKAU_SKIP_KERNEL") == "1":
        # timing diagnostic: everything-but-the-kernel slice cost. All
        # operands feed the output so DCE cannot drop the traversal/
        # materialization work being measured. Read at TRACE time (the
        # jit cache does not key on env — toggling mid-process reuses
        # the stale executable), hence the loud warning.
        global _warned_skip_kernel
        if not _warned_skip_kernel:
            _warned_skip_kernel = True
            logger.warning(
                "RAKAU_SKIP_KERNEL=1: pairwise kernel REPLACED BY ZEROS"
                " (timing forensics only; results are not physics)."
                " Baked in at trace time — restart the process to"
                " clear it.")
        import jax.numpy as jnp
        C, T, D = tgt_pos.shape
        z = (jnp.sum(src_pos) + jnp.sum(src_mass)
             + jnp.sum(mask.astype(tgt_pos.dtype))
             + jnp.sum(src_idx.astype(tgt_pos.dtype)))
        if src_cell is not None:
            z = z + jnp.sum(src_cell.astype(tgt_pos.dtype))
        if src_quad is not None:
            z = z + jnp.sum(src_quad)
        z = z * 0.0
        return (jnp.zeros((C, T, D), tgt_pos.dtype) + z,
                jnp.zeros((C, T), tgt_pos.dtype) + z)
    if src_pos.shape[0] == 0:
        # empty segment (e.g. an all-quad row's monopole launch): both
        # kernels break on zero-length source rows
        import jax.numpy as jnp
        C, T, D = tgt_pos.shape
        z = jnp.zeros((C, T, D), tgt_pos.dtype)
        return z, jnp.zeros((C, T), tgt_pos.dtype)
    if src_quad is not None:
        U = src_quad.shape[0]
        a1, p1 = eval_shared(cfg, tgt_pos, tgt_idx, src_pos[U:],
                             src_mass[U:], src_idx[U:], mask[:, U:],
                             eps, G, mode=mode,
                             src_cell=None if src_cell is None
                             else src_cell[U:], tgt_cell=tgt_cell)
        if backend == "pallas":
            from . import pallas as pk
            if U * 2 <= pk.fused_vmem_src_limit(sep, True):
                a2, p2 = pk.eval_shared_fused(
                    tgt_pos, tgt_idx, src_pos[:U], src_mass[:U],
                    src_idx[:U], mask[:, :U], eps, G, compensated=comp,
                    mode=mode, src_cell=None if src_cell is None
                    else src_cell[:U], tgt_cell=tgt_cell, grid_sep=sep,
                    src_quad=src_quad)
                return a1 + a2, p1 + p2
        a2, p2 = xla.eval_shared(
            tgt_pos, tgt_idx, src_pos[:U], src_mass[:U], src_idx[:U],
            mask[:, :U], eps, G, compensated=comp, mode=mode,
            src_cell=None if src_cell is None else src_cell[:U],
            tgt_cell=tgt_cell, grid_sep=sep, src_quad=src_quad)
        return a1 + a2, p1 + p2
    if backend == "pallas":
        import os
        from . import pallas as pk
        if os.environ.get("RAKAU_SHARED_FUSED", "1") != "0":
            S0 = src_pos.shape[0]
            lim = pk.fused_vmem_src_limit(sep, False)
            if S0 <= lim:
                return pk.eval_shared_fused(
                    tgt_pos, tgt_idx, src_pos, src_mass, src_idx, mask,
                    eps, G, compensated=comp, mode=mode,
                    src_cell=src_cell, tgt_cell=tgt_cell, grid_sep=sep)
            # Oversize source row: evaluate in VMEM-sized segments and
            # sum. Round 2's headline regression was this case silently
            # falling back to the XLA kernel (~30x slower per chunk)
            # whenever the overflow-retry loop grew the caps past the
            # limit; segmenting keeps the fused kernel's economics at
            # any capacity (a few extra launches per chunk).
            global _warned_fused_fallback
            if not _warned_fused_fallback:
                _warned_fused_fallback = True
                logger.warning(
                    "pallas: source row %d exceeds FUSED_VMEM_SRC_LIMIT"
                    " (%d); evaluating in %d fused segments. Lower"
                    " m2p_cap/p2p_src_cap (Tree.tune_caps) to get one.",
                    S0, lim, -(-S0 // lim))
            nseg = -(-S0 // lim)
            seg = -(-S0 // nseg)
            acc = pot = None
            for s in range(0, S0, seg):
                e = min(s + seg, S0)
                a, p = pk.eval_shared_fused(
                    tgt_pos, tgt_idx, src_pos[s:e], src_mass[s:e],
                    src_idx[s:e], mask[:, s:e], eps, G,
                    compensated=comp, mode=mode,
                    src_cell=None if src_cell is None else src_cell[s:e],
                    tgt_cell=tgt_cell, grid_sep=sep)
                acc = a if acc is None else acc + a
                pot = p if pot is None else pot + p
            return acc, pot
    return xla.eval_shared(tgt_pos, tgt_idx, src_pos, src_mass, src_idx,
                           mask, eps, G, compensated=comp, mode=mode,
                           src_cell=src_cell, tgt_cell=tgt_cell,
                           grid_sep=sep)


def eval_pool(cfg: TreeConfig, tgt_pos, tgt_idx, pool_pos, pool_mass,
              pool_idx, sched, window: int, block: int, eps, G,
              mode: str = "both", pool_quad=None):
    """gwalk pool evaluation (traversal4.build_pool feed): Pallas on
    TPU (one launch, VMEM-resident windows), dense-gather XLA reference
    elsewhere. The CPU reference ignores `compensated` on the monopole
    path (the CPU tree runs fp64 outright when accuracy matters)."""
    backend = cfg.kernel_backend
    if backend == "auto":
        backend = "pallas" if _on_tpu() else "xla"
    comp = cfg.accum == "compensated"
    if backend == "pallas":
        from . import pallas as pk
        return pk.eval_pool(tgt_pos, tgt_idx, pool_pos, pool_mass,
                            pool_idx, sched, window, eps, G, block,
                            compensated=comp, mode=mode,
                            pool_quad=pool_quad, group=cfg.pool_group)
    return xla.eval_pool(tgt_pos, tgt_idx, pool_pos, pool_mass,
                         pool_idx, sched, window, eps, G, block,
                         compensated=comp, mode=mode,
                         pool_quad=pool_quad)


def eval_tiles(cfg: TreeConfig, tgt_pos, tgt_idx,
               m2p_pos, m2p_mass, m2p_quad,
               p2p_pos, p2p_mass, p2p_idx, eps, G,
               m2p_cnt=None, p2p_cnt=None):
    """Sum far-field (M2P) and near-field (P2P) contributions.

    m2p_cnt/p2p_cnt [C]: per-tile valid source counts (lets the Pallas
    backend skip padded source blocks). Returns acc [C,T,D], pot [C,T]."""
    backend = cfg.kernel_backend
    if backend == "auto":
        backend = "pallas" if (_on_tpu() and m2p_quad is None) else "xla"
    if backend == "pallas" and m2p_quad is None:
        from . import pallas as pk
        return pk.eval_tiles(tgt_pos, tgt_idx, m2p_pos, m2p_mass, m2p_quad,
                             p2p_pos, p2p_mass, p2p_idx, eps, G,
                             m2p_cnt=m2p_cnt, p2p_cnt=p2p_cnt)
    am, pm = xla.eval_m2p(tgt_pos, m2p_pos, m2p_mass, eps, G,
                          src_quad=m2p_quad)
    ap, pp = xla.eval_p2p(tgt_pos, tgt_idx, p2p_pos, p2p_mass, p2p_idx,
                          eps, G)
    return am + ap, pm + pp

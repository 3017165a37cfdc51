"""Kernel backend dispatch (reference analog: the CPU-SIMD vs CUDA/HIP
backend choice behind rakau's heterogeneous dispatch, SURVEY.md C13-C15 —
here it picks the pure-XLA reference kernels or the Pallas TPU kernels)."""
from __future__ import annotations

import jax

from ..config import TreeConfig
from . import xla


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def eval_shared(cfg: TreeConfig, tgt_pos, tgt_idx, src_pos, src_mass,
                src_idx, mask, eps, G):
    """Shared-candidate evaluation (traversal2): sources common to the
    chunk's tiles, per-tile mask planes."""
    backend = cfg.kernel_backend
    if backend == "auto":
        backend = "pallas" if _on_tpu() else "xla"
    comp = cfg.accum == "compensated"
    if backend == "pallas":
        import os
        from . import pallas as pk
        fused = (os.environ.get("RAKAU_SHARED_FUSED", "1") != "0"
                 and src_pos.shape[0] <= pk.FUSED_VMEM_SRC_LIMIT)
        if fused:
            return pk.eval_shared_fused(tgt_pos, tgt_idx, src_pos,
                                        src_mass, src_idx, mask, eps, G,
                                        compensated=comp)
        return pk.eval_shared(tgt_pos, tgt_idx, src_pos, src_mass,
                              src_idx, mask, eps, G)
    return xla.eval_shared(tgt_pos, tgt_idx, src_pos, src_mass, src_idx,
                           mask, eps, G, compensated=comp)


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

"""Pallas TPU kernels for the pairwise force/potential inner loops.

This is the TPU "device backend" replacing the reference's CUDA/HIP
thread-per-target stack-traversal kernels and xsimd CPU loops
(SURVEY.md C8/C13/C14): the traversal has already produced dense padded
per-tile source arrays, so the kernel is a pure streaming pairwise
accumulation — target tile resident in VMEM, source blocks pipelined from
HBM, [T, B] weight panels on the VPU.

Design notes
------------
* Per-pair math uses direct per-component differences (Sterbenz-exact for
  close pairs); with D=3 the matmul re-association cannot beat the VPU
  (K=3 << 128 wastes the MXU), so the whole kernel is VPU-resident and
  the FLOP cost is ~16 VPU ops/pair including rsqrt.
* Per-tile interaction counts vary; the grid covers the static cap but a
  scalar-prefetched block count clamps the source-block index map (the
  pipeline skips refetch of an unchanged block) and `pl.when` skips the
  compute, so padding costs neither HBM bandwidth nor VPU cycles beyond
  one block.
* M2P and P2P share the kernel body; P2P additionally excludes the self
  pair by Morton index. Softening eps^2 arrives as an SMEM scalar.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


DEF_BLOCK = 512


def _kernel(nblk_ref, eps2_ref, tgt_pos_ref, tgt_idx_ref, src_pos_ref,
            src_mass_ref, src_idx_ref, acc_ref, pot_ref, *, ndim,
            use_idx):
    # Shapes: tgt_pos [1,T,D]; tgt_idx/pot [1,1,T]; src_pos [1,B,D];
    # src_mass/src_idx [1,1,B]; acc [1,T,D]. Per-tile vectors ride a
    # [C,1,X] layout so Mosaic's (8,128)-or-full block rule is satisfied.
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        pot_ref[...] = jnp.zeros_like(pot_ref)

    c = pl.program_id(0)

    @pl.when(j < nblk_ref[c])
    def _body():
        eps2 = eps2_ref[0]
        T = tgt_pos_ref.shape[1]
        B = src_pos_ref.shape[1]
        r2 = jnp.full((T, B), eps2, jnp.float32)
        dxs = []
        for d in range(ndim):
            td = tgt_pos_ref[0, :, d].reshape(T, 1)
            sd = src_pos_ref[0, :, d].reshape(1, B)
            dx = sd - td
            dxs.append(dx)
            r2 = r2 + dx * dx
        inv_r = jax.lax.rsqrt(r2)
        m = src_mass_ref[0, 0, :].reshape(1, B)
        if use_idx:
            ti = tgt_idx_ref[0, 0, :].reshape(T, 1)
            si = src_idx_ref[0, 0, :].reshape(1, B)
            dead = (si == ti) | (r2 <= 0.0)
        else:
            dead = r2 <= 0.0
        inv_r = jnp.where(dead, 0.0, inv_r)
        w = m * inv_r
        w3 = w * inv_r * inv_r
        pot_ref[0, 0, :] -= jnp.sum(w, axis=1)
        for d in range(ndim):
            acc_ref[0, :, d] += jnp.sum(w3 * dxs[d], axis=1)


def _pairwise(tgt_pos, tgt_idx, src_pos, src_mass, src_idx, eps, *,
              use_idx: bool, cnt=None, block: int = DEF_BLOCK,
              interpret: bool = False):
    """acc [C,T,D], pot [C,T] from dense padded sources (no G factor).

    cnt [C]: per-tile valid source count (sources are left-compacted by
    the traversal); blocks beyond it are skipped (no DMA, no compute)."""
    C, T, D = tgt_pos.shape
    S = src_pos.shape[1]
    block = min(block, S)
    nblk = -(-S // block)
    pad = nblk * block - S
    if pad:
        src_pos = jnp.pad(src_pos, ((0, 0), (0, pad), (0, 0)),
                          constant_values=1e30)
        src_mass = jnp.pad(src_mass, ((0, 0), (0, pad)))
        src_idx = jnp.pad(src_idx, ((0, 0), (0, pad)), constant_values=-1)

    if cnt is None:
        cnt = jnp.full((C,), S, jnp.int32)
    active = jnp.minimum(cnt.astype(jnp.int32), S)
    nblk_per_tile = ((jnp.maximum(active, 1) + block - 1)
                     // block).astype(jnp.int32)

    eps2 = jnp.asarray([jnp.asarray(eps, jnp.float32) ** 2], jnp.float32)

    # [C, 1, X] layout for per-tile vectors (Mosaic block-shape rule).
    tgt_idx3 = tgt_idx[:, None, :]
    src_mass3 = src_mass[:, None, :]
    src_idx3 = src_idx[:, None, :]

    def clampj(c, j, nblk_ref, _eps2_ref):
        return (c, jnp.minimum(j, nblk_ref[c] - 1), 0)

    def clampj3(c, j, nblk_ref, _eps2_ref):
        return (c, 0, jnp.minimum(j, nblk_ref[c] - 1))

    def at_c(c, j, _nblk_ref, _eps2_ref):
        return (c, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C, nblk),
        in_specs=[
            pl.BlockSpec((1, T, D), at_c),
            pl.BlockSpec((1, 1, T), at_c),
            pl.BlockSpec((1, block, D), clampj),
            pl.BlockSpec((1, 1, block), clampj3),
            pl.BlockSpec((1, 1, block), clampj3),
        ],
        out_specs=[
            pl.BlockSpec((1, T, D), at_c),
            pl.BlockSpec((1, 1, T), at_c),
        ],
    )

    kernel = functools.partial(_kernel, ndim=D, use_idx=use_idx)
    acc, pot = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((C, T, D), jnp.float32),
            jax.ShapeDtypeStruct((C, 1, T), jnp.float32),
        ],
        interpret=interpret,
    )(nblk_per_tile, eps2, tgt_pos, tgt_idx3, src_pos, src_mass3, src_idx3)
    return acc, pot[:, 0, :]


def eval_tiles(tgt_pos, tgt_idx, m2p_pos, m2p_mass, m2p_quad,
               p2p_pos, p2p_mass, p2p_idx, eps, G,
               m2p_cnt=None, p2p_cnt=None,
               block: int = DEF_BLOCK, interpret: bool = False):
    """Pallas counterpart of the XLA backend's eval (monopole M2P + P2P).

    Quadrupole M2P is not yet ported to Pallas; callers requesting
    multipole_order=2 are routed to the XLA backend by dispatch."""
    if m2p_quad is not None:
        raise NotImplementedError("pallas backend is monopole-only")
    dtype = tgt_pos.dtype
    am, pm = _pairwise(tgt_pos, tgt_idx, m2p_pos, m2p_mass,
                       jnp.full(m2p_mass.shape, -1, jnp.int32), eps,
                       use_idx=False, cnt=m2p_cnt, block=block,
                       interpret=interpret)
    ap, pp = _pairwise(tgt_pos, tgt_idx, p2p_pos, p2p_mass, p2p_idx, eps,
                       use_idx=True, cnt=p2p_cnt, block=block,
                       interpret=interpret)
    G = jnp.asarray(G, dtype)
    return G * (am + ap), G * (pm + pp)

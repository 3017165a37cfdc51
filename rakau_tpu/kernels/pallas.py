"""Pallas TPU kernels for the pairwise force/potential inner loops.

This is the TPU "device backend" replacing the reference's CUDA/HIP
thread-per-target stack-traversal kernels and xsimd CPU loops
(SURVEY.md C8/C13/C14): the traversal has already produced dense padded
per-tile source arrays, so the kernel is a pure streaming pairwise
accumulation — target tile resident in VMEM, source blocks pipelined from
HBM, [T, B] weight panels on the VPU.

Layout notes (learned the hard way on Mosaic):
* Coordinates are passed as PLANES: targets [C, T, 1] (sublane columns)
  and sources [C, 1, B] (lane rows), so dx = src - tgt is a native
  (T,1)x(1,B) VPU broadcast with no relayout. Packing xyz in a minor
  dim of size 3 forces Mosaic relayouts that spill hundreds of MB of
  vmem registers.
* Outputs are planes too: ax/ay/az/pot [C, T, 1], accumulated across the
  source-block grid dimension (same output block for all j).
* Per-pair math uses direct per-component differences (Sterbenz-exact
  for close pairs); with D=3 the matmul re-association cannot beat the
  VPU (K=3 << 128 wastes the MXU), so the kernel is VPU-resident at
  ~16 ops/pair including rsqrt.
* Per-tile interaction counts are scalar-prefetched: the source-block
  index map clamps to the last active block (the pipeline skips refetch
  of an unchanged block) and `pl.when` skips the compute, so padded caps
  cost neither HBM bandwidth nor VPU cycles beyond one block.
* M2P and P2P share the kernel body; P2P additionally excludes the self
  pair by Morton index (planes [C,T,1] vs [C,1,B]).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


DEF_BLOCK = 1024


def _kernel(nblk_ref, eps2_ref, *refs, ndim, use_idx):
    # refs: tgt planes [1,T,1] x ndim, (tgt_idx [1,T,1] if use_idx),
    #       src planes [1,1,B] x ndim, src_mass [1,1,B],
    #       (src_idx [1,1,B] if use_idx),
    #       outputs: acc planes [1,T,1] x ndim, pot [1,T,1]
    n_t = ndim + (1 if use_idx else 0)
    n_s = ndim + 1 + (1 if use_idx else 0)
    tgt_refs = refs[:n_t]
    src_refs = refs[n_t:n_t + n_s]
    out_refs = refs[n_t + n_s:]
    j = pl.program_id(1)
    c = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        for o in out_refs:
            o[...] = jnp.zeros_like(o)

    @pl.when(j < nblk_ref[c])
    def _body():
        eps2 = eps2_ref[0]
        dxs = []
        r2 = None
        for d in range(ndim):
            dx = src_refs[d][0] - tgt_refs[d][0]      # (1,B)-(T,1)->(T,B)
            dxs.append(dx)
            r2 = dx * dx if r2 is None else r2 + dx * dx
        r2 = r2 + eps2
        inv_r = jax.lax.rsqrt(r2)
        m = src_refs[ndim][0]                         # (1, B)
        if use_idx:
            ti = tgt_refs[ndim][0]                    # (T, 1) int32
            si = src_refs[ndim + 1][0]                # (1, B) int32
            dead = (si == ti) | (r2 <= 0.0)
        else:
            dead = r2 <= 0.0
        inv_r = jnp.where(dead, 0.0, inv_r)
        w = m * inv_r                                 # (T, B)
        w3 = w * inv_r * inv_r
        out_refs[ndim][0] += -jnp.sum(w, axis=1, keepdims=True)
        for d in range(ndim):
            out_refs[d][0] += jnp.sum(w3 * dxs[d], axis=1, keepdims=True)


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
    S = nblk * block

    if cnt is None:
        cnt = jnp.full((C,), S, jnp.int32)
    active = jnp.minimum(cnt.astype(jnp.int32), S)
    nblk_per_tile = ((jnp.maximum(active, 1) + block - 1)
                     // block).astype(jnp.int32)
    eps2 = jnp.asarray([jnp.asarray(eps, jnp.float32) ** 2], jnp.float32)

    # planar layouts
    tgt_planes = [tgt_pos[:, :, d:d + 1] for d in range(D)]      # [C,T,1]
    if use_idx:
        tgt_planes.append(tgt_idx[:, :, None])
    src_planes = [src_pos[:, None, :, d] for d in range(D)]      # [C,1,S]
    src_planes.append(src_mass[:, None, :])
    if use_idx:
        src_planes.append(src_idx[:, None, :])

    def tspec(_c=None):
        return pl.BlockSpec((1, T, 1), lambda c, j, nb, e: (c, 0, 0))

    def sspec():
        return pl.BlockSpec(
            (1, 1, block),
            lambda c, j, nb, e: (c, 0, jnp.minimum(j, nb[c] - 1)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C, nblk),
        in_specs=([tspec() for _ in tgt_planes]
                  + [sspec() for _ in src_planes]),
        out_specs=[tspec() for _ in range(D + 1)],
    )
    kernel = functools.partial(_kernel, ndim=D, use_idx=use_idx)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((C, T, 1), jnp.float32)
                   for _ in range(D + 1)],
        interpret=interpret,
    )(nblk_per_tile, eps2, *tgt_planes, *src_planes)
    acc = jnp.concatenate(outs[:D], axis=2)
    pot = outs[D][:, :, 0]
    return acc, pot


def _fused_kernel(nblk_ref, eps2_ref, *refs, ndim, block):
    """Grid is (C,): one step evaluates one whole tile against both its
    M2P and P2P source rows, looping over source blocks with a dynamic
    (count-derived) trip bound. Work per grid step is T*S pairs, which
    amortizes the per-step pipeline overhead that bounded the blocked
    variant to ~20 Gpairs/s.

    refs: tgt planes x ndim [1,T,1], tgt_idx [1,T,1],
          m2p planes x ndim [1,1,Sm], m2p_mass [1,1,Sm],
          p2p planes x ndim [1,1,Sp], p2p_mass [1,1,Sp], p2p_idx [1,1,Sp],
          outs: acc planes x ndim [1,T,1], pot [1,T,1].
    nblk_ref: [C, 2] int32 active blocks per (m2p, p2p)."""
    c = pl.program_id(0)
    n_t = ndim + 1
    tgt_refs = refs[:ndim]
    ti_ref = refs[ndim]
    m_refs = refs[n_t:n_t + ndim + 1]
    p_refs = refs[n_t + ndim + 1:n_t + 2 * ndim + 3]
    out_refs = refs[n_t + 2 * ndim + 3:]
    eps2 = eps2_ref[0]

    T = tgt_refs[0].shape[1]
    tcols = [r[0] for r in tgt_refs]                   # (T, 1)
    ti = ti_ref[0]                                     # (T, 1) int32

    acc = [jnp.zeros((T, 1), jnp.float32) for _ in range(ndim)]
    pot = jnp.zeros((T, 1), jnp.float32)

    def make_body(refs_s, use_idx):
        def body(j, carry):
            accs, pot = carry
            off = j * block
            srows = [refs_s[d][0, :, pl.ds(off, block)]
                     for d in range(ndim)]              # (1, B)
            m = refs_s[ndim][0, :, pl.ds(off, block)]
            dxs = []
            r2 = None
            for d in range(ndim):
                dx = srows[d] - tcols[d]
                dxs.append(dx)
                r2 = dx * dx if r2 is None else r2 + dx * dx
            r2 = r2 + eps2
            inv_r = jax.lax.rsqrt(r2)
            if use_idx:
                si = refs_s[ndim + 1][0, :, pl.ds(off, block)]
                dead = (si == ti) | (r2 <= 0.0)
            else:
                dead = r2 <= 0.0
            inv_r = jnp.where(dead, 0.0, inv_r)
            w = m * inv_r
            w3 = w * inv_r * inv_r
            pot = pot - jnp.sum(w, axis=1, keepdims=True)
            accs = [a + jnp.sum(w3 * dx, axis=1, keepdims=True)
                    for a, dx in zip(accs, dxs)]
            return accs, pot
        return body

    acc, pot = jax.lax.fori_loop(0, nblk_ref[c, 0],
                                 make_body(m_refs, False), (acc, pot))
    acc, pot = jax.lax.fori_loop(0, nblk_ref[c, 1],
                                 make_body(p_refs, True), (acc, pot))
    for d in range(ndim):
        out_refs[d][0] = acc[d]
    out_refs[ndim][0] = pot


def eval_tiles_fused(tgt_pos, tgt_idx, m2p_pos, m2p_mass,
                     p2p_pos, p2p_mass, p2p_idx, eps, G,
                     m2p_cnt=None, p2p_cnt=None,
                     block: int = DEF_BLOCK, interpret: bool = False):
    """One pallas launch per chunk: both source classes, whole rows
    VMEM-resident, count-bounded inner loops."""
    C, T, D = tgt_pos.shape
    block = min(block, m2p_pos.shape[1], p2p_pos.shape[1])

    def prep(src_pos, src_mass, cnt, src_idx=None):
        S = src_pos.shape[1]
        b = block
        nb = -(-S // b)
        pad = nb * b - S
        if pad:
            src_pos = jnp.pad(src_pos, ((0, 0), (0, pad), (0, 0)),
                              constant_values=1e30)
            src_mass = jnp.pad(src_mass, ((0, 0), (0, pad)))
            if src_idx is not None:
                src_idx = jnp.pad(src_idx, ((0, 0), (0, pad)),
                                  constant_values=-1)
        S = nb * b
        if cnt is None:
            cnt = jnp.full((C,), S, jnp.int32)
        nblk = ((jnp.clip(cnt, 0, S) + b - 1) // b).astype(jnp.int32)
        planes = [src_pos[:, None, :, d] for d in range(D)]
        planes.append(src_mass[:, None, :])
        if src_idx is not None:
            planes.append(src_idx[:, None, :])
        return planes, nblk, S, b

    m_planes, m_nblk, Sm, bm = prep(m2p_pos, m2p_mass, m2p_cnt)
    p_planes, p_nblk, Sp, bp = prep(p2p_pos, p2p_mass, p2p_cnt, p2p_idx)
    assert bm == bp, "m2p/p2p must share a block size"
    nblk2 = jnp.stack([m_nblk, p_nblk], axis=1)
    eps2 = jnp.asarray([jnp.asarray(eps, jnp.float32) ** 2], jnp.float32)

    tgt_planes = [tgt_pos[:, :, d:d + 1] for d in range(D)]
    tgt_planes.append(tgt_idx[:, :, None])

    def tspec():
        return pl.BlockSpec((1, T, 1), lambda c, nb, e: (c, 0, 0))

    def sspec(S):
        return pl.BlockSpec((1, 1, S), lambda c, nb, e: (c, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=([tspec() for _ in tgt_planes]
                  + [sspec(Sm) for _ in m_planes]
                  + [sspec(Sp) for _ in p_planes]),
        out_specs=[tspec() for _ in range(D + 1)],
    )
    kernel = functools.partial(_fused_kernel, ndim=D, block=bm)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((C, T, 1), jnp.float32)
                   for _ in range(D + 1)],
        interpret=interpret,
    )(nblk2, eps2, *tgt_planes, *m_planes, *p_planes)
    acc = jnp.concatenate(outs[:D], axis=2)
    pot = outs[D][:, :, 0]
    G = jnp.asarray(G, tgt_pos.dtype)
    return G * acc, G * pot


def _shared_kernel(blk_ref, eps2_ref, *refs, ndim):
    """Shared-candidate kernel: grid (C, NB). Source-block planes are
    common to every tile; the per-tile mask block weights contributions;
    fully-masked (tile, block) pairs skip compute via pl.when. Fat blocks
    amortize the ~25-60 us Mosaic per-step overhead.

    refs: tgt planes x ndim + tgt_idx   [1,T,1],
          src planes x ndim + mass + idx [1,1,B] (shared block),
          mask [1,1,B] f32 per (tile, block),
          outs: acc planes x ndim + pot [1,T,1] (accumulated over NB).
    blk_ref: [C, NB] int32 (nonzero = block active for this tile)."""
    c = pl.program_id(0)
    j = pl.program_id(1)
    n_t = ndim + 1
    tgt_refs = refs[:ndim]
    ti_ref = refs[ndim]
    src_refs = refs[n_t:n_t + ndim + 2]
    mask_ref = refs[n_t + ndim + 2]
    out_refs = refs[n_t + ndim + 3:]
    eps2 = eps2_ref[0]

    @pl.when(j == 0)
    def _init():
        for o in out_refs:
            o[...] = jnp.zeros_like(o)

    @pl.when(blk_ref[c, j] > 0)
    def _body():
        tcols = [r[0] for r in tgt_refs]
        ti = ti_ref[0]
        srows = [src_refs[d][0] for d in range(ndim)]   # (1, B)
        m = src_refs[ndim][0]
        si = src_refs[ndim + 1][0]
        mk = mask_ref[0]
        dxs = []
        r2 = None
        for d in range(ndim):
            dx = srows[d] - tcols[d]
            dxs.append(dx)
            r2 = dx * dx if r2 is None else r2 + dx * dx
        r2 = r2 + eps2
        inv_r = jax.lax.rsqrt(r2)
        dead = (si == ti) | (r2 <= 0.0)
        inv_r = jnp.where(dead, 0.0, inv_r)
        w = (m * mk) * inv_r
        w3 = w * inv_r * inv_r
        out_refs[ndim][0] += -jnp.sum(w, axis=1, keepdims=True)
        for d in range(ndim):
            out_refs[d][0] += jnp.sum(w3 * dxs[d], axis=1, keepdims=True)


def eval_shared(tgt_pos, tgt_idx, src_pos, src_mass, src_idx, mask,
                eps, G, block: int = None, interpret: bool = False):
    """Pallas shared-candidate evaluation (see _shared_kernel)."""
    import os
    if block is None:
        block = int(os.environ.get("RAKAU_PALLAS_BLOCK", 1024))
    C, T, D = tgt_pos.shape
    S0 = src_pos.shape[0]
    block = min(block, S0)
    nb = -(-S0 // block)
    pad = nb * block - S0
    S = nb * block
    if pad:
        src_pos = jnp.pad(src_pos, ((0, pad), (0, 0)),
                          constant_values=1e30)
        src_mass = jnp.pad(src_mass, (0, pad))
        src_idx = jnp.pad(src_idx, (0, pad), constant_values=-1)
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    maskf = mask.astype(jnp.float32)
    blk_active = (maskf.reshape(C, nb, block).sum(axis=2) > 0).astype(
        jnp.int32)
    eps2 = jnp.asarray([jnp.asarray(eps, jnp.float32) ** 2], jnp.float32)

    tgt_planes = [tgt_pos[:, :, d:d + 1] for d in range(D)]
    tgt_planes.append(tgt_idx[:, :, None])
    src_planes = [src_pos[:, d].reshape(1, 1, S) for d in range(D)]
    src_planes.append(src_mass.reshape(1, 1, S))
    src_planes.append(src_idx.reshape(1, 1, S))
    mask3 = maskf[:, None, :]

    def tspec():
        return pl.BlockSpec((1, T, 1), lambda c, j, b, e: (c, 0, 0))

    def shared_spec():
        return pl.BlockSpec((1, 1, block), lambda c, j, b, e: (0, 0, j))

    def mspec():
        return pl.BlockSpec((1, 1, block), lambda c, j, b, e: (c, 0, j))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C, nb),
        in_specs=([tspec() for _ in tgt_planes]
                  + [shared_spec() for _ in src_planes]
                  + [mspec()]),
        out_specs=[tspec() for _ in range(D + 1)],
    )
    kernel = functools.partial(_shared_kernel, ndim=D)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((C, T, 1), jnp.float32)
                   for _ in range(D + 1)],
        interpret=interpret,
    )(blk_active, eps2, *tgt_planes, *src_planes, mask3)
    acc = jnp.concatenate(outs[:D], axis=2)
    pot = outs[D][:, :, 0]
    G = jnp.asarray(G, tgt_pos.dtype)
    return G * acc, G * pot


def _shared_fused_kernel_mxu(ids_ref, cnt_ref, eps2_ref, *refs, ndim,
                             block, subblock=0, mode="both", grid_sep=0,
                             cell_bits=0, y_prec="x3"):
    """MXU variant of _shared_fused_kernel (mono, non-compensated).

    Two reformulations move the pairwise FLOPs from the VPU to the MXU
    (VERDICT r3 item 6 — the VPU roof of ~131 Gpairs/s caps the fused
    kernel; the MXU is the only 10x-class unit on the chip):

      r^2 by the norm trick in TILE-LOCAL coordinates:
          r^2 = |t'|^2 + |s'|^2 - 2 t'.s',   t' = t - c,  s' = s - c
      with c the tile's first target, and the cross term one [T,D]x[D,B]
      matmul (K=D, negligible MXU time). Local coordinates bound the
      cancellation: the absolute error is ~2^-24 (|t'|^2+|s'|^2), so the
      relative r^2 error is ~2^-24 ((|t'|+r)^2+|t'|^2)/r^2 — order eps
      for pairs at tile scale and beyond, growing to ~1e-4 only for
      pairs at r ~ tile_radius/2^10 (far below the mean interparticle
      distance). This is the FAST kernel for the standard per-theta
      envelope; accuracy-ladder configs keep the exact-dx VPU kernel.

      acceleration accumulation as ONE [T,B]x[B,D] matmul per block:
          acc_i = sum_j w3_ij (s'_j - t'_i) = (W3 X)_i - (sum_j W3_ij) t'_i
      so the per-pair VPU work drops from ~19 ops (dx, r^2, w3*dx sums)
      to ~13 (r^2 assembly, rsqrt, weights, two row-sums); the D
      reduction columns ride the MXU (padded to 128 lanes — the padding
      is the price, ~256 flop-equivalents/pair/pass).

    Self/coincident pairs: excluded by a relative threshold
    r^2_true <= 2^-21 (|t'|^2+|s'|^2) instead of index comparison (the
    norm-trick noise floor swallows exact zeros; the threshold also
    keeps rsqrt off negative rounding noise). The idx planes still ride
    along (same call signature) but are not read.

    y_prec: MXU precision of the W3 matmul — "bf16" (operands cast to
    bf16, one MXU pass, ~0.4% per-pair noise -> ~1e-4-class RMS after
    random accumulation), "x3" (manual 3-pass bf16 splitting, ~fp32
    quality; Mosaic has no Precision.HIGH), "default" (whatever Mosaic
    does for f32 inputs) or "highest" (6-pass)."""
    import jax.lax as lax
    c = pl.program_id(0)
    n_cell = 1 if grid_sep else 0
    tgt_refs = refs[:ndim]
    tc_refs = refs[ndim + 1:ndim + 1 + n_cell]
    base = ndim + 1 + n_cell
    src_refs = refs[base:base + ndim + 2]
    base2 = base + ndim + 2
    sc_refs = refs[base2:base2 + n_cell]
    mask_ref = refs[base2 + n_cell]
    out_refs = refs[base2 + n_cell + 1:]
    eps2 = eps2_ref[0]
    dims = (((1,), (0,)), ((), ()))

    def ydot(A, B):
        """(T, B) x (B, D) at the requested effective precision."""
        if y_prec == "bf16":
            return lax.dot_general(
                A.astype(jnp.bfloat16), B.astype(jnp.bfloat16), dims,
                preferred_element_type=jnp.float32,
                precision=lax.Precision.DEFAULT)
        if y_prec == "x3":
            Ah = A.astype(jnp.bfloat16)
            Bh = B.astype(jnp.bfloat16)
            Al = (A - Ah.astype(jnp.float32)).astype(jnp.bfloat16)
            Bl = (B - Bh.astype(jnp.float32)).astype(jnp.bfloat16)
            kw = dict(preferred_element_type=jnp.float32,
                      precision=lax.Precision.DEFAULT)
            return (lax.dot_general(Ah, Bl, dims, **kw)
                    + lax.dot_general(Al, Bh, dims, **kw)
                    + lax.dot_general(Ah, Bh, dims, **kw))
        prec = {"default": lax.Precision.DEFAULT,
                "highest": lax.Precision.HIGHEST}[y_prec]
        return lax.dot_general(A, B, dims,
                               preferred_element_type=jnp.float32,
                               precision=prec)

    def unpack_cells(p):
        Gc = float(1 << cell_bits)
        invG = 1.0 / Gc
        q = jnp.maximum(p, 0.0)
        coords = []
        for _ in range(ndim - 1):
            qn = jnp.floor(q * invG)
            coords.append(q - qn * Gc)
            q = qn
        coords.append(q)
        return coords[::-1]

    T = tgt_refs[0].shape[1]
    tcols = [r[0] for r in tgt_refs]                    # (T, 1)
    cref = [tc[0:1] for tc in tcols]                    # (1, 1)
    tp = [tc - cr for tc, cr in zip(tcols, cref)]       # (T, 1)
    tmat = jnp.concatenate(tp, axis=1)                  # (T, D)
    tts = None
    for t_ in tp:
        tts = t_ * t_ if tts is None else tts + t_ * t_  # (T, 1)
    tccols = unpack_cells(tc_refs[0][0]) if grid_sep else []

    def body(k, carry):
        y, ysum, pot = carry
        if subblock:
            nsub = block // subblock

            def asm(ref):
                parts = []
                for j in range(nsub):
                    off = pl.multiple_of(
                        ids_ref[c, k * nsub + j] * subblock, subblock)
                    parts.append(ref[0, :, pl.ds(off, subblock)])
                return jnp.concatenate(parts, axis=-1)

            srows = [asm(src_refs[d]) for d in range(ndim)]
            m = asm(src_refs[ndim])
            mk = asm(mask_ref)
            scp = asm(sc_refs[0]) if grid_sep else None
        else:
            off = pl.multiple_of(ids_ref[c, k] * block, block)
            srows = [src_refs[d][0, :, pl.ds(off, block)]
                     for d in range(ndim)]              # (1, B)
            m = src_refs[ndim][0, :, pl.ds(off, block)]
            mk = mask_ref[0, :, pl.ds(off, block)]
            scp = (sc_refs[0][0, :, pl.ds(off, block)] if grid_sep
                   else None)
        sp = [srows[d] - cref[d] for d in range(ndim)]  # (1, B)
        ss = None
        for s_ in sp:
            ss = s_ * s_ if ss is None else ss + s_ * s_
        smat = jnp.concatenate(sp, axis=0)              # (D, B)
        dot = lax.dot_general(
            tmat, smat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)            # (T, B)
        r2n = (tts - 2.0 * dot) + ss                    # true r^2 + noise
        scale = tts + ss
        dead = r2n <= 2.0 ** -21 * scale
        if grid_sep:
            scrows = unpack_cells(scp)
            covered = scp >= 0.0
            for d in range(ndim):
                covered = covered & (jnp.abs(scrows[d] - tccols[d])
                                     < grid_sep)
            dead = dead | (~covered & (scp >= 0.0))
        inv_r = jax.lax.rsqrt(r2n + eps2)
        inv_r = jnp.where(dead, 0.0, inv_r)
        w = (m * mk) * inv_r                            # (T, B)
        if mode in ("both", "acc"):
            w3 = w * (inv_r * inv_r)
            xmat = smat.T                               # (B, D) relayout
            y = y + ydot(w3, xmat)
            ysum = ysum + jnp.sum(w3, axis=1, keepdims=True)
        if mode in ("both", "pot"):
            pot = pot - jnp.sum(w, axis=1, keepdims=True)
        return y, ysum, pot

    y0 = jnp.zeros((T, ndim), jnp.float32)
    ysum0 = jnp.zeros((T, 1), jnp.float32)
    pot0 = jnp.zeros((T, 1), jnp.float32)
    y, ysum, pot = jax.lax.fori_loop(0, cnt_ref[c], body,
                                     (y0, ysum0, pot0))
    for d in range(ndim):
        out_refs[d][0] = y[:, d:d + 1] - ysum * tp[d]
    out_refs[ndim][0] = pot


def _two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (compensated accumulation)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _shared_fused_kernel(ids_ref, cnt_ref, eps2_ref, *refs, ndim, block,
                         compensated=False, subblock=0, mode="both",
                         grid_sep=0, cell_bits=0, quad=0):
    """Fused shared-candidate kernel: grid (C,) — one step per tile.

    The whole shared source row stays VMEM-resident across the grid
    (constant index map -> Mosaic skips the refetch), and each tile loops
    over a COMPACTED list of its active source blocks (scalar-prefetched
    ids/counts), so dead blocks cost nothing — neither pipeline steps
    (the ~25-60us/step floor that bounded the blocked variant) nor VPU
    work. Per-tile masks ride along as one f32 row and fold into the
    source masses.

    With `subblock` > 0 the id list is at subblock granularity and each
    compute step assembles block//subblock dynamic lane slices into one
    dense (T, block) panel — active sources are scattered through the
    shared row (a union row serves only a few of the C tiles), so the
    finer selection raises in-step density ~2-3x at full step width.
    Padding ids may point at any subblock whose mask row is zero.

    refs: tgt planes x ndim + tgt_idx  [1,T,1]
          (+ ONE packed tgt cell plane [1,T,1] f32 when grid_sep > 0),
          src planes x ndim + mass + idx [1,1,S] (whole row)
          (+ `quad` second-moment planes [1,1,S] when quad > 0)
          (+ ONE packed src cell plane [1,1,S] f32 when grid_sep > 0),
          mask [1,1,S] (per tile),
          outs: acc planes x ndim + pot [1,T,1].

    quad > 0 (= ndim*(ndim+1)//2): the source rows are multipole nodes;
    adds the quadrupole correction from their raw second moments with
    the same per-pair dead/mask gating as the monopole term.

    grid_sep > 0 enables the per-pair leaf-grid coverage mask (grid2):
    a pair is dead iff its Chebyshev cell separation >= grid_sep
    (covered by the dense far field). Cell coords ride PACKED in a
    single f32 plane per side (`cell_bits` bits per dim, value < 2^24
    so integer-exact in f32; unpacked in-kernel with exact power-of-two
    arithmetic) — one plane instead of ndim keeps the VMEM-resident
    source row small. Packed cell < 0 marks rows exempt from the test
    (LET imports, padding)."""
    c = pl.program_id(0)
    n_cell = 1 if grid_sep else 0
    tgt_refs = refs[:ndim]
    ti_ref = refs[ndim]
    tc_refs = refs[ndim + 1:ndim + 1 + n_cell]
    base = ndim + 1 + n_cell
    src_refs = refs[base:base + ndim + 2]
    sq_refs = refs[base + ndim + 2:base + ndim + 2 + quad]
    base2 = base + ndim + 2 + quad
    sc_refs = refs[base2:base2 + n_cell]
    mask_ref = refs[base2 + n_cell]
    out_refs = refs[base2 + n_cell + 1:]
    eps2 = eps2_ref[0]

    def unpack_cells(p):
        """Packed f32 cell -> ndim f32 coords (exact: all values and
        the 2^cell_bits quotients/remainders are < 2^24 integers)."""
        Gc = float(1 << cell_bits)
        invG = 1.0 / Gc
        q = jnp.maximum(p, 0.0)
        coords = []
        for _ in range(ndim - 1):
            qn = jnp.floor(q * invG)
            coords.append(q - qn * Gc)    # last dim first
            q = qn
        coords.append(q)
        return coords[::-1]

    T = tgt_refs[0].shape[1]
    tcols = [r[0] for r in tgt_refs]                    # (T, 1)
    ti = ti_ref[0]                                      # (T, 1) i32
    tccols = unpack_cells(tc_refs[0][0]) if grid_sep else []

    def body(k, carry):
        accs, pot, comp = carry
        if subblock:
            nsub = block // subblock

            def asm(ref):
                parts = []
                for j in range(nsub):
                    off = pl.multiple_of(
                        ids_ref[c, k * nsub + j] * subblock, subblock)
                    parts.append(ref[0, :, pl.ds(off, subblock)])
                return jnp.concatenate(parts, axis=-1)  # (1, block)

            srows = [asm(src_refs[d]) for d in range(ndim)]
            m = asm(src_refs[ndim])
            si = asm(src_refs[ndim + 1])
            mk = asm(mask_ref)
            scp = asm(sc_refs[0]) if grid_sep else None
            qrows = [asm(r) for r in sq_refs]
        else:
            off = pl.multiple_of(ids_ref[c, k] * block, block)
            srows = [src_refs[d][0, :, pl.ds(off, block)]
                     for d in range(ndim)]              # (1, B)
            m = src_refs[ndim][0, :, pl.ds(off, block)]
            si = src_refs[ndim + 1][0, :, pl.ds(off, block)]
            mk = mask_ref[0, :, pl.ds(off, block)]
            scp = (sc_refs[0][0, :, pl.ds(off, block)] if grid_sep
                   else None)
            qrows = [r[0, :, pl.ds(off, block)] for r in sq_refs]
        dxs = []
        r2 = None
        for d in range(ndim):
            dx = srows[d] - tcols[d]                    # (T, B)
            dxs.append(dx)
            r2 = dx * dx if r2 is None else r2 + dx * dx
        r2 = r2 + eps2
        inv_r = jax.lax.rsqrt(r2)
        dead = (si == ti) | (r2 <= 0.0)
        if grid_sep:
            scrows = unpack_cells(scp)                  # ndim x (1, B)
            covered = scp >= 0.0                        # (1, B)
            for d in range(ndim):
                covered = covered & (jnp.abs(scrows[d] - tccols[d])
                                     < grid_sep)        # (T, B)
            # covered-at-range means NOT stencil-covered: invert sense —
            # a pair is in the dense far field iff some dim sep >= S
            dead = dead | (~covered & (scp >= 0.0))
        if quad:
            # masked-out union pairs can sit arbitrarily close to a
            # target (a core target inside another tile's node): their
            # inv_r^7 overflows fp32 to inf and the mask gate then
            # computes mk * inf = 0 * inf = NaN (the r4 "shared+quad
            # TPU NaN at 1M, clean at 65k" — dense cores only). Fold
            # the mask into the dead gate so every power chain starts
            # from an exact zero, like the monopole w-chain does.
            dead = dead | (mk <= 0.0)
        inv_r = jnp.where(dead, 0.0, inv_r)
        w = (m * mk) * inv_r
        if quad:
            # quadrupole correction from raw second moments (pair
            # vector dxs = src - tgt, the negative of the t - s frame,
            # so odd-order terms flip sign; see xla.eval_shared).
            inv2 = inv_r * inv_r
            inv3 = inv2 * inv_r
            inv5 = inv3 * inv2
            pairs = [(a, b) for a in range(ndim) for b in range(a, ndim)]
            trq = None
            dqd = None
            qdx = [None] * ndim
            for ci, (a, b) in enumerate(pairs):
                qc = qrows[ci]                           # (1, B)
                coef = 1.0 if a == b else 2.0
                t = coef * qc * dxs[a] * dxs[b]          # (T, B)
                dqd = t if dqd is None else dqd + t
                if a == b:
                    trq = qc if trq is None else trq + qc
                    qdx[a] = (qc * dxs[b] if qdx[a] is None
                              else qdx[a] + qc * dxs[b])
                else:
                    qdx[a] = (qc * dxs[b] if qdx[a] is None
                              else qdx[a] + qc * dxs[b])
                    qdx[b] = (qc * dxs[a] if qdx[b] is None
                              else qdx[b] + qc * dxs[a])
        # mode specialization: accs-only skips the potential reduction,
        # pots-only skips w3 and the ndim acceleration reductions
        # (reference parity gap "pots_u computes both and discards",
        # VERDICT r1 item 9).
        parts = []
        if mode in ("both", "acc"):
            w3 = w * inv_r * inv_r
            if quad:
                inv7 = inv5 * inv2
                f5 = mk * inv5
                f7 = mk * dqd * inv7
                parts += [jnp.sum(w3 * dx - 3.0 * qdx[d] * f5
                                  - 1.5 * trq * dx * f5 + 7.5 * dx * f7,
                                  axis=1, keepdims=True)
                          for d, dx in enumerate(dxs)]
            else:
                parts += [jnp.sum(w3 * dx, axis=1, keepdims=True)
                          for dx in dxs]
        else:
            parts += [None] * ndim
        if mode in ("both", "pot"):
            if quad:
                parts.append(-jnp.sum(
                    w + mk * (1.5 * dqd * inv5 - 0.5 * trq * inv3),
                    axis=1, keepdims=True))
            else:
                parts.append(-jnp.sum(w, axis=1, keepdims=True))
        else:
            parts.append(None)
        if compensated:
            new = []
            for i, (a, p) in enumerate(zip(accs + [pot], parts)):
                if p is None:
                    new.append(a)
                    continue
                s, e = _two_sum(a, p)
                comp[i] = comp[i] + e
                new.append(s)
            return new[:ndim], new[ndim], comp
        accs = [a if p is None else a + p
                for a, p in zip(accs, parts[:ndim])]
        pot = pot if parts[ndim] is None else pot + parts[ndim]
        return accs, pot, comp

    acc0 = [jnp.zeros((T, 1), jnp.float32) for _ in range(ndim)]
    pot0 = jnp.zeros((T, 1), jnp.float32)
    comp0 = [jnp.zeros((T, 1), jnp.float32) for _ in range(ndim + 1)]
    accs, pot, comp = jax.lax.fori_loop(0, cnt_ref[c], body,
                                        (acc0, pot0, comp0))
    for d in range(ndim):
        out_refs[d][0] = accs[d] + comp[d] if compensated else accs[d]
    out_refs[ndim][0] = pot + comp[ndim] if compensated else pot


# The fused kernel holds the full shared source row (ndim+2 f32 planes) in
# VMEM plus a double-buffered mask row (~56-80 B/entry with Mosaic's
# double-buffered row DMAs) against the fused_vmem_budget() (100 MB of
# the v5e core's 128 MB VMEM; XLA's default scoped accounting of 16 MB
# is overridden per-kernel via CompilerParams.vmem_limit_bytes).
FUSED_VMEM_SRC_LIMIT = 524_288  # source entries


def fused_vmem_budget() -> int:
    """Per-kernel VMEM budget (bytes) handed to the Mosaic compiler.

    XLA's default *scoped* VMEM accounting caps every custom call at
    16 MB, but the v5e core has 128 MB of VMEM — the fused kernel's
    source rows were being segmented (and its block size halved) around
    an artificial limit. pltpu.CompilerParams(vmem_limit_bytes=...)
    raises the budget for this kernel alone. 100 MB leaves headroom for
    XLA-side buffers sharing the core. RAKAU_PALLAS_VMEM_MB overrides."""
    import os
    return int(os.environ.get("RAKAU_PALLAS_VMEM_MB", 100)) * 1024 * 1024


def fused_vmem_src_limit(grid_sep: int = 0, has_quad: bool = False) -> int:
    """Max source-row entries the fused kernel holds in VMEM at once.

    With fused_vmem_budget() = 100 MB (vs XLA's default 16 MB scoped
    accounting, which forced 64k-row segments and halved blocks all
    through round 2), measured on v5e 2026-08-19: grid2 mono S=524288
    block 2048 compiles and runs at 88 Gpairs/s (benchmarks/
    vmem_probe.py). Budget model at block 2048, T=512: rows ~56 B
    (double-buffered f32 planes: D pos + mass + idx + packed cell),
    +24 B with quad planes, + live (T, block) panels ~20 MB (+~25 MB
    quad). 524288 rows * 80 B + 45 MB = 87 MB fits; leave quad a
    margin. dispatch.eval_shared segments oversize rows — a
    conservative limit costs extra launches, never a wrong answer."""
    if has_quad:
        return 320_000
    return FUSED_VMEM_SRC_LIMIT


def fused_block_default(grid_sep: int = 0, has_quad: bool = False) -> int:
    """Default source-block width of the fused shared kernel.

    SINGLE SOURCE for this arithmetic — metrics.collect_shared_density
    mirrors the kernel's block compaction and must agree (a 512/256
    divergence made quadrupole density figures wrong, VERDICT r2).

    Measured roofs (v5e, benchmarks/vmem_probe.py under the 100 MB
    fused_vmem_budget, 2026-08-19, S=262144/524288): plain mono
    124.5/131.5-138.0/122.3-128.6/96.2 Gpairs/s at block
    1024/2048/4096/8192; grid2 mono 80.0/85.4-88.2/77.1-79.6/62.7 —
    block 2048 is the sweet spot for both (bigger panels lose to VMEM
    pressure, smaller to per-step overhead). Quadrupole adds ~6 live
    (T, B) panels (qdx/dqd/f5/f7), so quad launches halve the block.
    RAKAU_PALLAS_BLOCK overrides everything."""
    import os
    dflt = 1024 if has_quad else 2048
    return int(os.environ.get("RAKAU_PALLAS_BLOCK", dflt))


def fused_block_plan(S0: int, grid_sep: int = 0, has_quad: bool = False,
                     block: int = None, subblock: int = None):
    """Resolve (block, subblock, S_padded, ng, gran) exactly as
    eval_shared_fused will — exported so density accounting replays the
    kernel's compaction arithmetic without duplicating it."""
    import os
    if block is None:
        block = fused_block_default(grid_sep, has_quad)
    if subblock is None:
        subblock = int(os.environ.get("RAKAU_PALLAS_SUBBLOCK", 0))
    block = min(block, max(128, S0))
    if subblock >= block or (subblock and block % subblock):
        subblock = 0
    want = S0 + (subblock if subblock else 0)
    nb = -(-want // block)
    S = nb * block
    gran = subblock if subblock else block
    return block, subblock, S, S // gran, gran


def eval_shared_fused(tgt_pos, tgt_idx, src_pos, src_mass, src_idx, mask,
                      eps, G, block: int = None, interpret: bool = False,
                      compensated: bool = False, subblock: int = None,
                      mode: str = "both", src_cell=None, tgt_cell=None,
                      grid_sep: int = 0, src_quad=None):
    """Fused shared-candidate evaluation (see _shared_fused_kernel).

    src_cell [S, D] / tgt_cell [C, T, D] int cells enable the per-pair
    grid2 coverage mask (dead iff Chebyshev cell sep >= grid_sep); the
    D coords pack into ONE f32 plane per side (cell_bits per dim, < 2^24
    so exact; exempt rows, src_cell[:, 0] < 0, pack to -1). grid2 also
    defaults to block 512: the coverage test adds live (T, B) panels to
    the Mosaic stack and the source rows are short, so smaller panels
    beat per-step overhead (1024-block grid2 overflows scoped VMEM at
    p2p_src_cap ~128k)."""
    if src_cell is None:
        grid_sep = 0
    C, T, D = tgt_pos.shape
    cell_bits = {1: 21, 2: 10, 3: 7}[D]

    def pack_cells(cells):
        """[..., D] int -> packed f32 (dim 0 highest); exempt rows
        (coord 0 < 0) -> -1."""
        p = cells[..., 0]
        for d in range(1, D):
            p = p * (1 << cell_bits) + jnp.maximum(cells[..., d], 0)
        return jnp.where(cells[..., 0] < 0, -1, p).astype(jnp.float32)
    S0 = src_pos.shape[0]
    # with subblock selection, the plan guarantees at least one fully-dead
    # subblock (padding ids point there)
    block, subblock, S, ng, gran = fused_block_plan(
        S0, grid_sep, src_quad is not None, block, subblock)
    pad = S - S0
    if pad:
        src_pos = jnp.pad(src_pos, ((0, pad), (0, 0)),
                          constant_values=1e30)
        src_mass = jnp.pad(src_mass, (0, pad))
        src_idx = jnp.pad(src_idx, (0, pad), constant_values=-1)
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        if grid_sep:
            src_cell = jnp.pad(src_cell, ((0, pad), (0, 0)),
                               constant_values=-1)
        if src_quad is not None:
            src_quad = jnp.pad(src_quad, ((0, pad), (0, 0)))
    maskf = mask.astype(jnp.float32)
    from .. import scan_utils as su
    blk_any = maskf.reshape(C, ng, gran).sum(axis=2) > 0      # [C, ng]
    ids, cnt = su.compact_indices(blk_any, ng)                # [C, ng], [C]
    # padding entries -> the last subblock, which is all-padding (dead)
    ids = jnp.minimum(ids, ng - 1).astype(jnp.int32)
    if subblock:
        nsub = block // subblock
        cnt = -(-cnt // nsub)                                 # steps
    cnt = cnt.astype(jnp.int32)
    eps2 = jnp.asarray([jnp.asarray(eps, jnp.float32) ** 2], jnp.float32)

    tgt_planes = [tgt_pos[:, :, d:d + 1] for d in range(D)]
    tgt_planes.append(tgt_idx[:, :, None])
    if grid_sep:
        tgt_planes.append(pack_cells(tgt_cell)[:, :, None])
    src_planes = [src_pos[:, d].reshape(1, 1, S) for d in range(D)]
    src_planes.append(src_mass.reshape(1, 1, S))
    src_planes.append(src_idx.reshape(1, 1, S))
    qdim = 0
    if src_quad is not None:
        qdim = src_quad.shape[1]
        src_planes += [src_quad[:, i].reshape(1, 1, S)
                       for i in range(qdim)]
    if grid_sep:
        src_planes.append(pack_cells(src_cell).reshape(1, 1, S))
    mask3 = maskf[:, None, :]

    def tspec():
        return pl.BlockSpec((1, T, 1), lambda c, i, n, e: (c, 0, 0))

    def shared_spec():
        return pl.BlockSpec((1, 1, S), lambda c, i, n, e: (0, 0, 0))

    def mspec():
        return pl.BlockSpec((1, 1, S), lambda c, i, n, e: (c, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(C,),
        in_specs=([tspec() for _ in tgt_planes]
                  + [shared_spec() for _ in src_planes]
                  + [mspec()]),
        out_specs=[tspec() for _ in range(D + 1)],
    )
    import os as _os
    use_mxu = (_os.environ.get("RAKAU_PALLAS_MXU", "0") == "1"
               and qdim == 0 and not compensated)
    if use_mxu:
        kernel = functools.partial(
            _shared_fused_kernel_mxu, ndim=D, block=block,
            subblock=subblock, mode=mode, grid_sep=grid_sep,
            cell_bits=cell_bits,
            y_prec=_os.environ.get("RAKAU_MXU_PREC", "x3"))
    else:
        kernel = functools.partial(
            _shared_fused_kernel, ndim=D, block=block,
            compensated=compensated, subblock=subblock,
            mode=mode, grid_sep=grid_sep,
            cell_bits=cell_bits, quad=qdim)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((C, T, 1), jnp.float32)
                   for _ in range(D + 1)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=fused_vmem_budget()),
    )(ids, cnt, eps2, *tgt_planes, *src_planes, mask3)
    acc = jnp.concatenate(outs[:D], axis=2)
    pot = outs[D][:, :, 0]
    G = jnp.asarray(G, tgt_pos.dtype)
    return G * acc, G * pot


def _pool_kernel(sched_ref, eps2_ref, *refs, ndim, block, compensated,
                 mode, quad, group=1):
    """gwalk pool kernel: grid (G,) — one step per target tile, fed by
    the block-aligned per-tile source pool (traversal4.build_pool).

    No mask plane and no per-chunk anything: tile g's sources are the
    contiguous pool blocks [start, start + m_nblk + p_nblk) inside its
    window (density ~1 by construction — the structural fix for the
    shared-mask engine's 12% kernel density, PLAN r4 s2). Windows are
    VMEM-resident [1, 1, W] blocks of the pool indexed by the scalar-
    prefetched window id; consecutive tiles share a window, so Mosaic
    skips the refetch on an unchanged index.

    sched_ref [4, G] int32 (TRANSPOSED in-kernel: SMEM pads the minor
    dim to 128 lanes, so a [G, 4] layout would burn 512 B/tile —
    5.9 MB > the 1 MB SMEM at 8M): window id (consumed by the index
    maps), start block local to the window, m2p block count, p2p block
    count.
    refs: tgt planes x ndim + tgt_idx [1,T,1],
          window planes x ndim + mass + idx [1,1,W]
          (+ `quad` second-moment planes [1,1,W]),
          outs: acc planes x ndim + pot [1,T,1].
    The two segments run as two count-bounded loops so the (~3x/pair)
    quadrupole math is paid only on node rows; node/padding rows carry
    idx -1 and mass 0 so the standard self-exclusion / dead-pair
    gating handles them."""
    g = pl.program_id(0)
    n_t = ndim + 1
    tgt_refs = refs[:ndim]
    ti_ref = refs[ndim]
    src_refs = refs[n_t:n_t + ndim + 2]
    sq_refs = refs[n_t + ndim + 2:n_t + ndim + 2 + quad]
    out_refs = refs[n_t + ndim + 2 + quad:]
    eps2 = eps2_ref[0]

    # `group` tiles share this grid step (and its VMEM window fetch):
    # target blocks are (1, group, T) — tile i is ROW i. A (NG, GT, 1)
    # plane layout pads the unit minor dim to 128 lanes IN HBM (128x,
    # 5.6 GB per plane at 8M — the r5 gwalk HBM OOM); the row layout
    # is unpadded at production shapes and costs one (1,T)->(T,1)
    # transpose per tile per plane. Tile i's schedule row is
    # g*group + i.
    T = tgt_refs[0].shape[2]

    def make_body(start, with_quad, tcols, ti):
        def body(k, carry):
            accs, pot, comp = carry
            # window planes are (1, Wb, block): dynamic SUBLANE index
            # (cheap on Mosaic) instead of a dynamic lane slice of a
            # (1, 1, W) plane (measured 3x slower at 262k)
            off = start + k
            srows = [src_refs[d][0, pl.ds(off, 1), :]
                     for d in range(ndim)]              # (1, B)
            m = src_refs[ndim][0, pl.ds(off, 1), :]
            si = src_refs[ndim + 1][0, pl.ds(off, 1), :]
            qrows = ([r[0, pl.ds(off, 1), :] for r in sq_refs]
                     if with_quad else [])
            dxs = []
            r2 = None
            for d in range(ndim):
                dx = srows[d] - tcols[d]                # (T, B)
                dxs.append(dx)
                r2 = dx * dx if r2 is None else r2 + dx * dx
            r2 = r2 + eps2
            inv_r = jax.lax.rsqrt(r2)
            dead = (si == ti) | (r2 <= 0.0)
            inv_r = jnp.where(dead, 0.0, inv_r)
            w = m * inv_r
            if with_quad:
                # inv_r is already zeroed for dead pairs, so every
                # inv3/inv5/inv7-weighted quad term self-gates
                inv2 = inv_r * inv_r
                inv3 = inv2 * inv_r
                inv5 = inv3 * inv2
                pairs = [(a, b) for a in range(ndim)
                         for b in range(a, ndim)]
                trq = None
                dqd = None
                qdx = [None] * ndim
                for ci, (a, b) in enumerate(pairs):
                    qc = qrows[ci]                       # (1, B)
                    coef = 1.0 if a == b else 2.0
                    t_ = coef * qc * dxs[a] * dxs[b]     # (T, B)
                    dqd = t_ if dqd is None else dqd + t_
                    if a == b:
                        trq = qc if trq is None else trq + qc
                        qdx[a] = (qc * dxs[b] if qdx[a] is None
                                  else qdx[a] + qc * dxs[b])
                    else:
                        qdx[a] = (qc * dxs[b] if qdx[a] is None
                                  else qdx[a] + qc * dxs[b])
                        qdx[b] = (qc * dxs[a] if qdx[b] is None
                                  else qdx[b] + qc * dxs[a])
            parts = []
            if mode in ("both", "acc"):
                w3 = w * inv_r * inv_r
                if with_quad:
                    inv7 = inv5 * inv2
                    f7 = dqd * inv7
                    parts += [jnp.sum(w3 * dx - 3.0 * qdx[d] * inv5
                                      - 1.5 * trq * dx * inv5
                                      + 7.5 * dx * f7,
                                      axis=1, keepdims=True)
                              for d, dx in enumerate(dxs)]
                else:
                    parts += [jnp.sum(w3 * dx, axis=1, keepdims=True)
                              for dx in dxs]
            else:
                parts += [None] * ndim
            if mode in ("both", "pot"):
                if with_quad:
                    parts.append(-jnp.sum(
                        w + 1.5 * dqd * inv5 - 0.5 * trq * inv3,
                        axis=1, keepdims=True))
                else:
                    parts.append(-jnp.sum(w, axis=1, keepdims=True))
            else:
                parts.append(None)
            if compensated:
                new = []
                for i, (a, p) in enumerate(zip(accs + [pot], parts)):
                    if p is None:
                        new.append(a)
                        continue
                    s, e = _two_sum(a, p)
                    comp[i] = comp[i] + e
                    new.append(s)
                return new[:ndim], new[ndim], comp
            accs = [a if p is None else a + p
                    for a, p in zip(accs, parts[:ndim])]
            pot = pot if parts[ndim] is None else pot + parts[ndim]
            return accs, pot, comp
        return body

    for i in range(group):
        tcols = [jnp.transpose(r[0, i:i + 1, :])
                 for r in tgt_refs]                          # (T, 1)
        ti = jnp.transpose(ti_ref[0, i:i + 1, :])            # (T, 1) i32
        acc0 = [jnp.zeros((T, 1), jnp.float32) for _ in range(ndim)]
        pot0 = jnp.zeros((T, 1), jnp.float32)
        comp0 = [jnp.zeros((T, 1), jnp.float32) for _ in range(ndim + 1)]
        carry = (acc0, pot0, comp0)
        row = g * group + i
        start = sched_ref[1, row]
        if quad:
            # node segment with quadrupole math, then particle segment
            # monopole
            carry = jax.lax.fori_loop(0, sched_ref[2, row],
                                      make_body(start, True, tcols, ti),
                                      carry)
            carry = jax.lax.fori_loop(0, sched_ref[3, row],
                                      make_body(start + sched_ref[2, row],
                                                False, tcols, ti), carry)
        else:
            carry = jax.lax.fori_loop(0, sched_ref[2, row]
                                      + sched_ref[3, row],
                                      make_body(start, False, tcols, ti),
                                      carry)
        accs, pot, comp = carry
        for d in range(ndim):
            out_refs[d][0, i:i + 1, :] = jnp.transpose(
                accs[d] + comp[d] if compensated else accs[d])
        out_refs[ndim][0, i:i + 1, :] = jnp.transpose(
            pot + comp[ndim] if compensated else pot)


def eval_pool(tgt_pos, tgt_idx, pool_pos, pool_mass, pool_idx, sched,
              window: int, eps, G, block: int, compensated: bool = False,
              mode: str = "both", pool_quad=None,
              interpret: bool = False, group: int = 1):
    """gwalk pool evaluation (see _pool_kernel).

    tgt_pos [G, T, D] / tgt_idx [G, T]; pool planes [P] rows with P a
    multiple of `window` (block-aligned per-tile segments packed so no
    tile straddles a window, traversal4.build_pool(window_blocks=...));
    sched [G, 4] int32 (window id, local start block, m2p blocks,
    p2p blocks). One pallas launch for the whole query's near field.

    group: tiles per grid step (all sharing one VMEM window — the pool
    must have been packed with the same group, so every group's rows
    sit inside one window). Grid-step overhead measured ~40 us/step on
    v5e; group=8 cuts it 8x."""
    Gt, T, D = tgt_pos.shape
    P = pool_pos.shape[0]
    assert P % window == 0 and window % block == 0
    NW = P // window
    if Gt % group:
        pad = group - Gt % group
        tgt_pos = jnp.concatenate(
            [tgt_pos, jnp.full((pad, T, D), 1e30, tgt_pos.dtype)], 0)
        tgt_idx = jnp.concatenate(
            [tgt_idx, jnp.full((pad, T), -2, tgt_idx.dtype)], 0)
        sched = jnp.concatenate(
            [sched, jnp.zeros((pad, 4), sched.dtype)], 0)
    Gp = tgt_pos.shape[0]
    NG = Gp // group
    GT = group * T

    eps2 = jnp.asarray([jnp.asarray(eps, jnp.float32) ** 2], jnp.float32)
    # [NG, group, T] target/out planes (tile = row): a (NG, GT, 1)
    # layout pads the unit minor dim to 128 lanes in HBM (128x
    # expansion — 5.6 GB per plane at 8M); this one is unpadded at
    # production shapes and its full-trailing-dims block is always a
    # legal Mosaic block
    tgt_planes = [tgt_pos[:, :, d].reshape(NG, group, T)
                  for d in range(D)]
    tgt_planes.append(tgt_idx.reshape(NG, group, T))
    wb = window // block
    win_planes = [pool_pos[:, d].reshape(NW, wb, block) for d in range(D)]
    win_planes.append(pool_mass.reshape(NW, wb, block))
    win_planes.append(pool_idx.reshape(NW, wb, block))
    qdim = 0
    if pool_quad is not None:
        qdim = pool_quad.shape[1]
        win_planes += [pool_quad[:, i].reshape(NW, wb, block)
                       for i in range(qdim)]

    def tspec():
        return pl.BlockSpec((1, group, T), lambda g, s, e: (g, 0, 0))

    def wspec():
        # every tile of the group shares the first tile's window (the
        # group-granular packing guarantees containment)
        return pl.BlockSpec((1, wb, block),
                            lambda g, s, e: (s[0, g * group], 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NG,),
        in_specs=([tspec() for _ in tgt_planes]
                  + [wspec() for _ in win_planes]),
        out_specs=[tspec() for _ in range(D + 1)],
    )
    kernel = functools.partial(_pool_kernel, ndim=D, block=block,
                               compensated=compensated, mode=mode,
                               quad=qdim, group=group)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NG, group, T), jnp.float32)
                   for _ in range(D + 1)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=fused_vmem_budget()),
    )(sched.T, eps2, *tgt_planes, *win_planes)
    acc = jnp.stack([o.reshape(Gp, T)[:Gt] for o in outs[:D]], axis=2)
    pot = outs[D].reshape(Gp, T)[:Gt]
    G = jnp.asarray(G, tgt_pos.dtype)
    return G * acc, G * pot


def eval_tiles(tgt_pos, tgt_idx, m2p_pos, m2p_mass, m2p_quad,
               p2p_pos, p2p_mass, p2p_idx, eps, G,
               m2p_cnt=None, p2p_cnt=None,
               block: int = DEF_BLOCK, interpret: bool = False,
               fused: bool = True):
    """Pallas counterpart of the XLA backend's eval (monopole M2P + P2P).

    Quadrupole M2P is not yet ported to Pallas; callers requesting
    multipole_order=2 are routed to the XLA backend by dispatch."""
    if m2p_quad is not None:
        raise NotImplementedError("pallas backend is monopole-only")
    if fused:
        return eval_tiles_fused(tgt_pos, tgt_idx, m2p_pos, m2p_mass,
                                p2p_pos, p2p_mass, p2p_idx, eps, G,
                                m2p_cnt=m2p_cnt, p2p_cnt=p2p_cnt,
                                block=block, interpret=interpret)
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

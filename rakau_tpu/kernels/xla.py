"""Pairwise force/potential evaluation — pure-XLA reference backend.

Replaces the reference's xsimd inner loops (`detail/simd.hpp` + kernel
bodies in `tree.hpp`, SURVEY.md C8): batched targets vs sources with
Plummer softening, fast rsqrt, self-interaction excluded by index.

Two paths with different precision/throughput trade-offs (both accumulate
the m*dx*w sums as [T, S] @ [S, D] matmuls that XLA places on the MXU):

  * M2P (far field, node monopoles/quadrupoles): r^2 via the
    ||t||^2 + ||s||^2 - 2 t.s expansion in a tile-local frame. The MAC
    guarantees d >= size/theta, which bounds the cancellation error
    amplification ||t_local||^2 / r^2 to O(theta^2), so the expansion is
    safe exactly where it is fast.
  * P2P (near field, real particles): per-component differences, which are
    Sterbenz-exact for close pairs — the expansion would amplify rounding
    by ||t_local||^2 / r^2, unbounded as r -> 0.

Both scan over source blocks to bound the [C, T, B] temporaries.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _block_scan(body, init, arrays, block: int, pad_vals):
    """Split arrays [C, S, ...] into S-blocks and lax.scan body over them."""
    C = arrays[0].shape[0]
    S = arrays[0].shape[1]
    nblk = max(1, -(-S // block))
    pad = nblk * block - S
    blks = []
    for a, pv in zip(arrays, pad_vals):
        widths = ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2)
        a = jnp.pad(a, widths, constant_values=pv)
        a = a.reshape((C, nblk, block) + a.shape[2:])
        blks.append(jnp.moveaxis(a, 1, 0))
    out, _ = jax.lax.scan(body, init, tuple(blks))
    return out


def eval_p2p(tgt_pos, tgt_idx, src_pos, src_mass, src_idx, eps, G,
             block: int = 512):
    """Near-field particle-particle. tgt_pos [C,T,D], src_pos [C,S,D],
    src_idx [C,S] Morton particle ids (-1 pad). Returns acc [C,T,D],
    pot [C,T] (without G; caller scales)."""
    C, T, D = tgt_pos.shape
    dtype = tgt_pos.dtype
    eps2 = jnp.asarray(eps, dtype) ** 2

    def body(carry, blk):
        acc, pot = carry
        s, m, idx = blk                                   # [C,B,D],[C,B],[C,B]
        dds = [s[:, None, :, d] - tgt_pos[:, :, None, d] for d in range(D)]
        r2 = eps2 + sum(dd * dd for dd in dds)            # [C,T,B]
        inv_r = jax.lax.rsqrt(r2)
        excl = idx[:, None, :] == tgt_idx[:, :, None]
        inv_r = jnp.where(excl | (r2 <= 0), 0.0, inv_r)
        w = m[:, None, :] * inv_r
        w3 = w * inv_r * inv_r
        pot = pot - jnp.sum(w, axis=-1)
        # Direct per-component accumulation: the matmul re-association
        # (w3@s - t*sum(w3)) would reintroduce the cancellation for close
        # pairs, so the near field stays on the VPU.
        acc = acc + jnp.stack(
            [jnp.sum(w3 * dd, axis=-1) for dd in dds], axis=-1)
        return (acc, pot), None

    # Derive the zero init from the inputs so its sharding/varying type
    # matches the body outputs under shard_map (see shard-map scan-vma).
    init = (tgt_pos * 0, tgt_pos[..., 0] * 0)
    acc, pot = _block_scan(body, init, (src_pos, src_mass, src_idx), block,
                           (1e30, 0.0, -1))
    return G * acc, G * pot


def eval_m2p(tgt_pos, src_pos, src_mass, eps, G, src_quad=None,
             block: int = 1024):
    """Far-field node-monopole (+ optional quadrupole) contributions.
    tgt_pos [C,T,D]; src_pos/src_mass [C,S,...] node COMs/masses (padding
    mass 0 at a far sentinel). Returns acc [C,T,D], pot [C,T]."""
    C, T, D = tgt_pos.shape
    dtype = tgt_pos.dtype
    eps2 = jnp.asarray(eps, dtype) ** 2

    # Tile-local frame bounds the norm-expansion cancellation (see module
    # docstring).
    center = jnp.mean(tgt_pos, axis=1, keepdims=True)
    t = tgt_pos - center
    t2 = jnp.sum(t * t, axis=-1)

    def body(carry, blk):
        acc, pot = carry
        if src_quad is None:
            s, m = blk
            q = None
        else:
            s, m, q = blk
        s = s - center
        s2 = jnp.sum(s * s, axis=-1)
        ts = jnp.einsum("ctd,cbd->ctb", t, s,
                        preferred_element_type=dtype,
                        precision=jax.lax.Precision.HIGHEST)
        r2 = jnp.maximum(t2[:, :, None] + s2[:, None, :] - 2 * ts, 0.0) + eps2
        inv_r = jax.lax.rsqrt(r2)
        inv_r = jnp.where((m[:, None, :] <= 0) | (r2 <= 0), 0.0, inv_r)
        w = m[:, None, :] * inv_r
        w3 = w * inv_r * inv_r
        pot = pot - jnp.sum(w, axis=-1)
        acc = acc + jnp.einsum("ctb,cbd->ctd", w3, s,
                               preferred_element_type=dtype,
                               precision=jax.lax.Precision.HIGHEST)
        acc = acc - t * jnp.sum(w3, axis=-1)[:, :, None]
        if q is not None:
            acc, pot = _quad_terms(acc, pot, t, s, q, inv_r, dtype)
        return (acc, pot), None

    init = (tgt_pos * 0, tgt_pos[..., 0] * 0)
    arrays = (src_pos, src_mass) if src_quad is None else (
        src_pos, src_mass, src_quad)
    pads = (1e30, 0.0) if src_quad is None else (1e30, 0.0, 0.0)
    acc, pot = _block_scan(body, init, arrays, block, pads)
    return G * acc, G * pot


def _two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def eval_shared(tgt_pos, tgt_idx, src_pos, src_mass, src_idx, mask,
                eps, G, block: int = 1024, compensated: bool = False,
                mode: str = "both", src_cell=None, tgt_cell=None,
                grid_sep: int = 0, src_quad=None):
    """Shared-candidate evaluation: sources [S, ...] common to all C
    tiles, per-tile contribution mask [C, S] (traversal2). Direct
    per-component differences throughout (the mask mixes near and far
    sources, so the near-field-safe path is used for all). With
    `compensated`, partial block sums accumulate through TwoSum error
    terms (the "mixed fp32/fp64 accumulation" of BASELINE config #3).

    src_cell [S, D] / tgt_cell [C, T, D] (grid2 mode): per-pair leaf-
    grid coverage masking — a pair is dead iff its Chebyshev cell
    separation >= grid_sep (that part of the interaction lives in the
    dense far field). Rows with src_cell < 0 are exempt (LET imports).

    src_quad [S, Q]: raw second moments about the source COM
    (multipole_order=2 node rows); adds the quadrupole correction with
    the same per-pair dead/mask gating as the monopole term."""
    C, T, D = tgt_pos.shape
    S = src_pos.shape[0]
    dtype = tgt_pos.dtype
    eps2 = jnp.asarray(eps, dtype) ** 2
    use_cells = src_cell is not None

    nblk = max(1, -(-S // block))
    pad = nblk * block - S
    sp = jnp.pad(src_pos, ((0, pad), (0, 0)), constant_values=1e30)
    sm = jnp.pad(src_mass, (0, pad))
    si = jnp.pad(src_idx, (0, pad), constant_values=-1)
    mk = jnp.pad(mask.astype(dtype), ((0, 0), (0, pad)))
    sp = jnp.moveaxis(sp.reshape(nblk, block, D), 0, 0)
    sm = sm.reshape(nblk, block)
    si = si.reshape(nblk, block)
    mk = jnp.moveaxis(mk.reshape(C, nblk, block), 1, 0)
    blks = (sp, sm, si, mk)
    if use_cells:
        sc = jnp.pad(src_cell, ((0, pad), (0, 0)), constant_values=-1)
        blks = blks + (sc.reshape(nblk, block, D),)
    if src_quad is not None:
        Q = src_quad.shape[1]
        sq = jnp.pad(src_quad, ((0, pad), (0, 0)))
        blks = blks + (sq.reshape(nblk, block, Q),)

    def body(carry, blk):
        acc, pot, acc_c, pot_c = carry
        blk = list(blk)
        s, m, idx, mkb = blk[:4]             # [B,D],[B],[B],[C,B]
        pos4 = 4
        scb = qb = None
        if use_cells:
            scb = blk[pos4]                  # [B, D]
            pos4 += 1
        if src_quad is not None:
            qb = blk[pos4]                   # [B, Q]
        dds = [s[None, None, :, d] - tgt_pos[:, :, None, d]
               for d in range(D)]
        r2 = eps2 + sum(dd * dd for dd in dds)
        inv_r = jax.lax.rsqrt(r2)
        excl = idx[None, None, :] == tgt_idx[:, :, None]
        if use_cells:
            csep = jnp.max(
                jnp.abs(scb[None, None, :, :] - tgt_cell[:, :, None, :]),
                axis=-1)                     # [C, T, B]
            covered = (csep >= grid_sep) & (scb[None, None, :, 0] >= 0)
            excl = excl | covered
        if src_quad is not None:
            # masked-out pairs can be near-coincident: inv_r^7
            # overflows to inf and the mask gate then yields 0 * inf =
            # NaN (the shared+quad 1M NaN). Zero inv_r for them so the
            # quad power chain starts from an exact zero.
            excl = excl | (mkb[:, None, :] <= 0)
        inv_r = jnp.where(excl | (r2 <= 0), 0.0, inv_r)
        w = (m[None, None, :] * mkb[:, None, :]) * inv_r
        if mode in ("both", "acc"):
            w3 = w * inv_r * inv_r
            dacc = jnp.stack([jnp.sum(w3 * dd, axis=-1) for dd in dds],
                             axis=-1)
        else:
            dacc = None
        dpot = -jnp.sum(w, axis=-1) if mode in ("both", "pot") else None
        if qb is not None:
            # quadrupole correction (see eval_m2p._quad_terms; here the
            # pair vector dds = s - t, the NEGATIVE of that derivation's
            # d = t - s, so odd-order terms flip sign). inv_r is already
            # zeroed for dead pairs; the mask folds in per pair.
            inv2 = inv_r * inv_r
            inv3 = inv2 * inv_r
            inv5 = inv3 * inv2
            trq = jnp.zeros(qb.shape[0], dtype)
            dqd = None
            qdx = [None] * D
            for ci, (a, b) in enumerate(_quad_pairs(D)):
                qc = qb[:, ci]
                coef = 1.0 if a == b else 2.0
                term = coef * qc[None, None, :] * dds[a] * dds[b]
                dqd = term if dqd is None else dqd + term
                if a == b:
                    trq = trq + qc
                    qdx[a] = (qc[None, None, :] * dds[b] if qdx[a] is None
                              else qdx[a] + qc[None, None, :] * dds[b])
                else:
                    qdx[a] = (qc[None, None, :] * dds[b] if qdx[a] is None
                              else qdx[a] + qc[None, None, :] * dds[b])
                    qdx[b] = (qc[None, None, :] * dds[a] if qdx[b] is None
                              else qdx[b] + qc[None, None, :] * dds[a])
            mkp = mkb[:, None, :]
            if dpot is not None:
                dpot = dpot - jnp.sum(
                    mkp * (1.5 * dqd * inv5
                           - 0.5 * trq[None, None, :] * inv3), axis=-1)
            if dacc is not None:
                inv7 = inv5 * inv2
                f5 = mkp * inv5
                f7 = mkp * dqd * inv7
                dacc = dacc + jnp.stack(
                    [jnp.sum(-3.0 * qdx[d] * f5
                             - 1.5 * trq[None, None, :] * dds[d] * f5
                             + 7.5 * dds[d] * f7, axis=-1)
                     for d in range(D)], axis=-1)
        if compensated:
            ea = ep = 0.0
            if dacc is not None:
                acc, ea = _two_sum(acc, dacc)
            if dpot is not None:
                pot, ep = _two_sum(pot, dpot)
            return (acc, pot, acc_c + ea, pot_c + ep), None
        if dacc is not None:
            acc = acc + dacc
        if dpot is not None:
            pot = pot + dpot
        return (acc, pot, acc_c, pot_c), None

    init = (tgt_pos * 0, tgt_pos[..., 0] * 0,
            tgt_pos * 0, tgt_pos[..., 0] * 0)
    (acc, pot, acc_c, pot_c), _ = jax.lax.scan(body, init, blks)
    if compensated:
        acc = acc + acc_c
        pot = pot + pot_c
    G = jnp.asarray(G, dtype)
    return G * acc, G * pot


def eval_pool(tgt_pos, tgt_idx, pool_pos, pool_mass, pool_idx, sched,
              window: int, eps, G, block: int, compensated: bool = False,
              mode: str = "both", pool_quad=None):
    """Reference backend for the gwalk pool evaluation (pallas.eval_pool):
    gathers each tile's pool segment into a dense [G, W] panel and runs
    the per-component kernel. O(G * window) memory — fine for the CPU
    test shapes; the TPU path streams windows instead."""
    Gt, T, D = tgt_pos.shape
    wb = window // block
    abs_blk = sched[:, 0] * wb + sched[:, 1]            # [G]
    nrows = (sched[:, 2] + sched[:, 3]) * block
    cap = pool_pos.shape[0]
    rows = abs_blk[:, None] * block + jnp.arange(window)[None, :]
    valid = jnp.arange(window)[None, :] < nrows[:, None]
    rows = jnp.where(valid, rows, cap - 1)
    sp = jnp.where(valid[..., None], pool_pos[rows], 1e30)
    sm = jnp.where(valid, pool_mass[rows], 0.0)
    si = jnp.where(valid, pool_idx[rows], -1)
    if pool_quad is None:
        acc, pot = eval_p2p(tgt_pos, tgt_idx, sp, sm, si, eps, G,
                            block=block)
    else:
        sq = jnp.where(valid[..., None], pool_quad[rows], 0.0)
        mask1 = jnp.ones((1, window), bool)

        def per_tile(tp, tix, s, m, i, q):
            a, p = eval_shared(tp[None], tix[None], s, m, i, mask1,
                               eps, G, block=block,
                               compensated=compensated, mode=mode,
                               src_quad=q)
            return a[0], p[0]

        acc, pot = jax.vmap(per_tile)(tgt_pos, tgt_idx, sp, sm, si, sq)
    if mode == "acc":
        pot = pot * 0
    elif mode == "pot":
        acc = acc * 0
    return acc, pot


def _quad_pairs(ndim: int):
    pairs = []
    for a in range(ndim):
        for b in range(a, ndim):
            pairs.append((a, b))
    return pairs


def _quad_terms(acc, pot, t, s, q, inv_r, dtype):
    """Quadrupole correction from raw second moments Q_ab = sum m dx_a dx_b
    about the node COM (multipole_order=2 accuracy extension; the reference
    is monopole-only):

      psi      = 1.5 dQd r^-5 - 0.5 trQ r^-3      (phi += -G psi)
      grad psi = 3 Qd r^-5 + 1.5 trQ d r^-5 - 7.5 dQd d r^-7
                                                   (acc += G grad psi)
    with d = t - s the source-to-target vector."""
    C, T, D = t.shape
    B = s.shape[1]
    d = t[:, :, None, :] - s[:, None, :, :]
    inv2 = inv_r * inv_r
    inv3 = inv2 * inv_r
    inv5 = inv3 * inv2
    inv7 = inv5 * inv2
    trq = jnp.zeros((C, B), dtype)
    dqd = jnp.zeros((C, T, B), dtype)
    qd = jnp.zeros((C, T, B, D), dtype)
    for ci, (a, b) in enumerate(_quad_pairs(D)):
        qc = q[:, :, ci]
        if a == b:
            trq = trq + qc
            dqd = dqd + qc[:, None, :] * d[..., a] * d[..., b]
            qd = qd.at[..., a].add(qc[:, None, :] * d[..., b])
        else:
            dqd = dqd + 2 * qc[:, None, :] * d[..., a] * d[..., b]
            qd = qd.at[..., a].add(qc[:, None, :] * d[..., b])
            qd = qd.at[..., b].add(qc[:, None, :] * d[..., a])
    half_tr = 0.5 * trq[:, None, :]
    pot = pot - (1.5 * dqd * inv5 - half_tr * inv3).sum(-1)
    term = (3.0 * qd * inv5[..., None]
            + 3.0 * half_tr[..., None] * d * inv5[..., None]
            - 7.5 * dqd[..., None] * d * inv7[..., None])
    acc = acc + term.sum(2)
    return acc, pot

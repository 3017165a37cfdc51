"""Exact O(N^2) direct-summation accelerations/potentials.

Reference parity: rakau's `exact_acc_u/o`, `exact_pot_u/o` family
(SURVEY.md C10) — the accuracy oracle every tree result is validated
against. Two implementations:

- `direct_acc_pot`: jittable, chunked over targets with `lax.map` so the
  [N, N] pairwise intermediate never materializes; runs on TPU or CPU in the
  tree's dtype.
- `direct_acc_pot_np`: float64 NumPy oracle for tests (the reference runs
  its oracle in the tree's own F, but the rebuild's accuracy gate wants an
  independent fp64 reference; SURVEY.md §5).

Conventions (shared with the tree kernels):
  acc_i = G * sum_{j != i} m_j * (x_j - x_i) / (|x_j - x_i|^2 + eps^2)^{3/2}
  pot_i = -G * sum_{j != i} m_j / (|x_j - x_i|^2 + eps^2)^{1/2}
Plummer softening; the self term is excluded by index, matching rakau.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _chunk_acc_pot(tgt_pos, tgt_idx, src_pos, src_mass, eps, G):
    # tgt_pos [T, D]; src [N, D]. Pairwise over the full source set.
    d = src_pos[None, :, :] - tgt_pos[:, None, :]          # [T, N, D]
    r2 = jnp.sum(d * d, axis=-1) + eps * eps               # [T, N]
    inv_r = jax.lax.rsqrt(r2)
    n = src_pos.shape[0]
    self_mask = tgt_idx[:, None] == jnp.arange(n)[None, :]
    # Guard r2 == 0 (eps == 0 + self pair): weight forced to 0 via mask.
    inv_r = jnp.where(self_mask, 0.0, inv_r)
    w = src_mass[None, :] * inv_r
    pot = -G * jnp.sum(w, axis=1)
    acc = G * jnp.einsum("tn,tnd->td", w * inv_r * inv_r, d,
                         precision=jax.lax.Precision.HIGHEST)
    return acc, pot


def direct_acc_pot(pos, mass, eps=0.0, G=1.0, chunk=2048):
    """Exact accelerations + potentials for all particles. [N,D],[N]."""
    n, ndim = pos.shape
    eps = jnp.asarray(eps, pos.dtype)
    G = jnp.asarray(G, pos.dtype)
    npad = (-n) % chunk
    pos_p = jnp.pad(pos, ((0, npad), (0, 0)))
    idx_p = jnp.arange(n + npad, dtype=jnp.int32)
    tgt_chunks = pos_p.reshape(-1, chunk, ndim)
    idx_chunks = idx_p.reshape(-1, chunk)

    def body(args):
        tp, ti = args
        return _chunk_acc_pot(tp, ti, pos, mass, eps, G)

    acc, pot = jax.lax.map(body, (tgt_chunks, idx_chunks))
    acc = acc.reshape(-1, ndim)[:n]
    pot = pot.reshape(-1)[:n]
    return acc, pot


def direct_acc_pot_np(pos, mass, eps=0.0, G=1.0, targets=None,
                      chunk=1024):
    """Float64 NumPy oracle. `targets`: optional index subset (for large N,
    sample-based error estimation; SURVEY.md §5)."""
    pos = np.asarray(pos, dtype=np.float64)
    mass = np.asarray(mass, dtype=np.float64)
    n, ndim = pos.shape
    if targets is None:
        targets = np.arange(n)
    targets = np.asarray(targets)
    acc = np.zeros((len(targets), ndim))
    pot = np.zeros(len(targets))
    e2 = float(eps) ** 2
    # cap the [chunk, N, D] pairwise panel at ~1.5 GB of float64
    # intermediates (an 8M-source run with the default chunk of 1024
    # peaks >100 GB host RSS and gets OOM-killed)
    chunk = max(1, min(chunk, (1 << 26) // max(n, 1)))
    for s in range(0, len(targets), chunk):
        t = targets[s:s + chunk]
        d = pos[None, :, :] - pos[t][:, None, :]       # [c, N, D]
        r2 = np.einsum("cnd,cnd->cn", d, d) + e2
        with np.errstate(divide="ignore", invalid="ignore"):
            inv_r = 1.0 / np.sqrt(r2)
        self_mask = t[:, None] == np.arange(n)[None, :]
        inv_r[self_mask] = 0.0
        w = mass[None, :] * inv_r
        pot[s:s + chunk] = -G * w.sum(axis=1)
        acc[s:s + chunk] = G * np.einsum("cn,cnd->cd", w * inv_r ** 2, d)
    return acc, pot

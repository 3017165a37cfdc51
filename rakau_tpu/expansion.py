"""Tile-local far-field expansions (M2L + L2P).

The reference evaluates every MAC-accepted node against every target
particle (per-particle M2P monopole, rakau `tree.hpp` traversal inner
loop, SURVEY.md C7/C8). On TPU that per-particle work is the throughput
ceiling: with ~10^3 accepted nodes per target at theta=0.75 the VPU
pairwise rate bounds the whole query.

This module moves the far field to the FMM side of the ledger (Dehnen
falcON lineage; the survey's "batched interaction lists" taken one step
further): nodes that are far relative to the TARGET TILE are accumulated
once per tile into a Taylor ("local") expansion of the potential about
the tile center (M2L: cost per tile-node pair, amortized over the
ncrit targets), and each particle evaluates the polynomial (L2P: O(1)
per particle). Only nodes near the tile keep the per-particle M2P path,
so kernel work shrinks to near-field P2P + a small M2P residue.

Conventions. Let u(x) = (|y - x|^2 + eps^2)^(-1/2) for a source monopole
(mass m at COM y). The kernels accumulate

    pot(x) = -G * sum m * u          acc(x) = G * grad_x sum m * u

so with psi = sum m * u we Taylor-expand psi about the tile center c:

    psi(c + s) ~= P0 + P1.s + 1/2 s^T H s + 1/6 P3[s,s,s]

    P0     = sum m u
    P1_a   = sum m D_a u^3                       D = y - c
    H_ab   = sum m (3 D_a D_b u^5 - delta_ab u^3)
    P3_abc = sum m (15 D_a D_b D_c u^7
                    - 3 (delta_ab D_c + delta_ac D_b + delta_bc D_a) u^5)

and evaluate pot = -G psi(s), acc_d = G d(psi)/d(s_d). Symmetric tensors
are stored by unique component (H: D(D+1)/2, P3: D(D+1)(D+2)/6).

Error: relative acc error ~ rho^(order), rho = |s|/dist(c, y); the
near/far gate (`far_mask`, engine) bounds rho <= 1/gamma so the far
field keeps the monopole MAC envelope (validated by tests vs the exact
per-particle M2P path and direct-sum).
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
from jax import lax


@lru_cache(maxsize=None)
def sym_indices(ndim: int):
    """(pairs, triples) of unique symmetric index tuples with their
    permutation multiplicities."""
    pairs = []
    for a in range(ndim):
        for b in range(a, ndim):
            pairs.append(((a, b), 1 if a == b else 2))
    triples = []
    for a in range(ndim):
        for b in range(a, ndim):
            for c in range(b, ndim):
                if a == b == c:
                    mult = 1
                elif a == b or b == c or a == c:
                    mult = 3
                else:
                    mult = 6
                triples.append(((a, b, c), mult))
    return tuple(pairs), tuple(triples)


def n_coeffs(ndim: int, order: int) -> int:
    pairs, triples = sym_indices(ndim)
    n = 1 + ndim + len(pairs)
    if order >= 3:
        n += len(triples)
    return n


def m2l_terms(Dv, m, eps, order: int = 3):
    """Per-source local-expansion contributions (no reduction).

    Dv [..., D]: source position minus expansion center; m [...]: masked
    source mass (0 = inert). Returns [..., NC] coefficient contributions.
    Shared by the per-tile m2l (sum over a source axis) and the dense-grid
    stencil M2L (accumulation over shifted whole grids)."""
    ndim = Dv.shape[-1]
    dt = Dv.dtype
    pairs, triples = sym_indices(ndim)
    eps2 = jnp.asarray(eps, dt) ** 2

    d2 = jnp.sum(Dv * Dv, axis=-1) + eps2
    u2 = jnp.where(d2 > 0, 1.0 / d2, 0.0)
    u = jnp.sqrt(u2)
    mu = m * u
    mu3 = mu * u2
    mu5 = mu3 * u2
    mu7 = mu5 * u2

    cols = [mu]                                             # P0
    for a in range(ndim):                                   # P1
        cols.append(mu3 * Dv[..., a])
    for (a, b), _ in pairs:                                 # H (unique)
        h = 3.0 * mu5 * Dv[..., a] * Dv[..., b]
        if a == b:
            h = h - mu3
        cols.append(h)
    if order >= 3:
        for (a, b, c), _ in triples:                        # P3 (unique)
            t = 15.0 * mu7 * Dv[..., a] * Dv[..., b] * Dv[..., c]
            if a == b:
                t = t - 3.0 * mu5 * Dv[..., c]
            if a == c:
                t = t - 3.0 * mu5 * Dv[..., b]
            if b == c:
                t = t - 3.0 * mu5 * Dv[..., a]
            cols.append(t)
    return jnp.stack(cols, axis=-1)                         # [..., NC]


def m2l(center, node_pos, node_mass, far_mask, eps, order: int = 3):
    """Accumulate far nodes into per-tile local expansions.

    center [C, D]; node_pos [U, D]; node_mass [U]; far_mask [C, U] bool;
    returns L [C, n_coeffs]. All dense panels — no gathers."""
    Dv = node_pos[None, :, :] - center[:, None, :]          # [C, U, D]
    m = jnp.where(far_mask, node_mass[None, :], 0.0)        # [C, U]
    return jnp.sum(m2l_terms(Dv, m, eps, order), axis=1)    # [C, NC]


def l2p(L, center, tgt_pos, G, order: int = 3):
    """Evaluate local expansions at target particles.

    L [C, NC]; center [C, D]; tgt_pos [C, T, D]; returns
    (acc [C, T, D], pot [C, T]) scaled by G."""
    C, T, ndim = tgt_pos.shape
    pairs, triples = sym_indices(ndim)
    s = tgt_pos - center[:, None, :]                        # [C, T, D]

    k = 0
    P0 = L[:, k, None]; k += 1
    P1 = [L[:, k + d, None] for d in range(ndim)]; k += ndim
    Hu = {}
    for (a, b), _ in pairs:
        Hu[(a, b)] = L[:, k, None]
        k += 1

    def H(a, b):
        return Hu[(a, b) if a <= b else (b, a)]

    psi = P0
    acc = []
    for d in range(ndim):
        psi = psi + P1[d] * s[..., d]
        acc.append(P1[d] + sum(H(d, b) * s[..., b] for b in range(ndim)))
    for (a, b), mult in pairs:
        psi = psi + (0.5 * mult) * Hu[(a, b)] * s[..., a] * s[..., b]

    if order >= 3:
        Tu = {}
        for (a, b, c), _ in triples:
            Tu[(a, b, c)] = L[:, k, None]
            k += 1

        def T3(a, b, c):
            key = tuple(sorted((a, b, c)))
            return Tu[key]

        for (a, b, c), mult in triples:
            psi = psi + (mult / 6.0) * Tu[(a, b, c)] * (
                s[..., a] * s[..., b] * s[..., c])
        for d in range(ndim):
            g = 0.0
            for (a, b), mult in pairs:
                g = g + (0.5 * mult) * T3(d, a, b) * s[..., a] * s[..., b]
            acc[d] = acc[d] + g

    G = jnp.asarray(G, tgt_pos.dtype)
    return G * jnp.stack(acc, axis=-1), -G * psi


def l2l(L, shift, order: int = 3):
    """Re-center local expansions: coefficients about c become coefficients
    about c' = c + shift (exact polynomial recentring; used to push parent
    cell expansions down to children/tiles in the hierarchical traversal).

    With psi(s) = P0 + P1.s + 1/2 s^T H s + 1/6 P3[s,s,s] and s = shift + s':
      P0' = psi(shift)
      P1'_d = dpsi/ds_d(shift) = P1_d + (H shift)_d + 1/2 P3[d, shift, shift]
      H'_ab = H_ab + P3[a, b, shift]
      P3' = P3

    L [..., NC]; shift [..., D]; returns [..., NC]."""
    ndim = shift.shape[-1]
    pairs, triples = sym_indices(ndim)
    t = [shift[..., d] for d in range(ndim)]

    k = 0
    P0 = L[..., k]; k += 1
    P1 = [L[..., k + d] for d in range(ndim)]; k += ndim
    Hu = {}
    for (a, b), _ in pairs:
        Hu[(a, b)] = L[..., k]
        k += 1

    def H(a, b):
        return Hu[(a, b) if a <= b else (b, a)]

    P0n = P0 + sum(P1[d] * t[d] for d in range(ndim))
    for (a, b), mult in pairs:
        P0n = P0n + (0.5 * mult) * Hu[(a, b)] * t[a] * t[b]
    P1n = [P1[d] + sum(H(d, b) * t[b] for b in range(ndim))
           for d in range(ndim)]
    Hn = {key: v for key, v in Hu.items()}

    if order >= 3:
        Tu = {}
        for (a, b, c), _ in triples:
            Tu[(a, b, c)] = L[..., k]
            k += 1

        def T3(a, b, c):
            return Tu[tuple(sorted((a, b, c)))]

        for (a, b, c), mult in triples:
            P0n = P0n + (mult / 6.0) * Tu[(a, b, c)] * t[a] * t[b] * t[c]
        for d in range(ndim):
            g = 0.0
            for (a, b), mult in pairs:
                g = g + (0.5 * mult) * T3(d, a, b) * t[a] * t[b]
            P1n[d] = P1n[d] + g
        for (a, b), _ in pairs:
            Hn[(a, b)] = Hn[(a, b)] + sum(
                T3(a, b, c) * t[c] for c in range(ndim))

    cols = [P0n] + P1n + [Hn[key] for key, _ in pairs]
    if order >= 3:
        cols += [Tu[key] for key, _ in triples]
    return jnp.stack(cols, axis=-1)


def far_split(center, radius2, node_pos, node_mass, mask, gamma):
    """Gate accepted nodes between the local-expansion far path and the
    per-particle M2P kernel path.

    center [C, D] tile centers; radius2 [C] squared tile half-diagonals;
    node_pos [U, D]; mask [C, U] (MAC-accepted); gamma: a node goes far
    iff dist(center, COM)^2 > gamma^2 * radius2 (bounds the expansion's
    rho = |s|/d <= 1/gamma). Returns (far_mask, near_mask)."""
    Dv = node_pos[None, :, :] - center[:, None, :]
    d2 = jnp.sum(Dv * Dv, axis=-1)                          # [C, U]
    g2 = jnp.asarray(gamma, center.dtype) ** 2
    far = mask & (d2 > g2 * radius2[:, None]) & (node_mass[None, :] > 0)
    return far, mask & ~far

"""Dense-grid stencil far field (FMM-style M2L on regular per-level grids).

The walk-based traversal pays ~10 ns/element platform tax on every
irregular access (gathers, compactions); at theta=0.75 the far field is
~80-95% of all interactions. This module computes the far field with
REGULAR ops only: per-level dense cell grids, shifted-array M2L over a
fixed separation stencil, and an exact L2L chain down to the leaf grid.
The adaptive BH walk then only resolves the 5^D-cell near neighborhood
(traversal2 drop rules), which is where adaptivity actually matters.

Coverage (why this is exact bookkeeping, not an approximation scheme):
a (target-cell, source-cell) pair at level l with per-dim Chebyshev
separation sep_l = maxcomp(cell_s - cell_t) is handled by the level-l
stencil iff 3 <= sep_l and the parent pair has sep_{l-1} <= 2. Since
sep_{l+1} >= 2*sep_l - 1, once sep >= 3 it stays >= 3, so every pair
with sep_{L0} >= 3 is covered at exactly one level <= L0, and a pair is
covered somewhere iff its leaf-grid separation is >= 3. The traversal
therefore drops exactly those candidates (node's own-level separation
>= 3, or L0-ancestor separation >= 3 below the grid), and P2P particles
from leaves above L0 are filtered per particle by the same L0 test.
sep >= 3 gives surface distance >= 2 cells => effective opening angle
size/dist <= 0.5, tighter than the theta=0.75 envelope; the local
truncation rho = r_cell/d <= 0.87/2.13 matches the per-tile gamma gate.

Accuracy/perf knobs: cfg.grid_level (None = auto ~ log_2^D(n/ncrit)),
cfg.local_order shared with the tile expansion path.

Reference mapping (SURVEY.md): replaces the C7 far-field traversal and
C8 M2P inner loops for well-separated cells; the per-call theta still
controls everything the stencil does not cover (the near 5^D region).
"""
from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import expansion
from . import scan_utils as su

I32 = jnp.int32

# Stencil geometry: children of parents with sep<=2 span offsets in
# [-5, 5]; covered offsets are 3 <= maxcomp <= 5.
_PAD = 5


@lru_cache(maxsize=None)
def stencil_offsets(ndim: int):
    """Static stencil: (offsets [NO, D] int32, parity_bits [NO] int32).

    parity_bits packs, per offset o, a bitmask over the 2^D target-cell
    parities b for which the pair is NOT already covered at the parent
    level: bit(b) = 1 iff maxcomp(floor((b + o)/2)) <= 2."""
    rng = range(-_PAD, _PAD + 1)
    offs = []
    bits = []
    import itertools
    for o in itertools.product(rng, repeat=ndim):
        mc = max(abs(c) for c in o)
        if not (3 <= mc <= _PAD):
            continue
        mask = 0
        for bidx in range(2 ** ndim):
            b = [(bidx >> d) & 1 for d in range(ndim)]
            q = [ (b[d] + o[d]) // 2 for d in range(ndim) ]  # floor div
            if max(abs(c) for c in q) <= 2:
                mask |= 1 << bidx
        if mask:
            offs.append(o)
            bits.append(mask)
    return (np.asarray(offs, np.int32), np.asarray(bits, np.int32))


def effective_grid_level(cfg, n: int) -> int:
    """Leaf-grid level L0 (static): ~n/ncrit cells, memory-capped."""
    if cfg.grid_level is not None:
        return cfg.grid_level
    import math
    if n <= cfg.ncrit:
        return 0
    l0 = int(math.floor(math.log(max(n / cfg.ncrit, 1.0), 2 ** cfg.ndim)))
    cap = {1: 16, 2: 9, 3: 6}[cfg.ndim]   # <= ~262k cells
    return max(0, min(l0, cap, cfg.max_depth))


class Pyramid(NamedTuple):
    """Dense per-level monopole grids, levels 0..L0 (row-major [G]*D).

    mass[l]: [G^D]; wsum[l]: [G^D, D] mass-weighted positions (absolute
    coordinates), so COM = wsum/mass."""
    mass: tuple
    wsum: tuple


def build_pyramid(td, ndim: int, depth: int, L0: int) -> Pyramid:
    """Bin Morton-sorted particles into the leaf grid and reduce upward.

    Scatter-free binning at L0: particles of one cell are contiguous in
    Morton order, so per-cell sums come from dd prefix sums sampled at
    cell boundaries found by binary search over the particles' Morton
    cell ids; only the [G^D]-sized Morton->row-major relayout scatters
    (cells, not particles)."""
    from . import particles as pmod
    n = td.pos.shape[0]
    G = 1 << L0
    ncells = G ** ndim
    dtype = td.pos.dtype

    cells = pmod.discretize(td.pos, td.box_size, depth)      # [N, D]
    cl0 = (cells >> (depth - L0)).astype(I32)                # [N, D]
    # Morton cell id — MUST be monotone along the sorted particle order,
    # i.e. match morton.py's bit layout: bit b of dim d lands at
    # position b*ndim + (ndim-1-d).
    mid = jnp.zeros(n, I32)
    for bit in range(L0):
        for d in range(ndim):
            mid = mid | (((cl0[:, d] >> bit) & 1)
                         << (bit * ndim + (ndim - 1 - d)))

    # boundaries of every Morton cell id: first particle index with
    # mid >= c, for c = 0..ncells  -> segment [b[c], b[c+1])
    bounds = su.searchsorted_1d(mid, jnp.arange(ncells + 1, dtype=I32))
    b0 = bounds[:-1]
    b1 = bounds[1:]

    sums = [su.dd_cumsum(td.mass)]
    for d in range(ndim):
        sums.append(su.dd_cumsum(td.mass * td.pos[:, d]))
    mass_m = su.segment_sum_from_prefix(*sums[0], b0, b1)    # [ncells] morton
    w_m = jnp.stack([su.segment_sum_from_prefix(*sums[1 + d], b0, b1)
                     for d in range(ndim)], axis=1)

    # Morton -> row-major relayout (one G^D-sized scatter)
    # cell coords from morton id (same bit layout as above)
    coords = []
    for d in range(ndim):
        c = jnp.zeros(ncells, I32)
        ar = jnp.arange(ncells, dtype=I32)
        for bit in range(L0):
            c = c | (((ar >> (bit * ndim + (ndim - 1 - d))) & 1) << bit)
        coords.append(c)
    flat = coords[0]
    for d in range(1, ndim):
        flat = flat * G + coords[d]
    # MISCOMPILE GUARD: XLA:TPU fusing the dd boundary-gather segment sum
    # into a relayout scatter writes zeros (v5e, 2026-08-19; bisected in
    # benchmarks/ff_bisect3.py on grid2's identical pattern). Materialize
    # the segment sums before scattering.
    mass_m, w_m = jax.lax.optimization_barrier((mass_m, w_m))
    mass_l0 = jnp.zeros(ncells, dtype).at[flat].set(mass_m.astype(dtype))
    w_l0 = jnp.zeros((ncells, ndim), dtype).at[flat].set(w_m.astype(dtype))

    masses = {L0: mass_l0}
    wsums = {L0: w_l0}
    for l in range(L0 - 1, -1, -1):
        Gc = 1 << (l + 1)
        shape = (Gc // 2, 2) * ndim
        m = masses[l + 1].reshape(shape)
        w = wsums[l + 1].reshape(shape + (ndim,))
        axes = tuple(2 * i + 1 for i in range(ndim))
        masses[l] = m.sum(axis=axes).reshape(-1)
        wsums[l] = w.sum(axis=axes).reshape(-1, ndim)
    return Pyramid(mass=tuple(masses[l] for l in range(L0 + 1)),
                   wsum=tuple(wsums[l] for l in range(L0 + 1)))


def _cell_centers(ndim: int, l: int, box_size, dtype):
    """Absolute cell centers at level l, row-major [G^D, D]."""
    G = 1 << l
    s = box_size * (2.0 ** -l)
    ax = [jnp.arange(G, dtype=dtype)] * ndim
    grids = jnp.meshgrid(*ax, indexing="ij")
    c = jnp.stack([g.reshape(-1) for g in grids], axis=1)
    return (c + 0.5) * s - box_size / 2


def _parity_index(ndim: int, l: int):
    """Row-major [G^D] int32: packed parity bits of each cell."""
    G = 1 << l
    ax = [jnp.arange(G, dtype=I32)] * ndim
    grids = jnp.meshgrid(*ax, indexing="ij")
    p = jnp.zeros((G,) * ndim, I32)
    for d in range(ndim):
        p = p | ((grids[d] & 1) << d)
    return p.reshape(-1)


def dense_far_field(pyr: Pyramid, ndim: int, L0: int, box_size, eps,
                    order: int = 3):
    """M2L over the separation stencil at every level + L2L chain.

    Returns L_leaf [G^D, NC] (row-major), local expansions about leaf
    cell centers, covering exactly the sep>=3 pair decomposition."""
    offs_np, bits_np = stencil_offsets(ndim)
    offs = jnp.asarray(offs_np)
    bits = jnp.asarray(bits_np)
    dtype = pyr.mass[0].dtype
    NC = expansion.n_coeffs(ndim, order)

    Lcur = None
    for l in range(2, L0 + 1):
        G = 1 << l
        shape = (G,) * ndim
        Mp = jnp.pad(pyr.mass[l].reshape(shape),
                     ((_PAD, _PAD),) * ndim)
        Wp = jnp.pad(pyr.wsum[l].reshape(shape + (ndim,)),
                     ((_PAD, _PAD),) * ndim + ((0, 0),))
        centers = _cell_centers(ndim, l, box_size, dtype)    # [G^D, D]
        parity = _parity_index(ndim, l)                      # [G^D]

        def body(acc, ob):
            o, pb = ob
            start = [o[d] + _PAD for d in range(ndim)]
            Msh = jax.lax.dynamic_slice(Mp, start, shape).reshape(-1)
            Wsh = jax.lax.dynamic_slice(
                Wp, start + [jnp.zeros((), I32)],
                shape + (ndim,)).reshape(-1, ndim)
            ok = ((pb >> parity) & 1) > 0
            m = jnp.where(ok & (Msh > 0), Msh, 0.0)
            com = Wsh / jnp.maximum(Msh, 1e-30)[:, None]
            Dv = com - centers
            return acc + expansion.m2l_terms(Dv, m, eps, order), None

        L0acc = jnp.zeros((G ** ndim, NC), dtype)
        Ll, _ = jax.lax.scan(body, L0acc, (offs, bits))

        if Lcur is not None:
            # L2L: upsample the parent-level expansions and recenter by
            # the (parity-dependent) child-center offset.
            Gp = G // 2
            Lp = Lcur.reshape((Gp,) * ndim + (Lcur.shape[-1],))
            for d in range(ndim):
                Lp = jnp.repeat(Lp, 2, axis=d)
            Lp = Lp.reshape(-1, Lcur.shape[-1])
            s_child = box_size * (2.0 ** -l)
            pb = parity
            shift = jnp.stack(
                [(((pb >> d) & 1).astype(dtype) - 0.5) * s_child
                 for d in range(ndim)], axis=1)
            Ll = Ll + expansion.l2l(Lp, shift, order)
        Lcur = Ll
    if Lcur is None:   # L0 < 2: no covered pairs, all-near
        G = 1 << L0
        Lcur = jnp.zeros((G ** ndim, NC), dtype)
    return Lcur


def rowmajor_cell_index(cell, ndim: int, L0: int):
    """[..., D] int32 per-dim cell coords -> row-major flat index."""
    G = 1 << L0
    flat = cell[..., 0]
    for d in range(1, ndim):
        flat = flat * G + cell[..., d]
    return flat

"""Decoupled dense-grid FMM far field (conv-M2L, arbitrary order).

Round-1's grid.py couples the stencil far field to the target tiles
(tiles clipped at cell boundaries, tile-level L2L recentring, per-tile
coverage drops), which caps the leaf-grid level at ~log(n/ncrit) — at
8M the grid only reaches level 4 and the walked near field stays ~3000
pairs/particle. This module decouples them completely:

  * multipoles are about CELL CENTERS (not COMs), so the M2L operator
    for a fixed integer cell offset is a LINEAR map [NC_M -> NC_L].
    The per-level M2L over the separation stencil then becomes a
    grouped 3-D convolution — executed on the MXU via lax.conv with
    stride 2 per target-parity class (the parity mask of grid.py folds
    into 2^D per-parity kernels), instead of a 1206-step shifted-add
    scan on the VPU;
  * expansions are generic Cartesian Taylor series of any order:
    multipole order q and local order p are config knobs, and the T
    tensors D^gamma (|d|^2+eps^2)^(-1/2) are generated symbolically at
    trace time (exact coefficient recursion), so the accuracy ladder to
    the 1e-6 gate is "raise p/q", not "write new kernels";
  * L2P is evaluated PER PARTICLE at its own leaf cell (one gather of
    the cell's coefficients + a polynomial), so nothing about the far
    field references tiles — the near field is closed per-pair in the
    force kernels by the cell-separation test (sep < grid_sep), making
    the coverage bookkeeping exact for tiles spanning any number of
    cells.

All grid tensors are SCALE-FREE (cell-size-normalized): multipoles are
M~_alpha = sum m (delta/s_l)^alpha, locals L~_beta = L_beta s_l^{|beta|+1},
and the M2L kernels evaluate the T tensors at INTEGER cell offsets with
eps/s_l. Every coefficient is then O(1)-bounded regardless of level or
box size; the unnormalized form overflows fp32 at expansion order ~8
(T coefficients grow like (2k-1)!! against rho^{-(2k+1)/2} with
sub-unit cell sizes). Physical units re-enter only at L2P (one 1/s0 and
1/s0^2 factor on potential/acceleration).

Coverage (same argument as grid.py, generalized separation S >= 2):
a cell pair at level l with Chebyshev separation sep_l is handled by
the level-l stencil iff S <= sep_l (and the parent pair has
sep_{l-1} <= S-1, folded into the parity masks). Since
sep_{l+1} >= 2*sep_l - 1, sep >= S persists under refinement, so every
pair with leaf separation >= S is covered at exactly one level, and a
pair is covered somewhere iff its leaf-grid separation is >= S. The
near field is therefore exactly the (2S-1)^D-cell neighborhood,
resolved adaptively by the tree walk with per-pair sep masking.

Reference mapping (SURVEY.md): replaces the C7 far-field traversal and
C8 M2P inner loops for well-separated cells; per-call theta still
controls the near region.
"""
from __future__ import annotations

import itertools
import math
import os
from functools import lru_cache
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import scan_utils as su

I32 = jnp.int32


# ------------------------------------------------------------------ tables
@lru_cache(maxsize=None)
def multi_indices(ndim: int, order: int):
    """All multi-indices |alpha| <= order, graded-lex order.

    Returns (tuple of tuples, {alpha: position}, factorial array)."""
    idx = []
    for total in range(order + 1):
        for alpha in itertools.product(range(total + 1), repeat=ndim):
            if sum(alpha) == total:
                idx.append(alpha)
    lookup = {a: i for i, a in enumerate(idx)}
    fact = np.array([math.prod(math.factorial(a) for a in al)
                     for al in idx], np.float64)
    return tuple(idx), lookup, fact


def n_coeffs(ndim: int, order: int) -> int:
    return math.comb(order + ndim, ndim)


@lru_cache(maxsize=None)
def _t_tensor_terms(ndim: int, gamma: tuple):
    """Symbolic terms of T_gamma = D^gamma (|d|^2 + eps^2)^(-1/2).

    Each term is c * prod_d x_d^{a_d} * rho^{-(2k+1)/2} with
    rho = |d|^2 + eps^2; represented as {(a_tuple, k): c}. Built by
    exact coefficient recursion on differentiation."""
    terms = {(tuple([0] * ndim), 0): 1.0}
    for d in range(ndim):
        for _ in range(gamma[d]):
            new = {}
            for (a, k), c in terms.items():
                # d/dx_d [ x^a rho^{-(2k+1)/2} ]
                if a[d] > 0:
                    am = list(a); am[d] -= 1
                    key = (tuple(am), k)
                    new[key] = new.get(key, 0.0) + c * a[d]
                ap = list(a); ap[d] += 1
                key = (tuple(ap), k + 1)
                new[key] = new.get(key, 0.0) - c * (2 * k + 1)
            terms = new
    return tuple(sorted(terms.items()))


def t_tensors(d, eps, ndim: int, order: int):
    """Evaluate all T_gamma, |gamma| <= order, at offsets d [..., D].

    Returns [..., NG] in graded-lex order. Jit-friendly: the symbolic
    structure is static; values depend on traced d/eps."""
    gammas, _, _ = multi_indices(ndim, order)
    dt = d.dtype
    rho = jnp.sum(d * d, axis=-1) + jnp.asarray(eps, dt) ** 2
    inv = 1.0 / rho
    rs = lax.rsqrt(rho)
    kmax = order
    # rho^{-(2k+1)/2} for k = 0..kmax
    rpow = [rs]
    for _ in range(kmax):
        rpow.append(rpow[-1] * inv)
    # monomial cache
    mono_cache = {tuple([0] * ndim): jnp.ones_like(rho)}

    def mono(a):
        if a in mono_cache:
            return mono_cache[a]
        for dd in range(ndim):
            if a[dd] > 0:
                am = list(a); am[dd] -= 1
                v = mono(tuple(am)) * d[..., dd]
                mono_cache[a] = v
                return v
        raise AssertionError

    cols = []
    for g in gammas:
        acc = None
        for (a, k), c in _t_tensor_terms(ndim, g):
            v = jnp.asarray(c, dt) * mono(a) * rpow[k]
            acc = v if acc is None else acc + v
        cols.append(acc)
    return jnp.stack(cols, axis=-1)


# ------------------------------------------------------------- stencil
@lru_cache(maxsize=None)
def stencil_offsets(ndim: int, sep: int):
    """Offsets with sep <= maxcomp <= 2*sep-1, and per-offset packed
    parity bits: bit(b) = 1 iff the pair is NOT covered at the parent
    level, i.e. maxcomp(floor((b + o)/2)) <= sep-1."""
    pad = 2 * sep - 1
    offs, bits = [], []
    for o in itertools.product(range(-pad, pad + 1), repeat=ndim):
        mc = max(abs(c) for c in o)
        if not (sep <= mc <= pad):
            continue
        mask = 0
        for bidx in range(2 ** ndim):
            b = [(bidx >> d) & 1 for d in range(ndim)]
            q = [(b[d] + o[d]) // 2 for d in range(ndim)]
            if max(abs(c) for c in q) <= sep - 1:
                mask |= 1 << bidx
        if mask:
            offs.append(o)
            bits.append(mask)
    return np.asarray(offs, np.int32), np.asarray(bits, np.int32)


@lru_cache(maxsize=None)
def _m2l_index_maps(ndim: int, p: int, q: int):
    """Static index plumbing for the M2L matrix K[beta, alpha] =
    (-1)^|alpha| T_{alpha+beta} / alpha!: for each (beta, alpha), the
    position of alpha+beta in the order-(p+q) gamma table and the
    scalar coefficient."""
    betas, _, bfact = multi_indices(ndim, p)
    alphas, _, afact = multi_indices(ndim, q)
    gammas, glookup, _ = multi_indices(ndim, p + q)
    NB, NA = len(betas), len(alphas)
    gpos = np.zeros((NB, NA), np.int32)
    coef = np.zeros((NB, NA), np.float64)
    for i, b in enumerate(betas):
        for j, a in enumerate(alphas):
            g = tuple(b[d] + a[d] for d in range(ndim))
            gpos[i, j] = glookup[g]
            coef[i, j] = ((-1.0) ** sum(a)) / afact[j]
    return gpos, coef


def m2l_kernels(ndim: int, p: int, q: int, sep: int, s_cell, eps,
                dtype=jnp.float32):
    """Per-parity NORMALIZED M2L conv kernels.

    Returns W [2^D, NL, NM, (K,)*D] with K = 2*(2*sep-1)+1: for target
    parity b, out_L~[t] += sum_o W[b,:,:,o+pad] @ M~[t+o], where M~ are
    cell-normalized multipoles and L~_beta = L_beta s^{|beta|+1}. By the
    homogeneity T_gamma(s d) = s^{-(1+|gamma|)} T_gamma(d) (with
    eps -> eps/s), the normalized kernel is T at the INTEGER offsets
    with eps/s_cell — every entry O(1), no fp32 overflow at high order
    (the physical form overflows at p+q ~ 16)."""
    offs_np, bits_np = stencil_offsets(ndim, sep)
    NO = offs_np.shape[0]
    pad = 2 * sep - 1
    K = 2 * pad + 1
    offs = jnp.asarray(offs_np, dtype)
    d = -offs                                               # [NO, D]
    T = t_tensors(d, jnp.asarray(eps, dtype)
                  / jnp.asarray(s_cell, dtype), ndim, p + q)  # [NO, NG]
    gpos, coef = _m2l_index_maps(ndim, p, q)
    Kmat = T[:, gpos.reshape(-1)].reshape(NO, *gpos.shape)  # [NO, NL, NM]
    Kmat = Kmat * jnp.asarray(coef, dtype)[None]
    NL, NM = gpos.shape
    nb = 2 ** ndim
    bits = bits_np  # [NO] python ints via numpy
    # scatter the NO offsets into the dense [K]*D kernel per parity
    Ws = []
    flat_idx = np.zeros(NO, np.int64)
    for dd in range(ndim):
        flat_idx = flat_idx * K + (offs_np[:, dd] + pad)
    for b in range(nb):
        sel = ((bits >> b) & 1) > 0                         # [NO] static
        contrib = jnp.where(jnp.asarray(sel)[:, None, None], Kmat, 0.0)
        W = jnp.zeros((K ** ndim, NL, NM), dtype)
        W = W.at[jnp.asarray(flat_idx)].set(contrib)
        Ws.append(W.reshape((K,) * ndim + (NL, NM)))
    return jnp.stack(Ws)                                    # [2^D, K.., NL, NM]


# ----------------------------------------------------- shift operators
@lru_cache(maxsize=None)
def _shift_maps(ndim: int, order: int, kind: str):
    """Static structure of the M2M / L2L shift matrices.

    M2M: A'_alpha = sum_{beta<=alpha} C(alpha,beta) t^{alpha-beta} A_beta
    L2L: A'_beta  = sum_{beta'>=beta} t^{beta'-beta}/(beta'-beta)! A_beta'
    Returns list of (row, col, exponent tuple, coeff)."""
    idx, lookup, _ = multi_indices(ndim, order)
    out = []
    for i, a in enumerate(idx):
        for j, b in enumerate(idx):
            if kind == "m2m":
                # row i (parent alpha) from col j (child beta), beta <= alpha
                if all(b[d] <= a[d] for d in range(ndim)):
                    e = tuple(a[d] - b[d] for d in range(ndim))
                    c = math.prod(math.comb(a[d], b[d]) for d in range(ndim))
                    out.append((i, j, e, float(c)))
            else:
                # row i (new beta) from col j (old beta'), beta' >= beta
                if all(b[d] >= a[d] for d in range(ndim)):
                    e = tuple(b[d] - a[d] for d in range(ndim))
                    c = 1.0 / math.prod(math.factorial(b[d] - a[d])
                                        for d in range(ndim))
                    out.append((i, j, e, c))
    return tuple(out)


def shift_matrix(t, ndim: int, order: int, kind: str,
                 halving: bool = False):
    """Dense shift matrix for translation t [D] (jit-friendly): one
    stacked-values scatter, static (row, col) structure.

    halving=True produces the NORMALIZED one-level pyramid shift, with
    `t` in PARENT-cell units (components +-1/4 for an octree step):
      m2m (child->parent): entry *= (1/2)^{|beta_col|}  so that parent
        M~ in parent units comes from child M~ in child units;
      l2l (parent->child): entry *= (1/2)^{|beta_row|+1} mapping parent
        L~ to child L~. All entries stay O(1) at any depth."""
    NC = n_coeffs(ndim, order)
    entries = _shift_maps(ndim, order, kind)
    dt = t.dtype
    mono_cache = {}

    def mono(e):
        if e in mono_cache:
            return mono_cache[e]
        v = jnp.ones((), dt)
        for d in range(ndim):
            for _ in range(e[d]):
                v = v * t[d]
        mono_cache[e] = v
        return v

    idx, _, _ = multi_indices(ndim, order)
    deg = [sum(a) for a in idx]

    def scale(i, j):
        if not halving:
            return 1.0
        if kind == "m2m":
            return 0.5 ** deg[j]
        return 0.5 ** (deg[i] + 1)

    rows = np.asarray([i for i, _, _, _ in entries], np.int32)
    cols = np.asarray([j for _, j, _, _ in entries], np.int32)
    vals = jnp.stack([jnp.asarray(c * scale(i, j), dt) * mono(e)
                      for i, j, e, c in entries])
    M = jnp.zeros((NC * NC,), dt).at[
        jnp.asarray(rows.astype(np.int64) * NC + cols)].set(vals)
    return M.reshape(NC, NC)


# ------------------------------------------------------------- binning
def particle_cells(pos, box_size, depth: int, L0: int):
    """Exact leaf-grid cells [N, D] int32 — THE canonical cell map.

    Every consumer (pyramid binning, L2P, per-pair kernel masks,
    traversal tile ranges) must use this same function so fp boundary
    rounding can never disagree between coverage sides."""
    from . import particles as pmod
    cells = pmod.discretize(pos, box_size, depth)
    return (cells >> jnp.asarray(depth - L0, jnp.uint32)).astype(I32)


def cell_centers_of(cell, box_size, L0: int, dtype):
    s0 = box_size * (2.0 ** -L0)
    return (cell.astype(dtype) + 0.5) * s0 - box_size / 2


def _morton_cell_id(cl0, ndim: int, L0: int):
    """Morton id matching morton.py's bit layout (monotone along the
    sorted particle order): bit b of dim d at position b*ndim+(ndim-1-d)."""
    n = cl0.shape[0]
    mid = jnp.zeros(n, I32)
    for bit in range(L0):
        for d in range(ndim):
            mid = mid | (((cl0[:, d] >> bit) & 1)
                         << (bit * ndim + (ndim - 1 - d)))
    return mid


def _morton_to_rowmajor(ndim: int, L0: int):
    """[ncells] int32: row-major flat index of each Morton-id cell."""
    ncells = (1 << L0) ** ndim
    ar = jnp.arange(ncells, dtype=I32)
    coords = []
    for d in range(ndim):
        c = jnp.zeros(ncells, I32)
        for bit in range(L0):
            c = c | (((ar >> (bit * ndim + (ndim - 1 - d))) & 1) << bit)
        coords.append(c)
    flat = coords[0]
    G = 1 << L0
    for d in range(1, ndim):
        flat = flat * G + coords[d]
    return flat


class Pyramid2(NamedTuple):
    """Cell-centered multipole grids, levels 0..L0 (row-major [G^D, NM])."""
    mom: tuple


def build_pyramid(td, cfg, L0: int, q: int) -> Pyramid2:
    """Bin Morton-sorted particles into leaf-cell multipoles and reduce
    upward with parity shift matrices.

    Scatter-free binning: particles of one cell are contiguous in Morton
    order (dd prefix sums sampled at cell boundaries); only the
    [G^D]-sized Morton->row-major relayout scatters (cells, not
    particles)."""
    ndim = td.pos.shape[1]
    dtype = td.pos.dtype
    n = td.pos.shape[0]
    G = 1 << L0
    ncells = G ** ndim
    alphas, _, _ = multi_indices(ndim, q)
    NM = len(alphas)

    cl0 = particle_cells(td.pos, td.box_size, cfg.max_depth, L0)
    mid = _morton_cell_id(cl0, ndim, L0)
    bounds = su.searchsorted_1d(mid, jnp.arange(ncells + 1, dtype=I32))
    b0, b1 = bounds[:-1], bounds[1:]

    # per-particle delta from own-cell center in CELL UNITS (scale-free
    # moments M~_alpha = sum m (delta/s0)^alpha, |delta/s0| <= 1/2)
    s0 = td.box_size * (2.0 ** -L0)
    delta = (td.pos - cell_centers_of(cl0, td.box_size, L0, dtype)) / s0
    cols = []
    mono_cache = {tuple([0] * ndim): td.mass}

    def mono(a):
        if a in mono_cache:
            return mono_cache[a]
        for d in range(ndim):
            if a[d] > 0:
                am = list(a); am[d] -= 1
                v = mono(tuple(am)) * delta[:, d]
                mono_cache[a] = v
                return v
        raise AssertionError

    for a in alphas:
        cols.append(mono(a))
    vals = jnp.stack(cols, axis=1)                   # [N, NM]
    hi, lo = su.dd_cumsum_cols(vals)
    mom_m = su.segment_sum_from_prefix_cols(hi, lo, b0, b1)   # [ncells, NM]
    # MISCOMPILE GUARD (measured, do not remove): XLA:TPU fuses the dd
    # boundary-gather segment sum into the relayout scatter below and the
    # fused executable writes ZEROS for every cell (v5e, 2026-08-19;
    # benchmarks/ff_bisect3.py bisects it to exactly this edge — barrier
    # after mom_m PASSES, barrier anywhere earlier FAILS). Materializing
    # mom_m ([ncells, NM], a few MB) breaks the bad fusion.
    mom_m = jax.lax.optimization_barrier(mom_m)

    flat = _morton_to_rowmajor(ndim, L0)
    mom_l0 = jnp.zeros((ncells, NM), dtype).at[flat].set(mom_m.astype(dtype))

    moms = {L0: mom_l0}
    for l in range(L0 - 1, -1, -1):
        child = moms[l + 1]
        Gc = 1 << (l + 1)
        # normalized upward pass: t in PARENT units = (b - 0.5)/2 per
        # dim; the halving shift matrix renormalizes child -> parent
        # cell units (entries O(1) at every level)
        parts = None
        shape = (Gc // 2, 2) * ndim
        cview = child.reshape(shape + (NM,))
        for bidx in range(2 ** ndim):
            b = [(bidx >> d) & 1 for d in range(ndim)]
            t = jnp.asarray([(bb - 0.5) * 0.5 for bb in b], dtype)
            S = shift_matrix(t, ndim, q, "m2m", halving=True)  # [NM, NM]
            sl = tuple()
            for d in range(ndim):
                sl = sl + (slice(None), b[d])
            # HIGHEST: TPU einsum defaults to bf16 MXU passes (measured
            # 2.1e-3 max dev vs CPU on identical inputs) — the shift
            # matrices are tiny, full fp32 here is free
            contrib = jnp.einsum("...j,ij->...i", cview[sl], S,
                                 precision=lax.Precision.HIGHEST)
            parts = contrib if parts is None else parts + contrib
        moms[l] = parts.reshape(-1, NM)
    return Pyramid2(mom=tuple(moms[l] for l in range(L0 + 1)))


# ------------------------------------------------------------- M2L conv
def _interleave_parity(parts, ndim: int, lead: int):
    """Merge 2^D per-parity arrays into the full grid.

    parts[bidx] has shape lead_dims + (G/2,)*ndim + tail, with
    bidx = sum_d b_d << d; returns lead_dims + (G,)*ndim + tail where
    out[..., 2x_d + b_d, ...] = parts[bidx][..., x_d, ...]. `lead` is
    the number of leading (non-spatial) axes."""
    cur = jnp.stack(parts, axis=lead)   # [lead.., 2^D, (G/2)*ndim, tail..]
    # unpack the parity axis: reshape 2^D -> (2,)*ndim yields axes in
    # order (b_{D-1}, ..., b_0); record positions in dim order.
    shp = cur.shape
    cur = cur.reshape(shp[:lead] + (2,) * ndim + shp[lead + 1:])
    par_axis = [lead + (ndim - 1 - d) for d in range(ndim)]  # dim d's axis
    spa_axis = [lead + ndim + d for d in range(ndim)]
    ntail = cur.ndim - (lead + 2 * ndim)
    perm = list(range(lead))
    for d in range(ndim):
        perm += [spa_axis[d], par_axis[d]]
    perm += list(range(lead + 2 * ndim, cur.ndim))
    cur = jnp.transpose(cur, perm)
    G = cur.shape[lead] * 2
    newshape = cur.shape[:lead] + (G,) * ndim + cur.shape[lead + 2 * ndim:]
    return cur.reshape(newshape)


def _conv_precision():
    """MXU precision of the M2L convs. 'highest' = full-f32 (6 bf16
    passes); 'high' = 3 passes (~1e-6 relative per dot — inside the
    far-field error budget and ~2x faster on the MXU); 'default' = one
    bf16 pass (too coarse for order >= 4). Env: RAKAU_M2L_PREC."""
    import os
    return {"default": lax.Precision.DEFAULT,
            "high": lax.Precision.HIGH,
            "highest": lax.Precision.HIGHEST}[
        os.environ.get("RAKAU_M2L_PREC", "highest")]


def _parity_conv_zfold(M, W, ndim: int, G: int):
    """out[t] = sum_o W[parity(t), ..o.., :, :] @ M[t+o] via 2-D convs.

    Same math as _parity_conv, but the LAST spatial dim's K offsets are
    folded into the input channels (K*NM) and that dim's cells become
    the conv batch — XLA:TPU lowers 2-D convs far better than 3-D ones,
    and the fatter channel dim amortizes the 128-lane padding of the
    tiny NM/NL operand dims. Requires ndim == 3; _parity_conv remains
    the generic path (ndim 1-2 grids are small anyway).

    The folded tensor Z is K*NM x (G+K-1)^2 x zc floats, K x the source
    grid — at G=128 order 6 sep 3 a full-batch fold is ~5 GB and OOMs
    the chip's HBM (measured), so the conv batch (output z-planes) is
    processed in power-of-two chunks bounded by ~512 MB of folded
    input; chunk starts are static so each chunk is a plain strided
    slice + one conv."""
    NM = M.shape[-1]
    NL = W.shape[-2]
    K = W.shape[1]
    pad = (K - 1) // 2
    M3 = jnp.moveaxis(M.reshape((G,) * 3 + (NM,)), -1, 0)   # [NM, G, G, G]
    # one extra zero z-plane: the last chunk's strided windows may read
    # index (G + K - 2) + 1 when bz = 1
    Mp = jnp.pad(M3, ((0, 0),) + ((pad, pad),) * 2 + ((pad, pad + 1),))
    Gh = G // 2
    dn = lax.conv_dimension_numbers(
        (Gh, K * NM, G - 1 + K, G - 1 + K), (NL, K * NM, K, K),
        ("NCHW", "OIHW", "NCHW"))
    plane_bytes = K * NM * (G - 1 + K) ** 2 * 4
    budget = int(os.environ.get("RAKAU_M2L_ZCHUNK_MB", 512)) << 20
    zc = Gh
    while zc > 1 and zc * plane_bytes > budget:
        zc //= 2
    outs = {}
    for bz in range(2):
        chunks = {0: [], 1: [], 2: [], 3: []}
        for c in range(0, Gh, zc):
            # z-fold: Z[(k, a), x, y, z'] = Mp[a, x, y, 2 z' + bz + k]
            zsl = [Mp[:, :, :, 2 * c + bz + k:2 * c + bz + k + 2 * zc:2]
                   for k in range(K)]
            Z = jnp.concatenate(zsl, axis=0)    # [K*NM, G+2p, G+2p, zc]
            Z = jnp.moveaxis(Z, -1, 0)          # [zc, K*NM, G+2p, G+2p]
            for bx in range(2):
                for by in range(2):
                    # fold W's kz axis into channels, k major over NM
                    # (the concat order above)
                    Wb = jnp.moveaxis(W[bx | (by << 1) | (bz << 2)],
                                      (3, 4), (0, 1))   # [NL,NM,kx,ky,kz]
                    Wb = jnp.moveaxis(Wb, -1, 1)        # [NL,kz,NM,kx,ky]
                    Wb = Wb.reshape(NL, K * NM, K, K)
                    lhs = Z[:, :, bx:bx + G - 1 + K, by:by + G - 1 + K]
                    chunks[bx | (by << 1)].append(lax.conv_general_dilated(
                        lhs, Wb, window_strides=(2, 2), padding="VALID",
                        dimension_numbers=dn,
                        precision=_conv_precision()))  # [zc, NL, G/2, G/2]
        for bxy, parts in chunks.items():
            outs[bxy | (bz << 2)] = (parts[0] if len(parts) == 1
                                     else jnp.concatenate(parts, axis=0))
    full = jnp.zeros((G, G, G, NL), M.dtype)
    for bidx, o in outs.items():
        bx, by, bz = bidx & 1, (bidx >> 1) & 1, (bidx >> 2) & 1
        o = jnp.moveaxis(o, (0, 1), (-2, -1))   # [x', y', z', NL]
        full = full.at[bx::2, by::2, bz::2].set(o)
    return full.reshape(-1, NL)


def _parity_conv(M, W, ndim: int, G: int):
    """out[t] = sum_o W[parity(t), ..o.., :, :] @ M[t+o] via 2^D strided
    convs. M [G^D, NM]; W [2^D, (K,)*D, NL, NM]; returns [G^D, NL]."""
    import os
    if (ndim == 3 and G >= 4
            and os.environ.get("RAKAU_M2L_CONV", "2d") == "2d"):
        return _parity_conv_zfold(M, W, ndim, G)
    NM = M.shape[-1]
    NL = W.shape[-2]
    K = W.shape[1]
    pad = (K - 1) // 2
    lhs = M.reshape((1,) + (G,) * ndim + (NM,))
    # NHWC-ish: batch, spatial..., channel
    lhs = jnp.moveaxis(lhs, -1, 1)                   # [1, NM, G...]
    lhsp = jnp.pad(lhs, ((0, 0), (0, 0)) + ((pad, pad),) * ndim)
    dn = lax.conv_dimension_numbers(
        lhs.shape, (NL, NM) + (K,) * ndim,
        (("NC" + "DHW"[3 - ndim:]),
         ("OI" + "DHW"[3 - ndim:]),
         ("NC" + "DHW"[3 - ndim:])))
    outs = {}
    for bidx in range(2 ** ndim):
        b = [(bidx >> d) & 1 for d in range(ndim)]
        # out_b[x] = sum_k lhsp[2x + b_d + k] W_b[k]; VALID, stride 2
        sl = (slice(None), slice(None))
        for d in range(ndim):
            sl = sl + (slice(b[d], b[d] + G - 1 + K),)
        rhs = jnp.moveaxis(W[bidx], (-2, -1), (0, 1))  # [NL, NM, K...]
        outs[bidx] = lax.conv_general_dilated(
            lhsp[sl], rhs, window_strides=(2,) * ndim,
            padding="VALID", dimension_numbers=dn,
            precision=_conv_precision())               # [1, NL, G/2...]
    full = _interleave_parity([outs[b] for b in range(2 ** ndim)],
                              ndim, lead=2)            # [1, NL, G...]
    return jnp.moveaxis(full, 1, -1).reshape(-1, NL)


def dense_far_field(pyr: Pyramid2, cfg, L0: int, box_size, eps,
                    p: int, q: int, sep: int):
    """M2L conv at every level + L2L chain; returns NORMALIZED leaf
    local coefficients [G^D, NL] about cell centers (L~_beta =
    L_beta s0^{|beta|+1}; l2p_particles re-dimensionalizes)."""
    ndim = cfg.ndim
    dtype = pyr.mom[0].dtype
    NL = n_coeffs(ndim, p)
    Lcur = None
    for l in range(2, L0 + 1):
        G = 1 << l
        s_l = box_size * (2.0 ** -l)
        W = m2l_kernels(ndim, p, q, sep, s_l, eps, dtype)
        Ll = _parity_conv(pyr.mom[l], W, ndim, G)
        if Lcur is not None:
            # L2L: parent expansions recentred to children; t in PARENT
            # units = (b - 0.5)/2, halving shift renormalizes the units
            Gp = G // 2
            Lp = Lcur.reshape((Gp,) * ndim + (NL,))
            shifted = []
            for bidx in range(2 ** ndim):
                b = [(bidx >> d) & 1 for d in range(ndim)]
                t = jnp.asarray([(bb - 0.5) * 0.5 for bb in b], dtype)
                S = shift_matrix(t, ndim, p, "l2l", halving=True)
                shifted.append(jnp.einsum("...j,ij->...i", Lp, S,
                                          precision=lax.Precision.HIGHEST))
            cur = _interleave_parity(shifted, ndim, lead=0)  # [G.., NL]
            Ll = Ll + cur.reshape(-1, NL)
        Lcur = Ll
    if Lcur is None:
        G = 1 << L0
        Lcur = jnp.zeros((G ** ndim, NL), dtype)
    return Lcur


# ---------------------------------------------------------------- L2P
def l2p_particles(Lleaf, cells, pos, box_size, L0: int, G_grav, p: int):
    """Per-particle evaluation of the (normalized) leaf-cell locals.

    Lleaf [ncells, NL] row-major NORMALIZED coefficients (L~_beta =
    L_beta s0^{|beta|+1}); cells [N, D] each particle's leaf cell;
    pos [N, D]. Returns (acc [N, D], pot [N]) scaled by G.
    With u = s/s0: pot = -(G/s0) sum L~_b u^b / b!,
    acc_d = (G/s0^2) sum_{|b|<=p-1} L~_{b+e_d} u^b / b!."""
    ndim = pos.shape[1]
    dtype = pos.dtype
    betas, lookup, fact = multi_indices(ndim, p)
    G0 = 1 << L0
    flat = cells[:, 0]
    for d in range(1, ndim):
        flat = flat * G0 + cells[:, d]
    L = Lleaf[flat]                                   # [N, NL] gather
    s0 = box_size * (2.0 ** -L0)
    s = (pos - cell_centers_of(cells, box_size, L0, dtype)) / s0

    mono_cache = {tuple([0] * ndim): jnp.ones(pos.shape[0], dtype)}

    def mono(b):
        if b in mono_cache:
            return mono_cache[b]
        for d in range(ndim):
            if b[d] > 0:
                bm = list(b); bm[d] -= 1
                v = mono(tuple(bm)) * s[:, d]
                mono_cache[b] = v
                return v
        raise AssertionError

    psi = None
    accs = [None] * ndim
    for i, b in enumerate(betas):
        w = mono(b) / jnp.asarray(fact[i], dtype)
        term = L[:, i] * w
        psi = term if psi is None else psi + term
        if sum(b) <= p - 1:
            for d in range(ndim):
                bd = list(b); bd[d] += 1
                j = lookup[tuple(bd)]
                t = L[:, j] * w
                accs[d] = t if accs[d] is None else accs[d] + t
    Gg = jnp.asarray(G_grav, dtype)
    return (Gg / (s0 * s0)) * jnp.stack(accs, axis=-1), -(Gg / s0) * psi


# ------------------------------------------------------------ top level
def effective_grid_level(cfg, n: int) -> int:
    """Leaf-grid level for grid2: occupancy-targeted, memory-capped,
    decoupled from ncrit.

    gwalk exception: gwalk clips target tiles at leaf-grid cells (its
    pool-row coverage drop needs single-cell tiles), so the auto level
    tracks tile size (~n/ncrit cells) like farfield='grid' — a deep
    occupancy-32 grid would shatter every ncrit-tile into ~32-particle
    fragments. grid2's cell-normalized far field is scale-free, so the
    accuracy rungs (order, sep) are unchanged by the coarser level; set
    grid_level explicitly to override."""
    if cfg.grid_level is not None:
        return cfg.grid_level
    cap = {1: 21, 2: 10, 3: 7}[cfg.ndim]   # <= ~2M cells
    if cfg.traversal_mode == "gwalk":
        if n <= cfg.ncrit:
            return 0
        l0 = int(math.floor(math.log(max(n / cfg.ncrit, 1.0),
                                     2 ** cfg.ndim)))
        return max(0, min(l0, cap, cfg.max_depth))
    if n <= max(cfg.grid_occupancy, 1):
        return 0
    l0 = int(round(math.log(n / max(cfg.grid_occupancy, 1), 2 ** cfg.ndim)))
    return max(0, min(l0, cap, cfg.max_depth))


def far_field(td, cfg, eps, G_grav):
    """Full grid2 far field: (acc_far [N, D], pot_far [N]) covering all
    pairs with leaf-cell separation >= cfg.grid_sep. Jittable; cfg
    static."""
    n, ndim = td.pos.shape
    L0 = effective_grid_level(cfg, n)
    if L0 <= 0:
        z = jnp.zeros_like(td.pos)
        return z, jnp.zeros(n, td.pos.dtype)
    p = cfg.local_order
    q = (cfg.grid_multipole_order if cfg.grid_multipole_order is not None
         else cfg.local_order)
    pyr = build_pyramid(td, cfg, L0, q)
    Lleaf = dense_far_field(pyr, cfg, L0, td.box_size, eps, p, q,
                            cfg.grid_sep)
    cells = particle_cells(td.pos, td.box_size, cfg.max_depth, L0)
    return l2p_particles(Lleaf, cells, td.pos, td.box_size, L0, G_grav, p)

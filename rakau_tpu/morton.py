"""Morton (Z-order) encoding on dual-uint32 keys.

The reference vendors Baert's libmorton (`include/rakau/detail/libmorton/`,
SURVEY.md C1) for 63-bit 3D / 62-bit 2D codes on uint64. TPUs have no fast
int64, so codes here live in a (hi, lo) pair of uint32 arrays, sorted
lexicographically with `lax.sort(num_keys=2)`. All shift amounts are static
Python ints (the level loops are unrolled at trace time), so the pair-word
shift helpers below specialize at trace time to plain uint32 ops.

Bit layout: the code occupies bits [0, depth*ndim) LSB-aligned; bit b of
dimension d lands at position b*ndim + (ndim-1-d), i.e. dimension 0 is the
most significant within each bit group. The prefix of a code at tree level L
is `code >> (ndim*(max_depth - L))`.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32


def pair_shl(hi, lo, s: int):
    """(hi, lo) << s for static 0 <= s < 32."""
    if s == 0:
        return hi, lo
    assert 0 < s < 32
    return (hi << s) | (lo >> (32 - s)), lo << s


def pair_shr(hi, lo, s: int):
    """(hi, lo) >> s for static 0 <= s < 64."""
    if s == 0:
        return hi, lo
    if s >= 32:
        lo_out = hi if s == 32 else (hi >> (s - 32))
        return jnp.zeros_like(hi), lo_out
    return hi >> s, (lo >> s) | (hi << (32 - s))


def pair_shr_dyn(hi, lo, s):
    """(hi, lo) >> s for a TRACED shift s in [0, 63] (used by the
    fori_loop tree build, where the per-level shift is a loop variable).
    Shift amounts are clamped to [0, 31] per word so XLA's
    undefined-behavior range is never hit."""
    s = jnp.asarray(s, U32)
    ge32 = s >= U32(32)
    s1 = jnp.where(ge32, s - U32(32), s)              # [0, 31]
    carry = jnp.where(s1 == 0, U32(0), hi << ((U32(32) - s1) & U32(31)))
    new_hi = jnp.where(ge32, U32(0), hi >> s1)
    new_lo = jnp.where(ge32, hi >> s1, (lo >> s1) | carry)
    return new_hi, new_lo


def _spread_bits(v, ndim: int, depth: int):
    """Spread the low `depth` bits of v so bit b lands at position b*ndim.

    Returns an LSB-aligned (hi, lo) uint32 pair. Uses magic-number bit tricks
    per 32-bit word where possible; positions >= 32 accumulate into hi.
    """
    v = v.astype(U32)
    hi = jnp.zeros_like(v)
    lo = jnp.zeros_like(v)
    for b in range(depth):
        p = b * ndim
        bit = (v >> b) & U32(1)
        if p < 32:
            lo = lo | (bit << p)
        else:
            hi = hi | (bit << (p - 32))
    return hi, lo


def encode(cells, ndim: int, depth: int):
    """cells: [..., ndim] uint32 in [0, 2**depth) -> (hi, lo) uint32 codes."""
    assert cells.shape[-1] == ndim
    hi = jnp.zeros(cells.shape[:-1], U32)
    lo = jnp.zeros(cells.shape[:-1], U32)
    for d in range(ndim):
        shi, slo = _spread_bits(cells[..., d], ndim, depth)
        phi, plo = pair_shl(shi, slo, ndim - 1 - d)
        hi = hi | phi
        lo = lo | plo
    return hi, lo


def decode(hi, lo, ndim: int, depth: int):
    """Inverse of encode: (hi, lo) -> [..., ndim] uint32 cells."""
    dims = []
    for d in range(ndim):
        v = jnp.zeros_like(lo)
        for b in range(depth):
            p = b * ndim + (ndim - 1 - d)
            if p < 32:
                bit = (lo >> p) & U32(1)
            else:
                bit = (hi >> (p - 32)) & U32(1)
            v = v | (bit << b)
        dims.append(v)
    return jnp.stack(dims, axis=-1)


def encode_np(cells: np.ndarray, ndim: int, depth: int) -> np.ndarray:
    """NumPy uint64 reference implementation (tests/oracle only)."""
    cells = np.asarray(cells, dtype=np.uint64)
    code = np.zeros(cells.shape[:-1], dtype=np.uint64)
    for d in range(ndim):
        for b in range(depth):
            p = b * ndim + (ndim - 1 - d)
            code |= ((cells[..., d] >> np.uint64(b)) & np.uint64(1)) << np.uint64(p)
    return code


def to_uint64_np(hi, lo) -> np.ndarray:
    """Combine device (hi, lo) words into numpy uint64 (host-side checks)."""
    return (np.asarray(hi, dtype=np.uint64) << np.uint64(32)) | np.asarray(
        lo, dtype=np.uint64)

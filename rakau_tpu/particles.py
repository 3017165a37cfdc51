"""Particle store, box handling, discretization, and API-boundary validation.

Reference parity: rakau keeps particles in SoA aligned vectors
(`di_aligned_allocator`, SURVEY.md C5), centers its domain box on the origin
with a user-given or auto-computed `box_size`, and throws on non-finite or
out-of-box coordinates at the API boundary (SURVEY.md C2, C18). Here
particles are jnp arrays ([N, ndim] positions + [N] masses); validation is a
device reduction surfaced as a Python exception by the host wrapper — never
checks inside hot kernels.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .morton import U32


def auto_box_size(pos) -> jnp.ndarray:
    """Smallest origin-centered box containing all positions, with margin.

    Mirrors the reference's auto box sizing from coordinate extrema
    (SURVEY.md C2). Margin keeps boundary particles strictly inside after
    discretization rounding.
    """
    m = jnp.max(jnp.abs(pos))
    m = jnp.where(m > 0, m, jnp.ones_like(m))
    return 2.0 * m * jnp.asarray(1.0 + 1e-4, pos.dtype)


def validate(pos, mass, box_size):
    """Return a dict of violation flags (device scalars).

    Checked at the API boundary only: non-finite coords/masses, coords
    outside the origin-centered box (reference throws std::invalid_argument/
    std::domain_error analogs, SURVEY.md C18).
    """
    half = jnp.asarray(box_size, pos.dtype) / 2
    return {
        "nonfinite_pos": jnp.any(~jnp.isfinite(pos)),
        "nonfinite_mass": jnp.any(~jnp.isfinite(mass)),
        "out_of_box": jnp.any(jnp.abs(pos) >= half),
        "bad_shapes": jnp.asarray(pos.shape[0] != mass.shape[0]),
    }


def raise_on_invalid(pos, mass, box_size):
    flags = {k: bool(v) for k, v in validate(pos, mass, box_size).items()}
    if flags["bad_shapes"]:
        raise ValueError(
            f"positions ({pos.shape[0]}) and masses ({mass.shape[0]}) "
            "must have the same length")
    if flags["nonfinite_pos"]:
        raise ValueError("non-finite coordinate detected")
    if flags["nonfinite_mass"]:
        raise ValueError("non-finite mass detected")
    if flags["out_of_box"]:
        raise ValueError(
            "coordinate outside the origin-centered box of size "
            f"{float(box_size)} detected")


def discretize(pos, box_size, depth: int):
    """Map positions in [-box/2, box/2) to integer cells in [0, 2**depth).

    [N, ndim] float -> [N, ndim] uint32. Clamps to the grid so rounding at
    the upper box face cannot escape the key space (the reference instead
    validates-then-casts; clamping is equivalent post-validation).
    """
    ncells = float(2 ** depth)
    half = jnp.asarray(box_size, pos.dtype) / 2
    u = (pos + half) / jnp.asarray(box_size, pos.dtype)  # [0, 1)
    c = jnp.floor(u * jnp.asarray(ncells, pos.dtype))
    c = jnp.clip(c, 0.0, ncells - 1.0)
    return c.astype(U32)


def cell_center(cells, box_size, depth: int, level):
    """Geometric center of the level-`level` cell containing each particle.

    cells: [N, ndim] uint32 at full `depth` resolution; `level` may be a
    traced loop variable. Used for the bh_geom MAC's COM-to-cell-center
    offset delta (SURVEY.md C6).
    """
    shift = jnp.asarray(depth, jnp.int32) - jnp.asarray(level, jnp.int32)
    shift = shift.astype(U32)
    lv = jnp.asarray(level, box_size.dtype)
    if shift.ndim and shift.ndim < cells.ndim:
        shift = shift[..., None]
        lv = lv[..., None]
    coarse = (cells >> shift).astype(box_size.dtype)
    cell_sz = box_size * jnp.exp2(-lv)
    return (coarse + 0.5) * cell_sz - box_size / 2


def plummer(key, n: int, ndim: int = 3, dtype=jnp.float32, a: float = 1.0,
            clip_radius: float = 10.0):
    """Plummer-sphere sample (benchmark config #0; reference benchmark
    particle generators live in `benchmark/` utils, SURVEY.md C20)."""
    import jax
    k1, k2, k3 = jax.random.split(key, 3)
    u = jax.random.uniform(k1, (n,), dtype=jnp.float32, minval=1e-6,
                           maxval=1.0 - 1e-6)
    r = a / jnp.sqrt(u ** (-2.0 / 3.0) - 1.0)
    r = jnp.minimum(r, clip_radius * a)
    vec = jax.random.normal(k2, (n, ndim), dtype=jnp.float32)
    vec = vec / jnp.linalg.norm(vec, axis=1, keepdims=True)
    pos = (vec * r[:, None]).astype(dtype)
    mass = jnp.full((n,), 1.0 / n, dtype=dtype)
    del k3
    return pos, mass


def uniform_cube(key, n: int, ndim: int = 3, dtype=jnp.float32,
                 box: float = 1.0):
    import jax
    pos = jax.random.uniform(key, (n, ndim), dtype=jnp.float32,
                             minval=-box / 2 * 0.999, maxval=box / 2 * 0.999)
    mass = jnp.full((n,), 1.0 / n, dtype=dtype)
    return pos.astype(dtype), mass


def cold_sphere(key, n: int, ndim: int = 3, dtype=jnp.float32,
                radius: float = 1.0):
    """Uniform-density cold sphere (benchmark config #2)."""
    import jax
    k1, k2 = jax.random.split(key)
    vec = jax.random.normal(k1, (n, ndim), dtype=jnp.float32)
    vec = vec / jnp.linalg.norm(vec, axis=1, keepdims=True)
    r = radius * jax.random.uniform(k2, (n,), dtype=jnp.float32) ** (1.0 / ndim)
    pos = (vec * r[:, None]).astype(dtype)
    mass = jnp.full((n,), 1.0 / n, dtype=dtype)
    return pos, mass


def disk_galaxy(key, n: int, dtype=jnp.float32, rscale: float = 1.0,
                zscale: float = 0.05):
    """Exponential-disk sample (benchmark config #3). 3D only."""
    import jax
    k1, k2, k3 = jax.random.split(key, 3)
    u = jax.random.uniform(k1, (n,), dtype=jnp.float32, minval=1e-6,
                           maxval=1.0 - 1e-6)
    # Inverse CDF of r*exp(-r) sampled via two exponentials (gamma(2)).
    r = -rscale * (jnp.log(u) + jnp.log(jax.random.uniform(
        k3, (n,), dtype=jnp.float32, minval=1e-6, maxval=1.0 - 1e-6)))
    r = jnp.minimum(r, 20.0 * rscale)
    phi = jax.random.uniform(k2, (n,), dtype=jnp.float32,
                             minval=0.0, maxval=2 * np.pi)
    z = zscale * jax.random.normal(jax.random.fold_in(k2, 1), (n,),
                                   dtype=jnp.float32)
    pos = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=1)
    mass = jnp.full((n,), 1.0 / n, dtype=dtype)
    return pos.astype(dtype), mass

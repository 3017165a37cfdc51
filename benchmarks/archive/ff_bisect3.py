"""Find the fusion that zeroes build_pyramid on the chip (round 3).

ff_bisect2 proved every leaf-binning primitive correct in isolation
(mom_l0 max dev 2e-4 vs CPU when the stage graph returns its
intermediates), while the production build_pyramid — the same ops fused
into one output — returns ZERO at every level. Classic symptom of an
XLA:TPU miscompile that depends on fusion choices. This probe compiles
variants of the same computation with a lax.optimization_barrier
inserted at successive points (and the compilation cache disabled so
every variant is a fresh compile) and reports the root monopole, which
must equal sum(mass) = 1.

Run (needs the chip): python benchmarks/ff_bisect3.py
Env: N (65536), ORDER (4), STAGES (comma list of barrier points).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rakau_tpu.utils.tpu import ensure_tpu  # noqa: E402
ensure_tpu()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_enable_compilation_cache", False)

from rakau_tpu import build, grid2, particles, scan_utils as su  # noqa: E402
from rakau_tpu.config import TreeConfig  # noqa: E402

I32 = jnp.int32
N = int(os.environ.get("N", 65536))
ORDER = int(os.environ.get("ORDER", 4))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def pyramid_variant(pos, mass, box_size, max_depth: int, L0: int, q: int,
                    barrier: str):
    """grid2.build_pyramid's body with one optimization_barrier at
    `barrier` in {none, cl0, mid, bounds, vals, prefix, mom_m, mom_l0,
    each}. Returns (root_mono, leaf_mono_sum, leaf_nonzero)."""
    ndim = pos.shape[1]
    dtype = pos.dtype
    G = 1 << L0
    ncells = G ** ndim
    alphas, _, _ = grid2.multi_indices(ndim, q)

    def bar(x, name):
        if barrier in (name, "each"):
            return jax.lax.optimization_barrier(x)
        return x

    cl0 = bar(grid2.particle_cells(pos, box_size, max_depth, L0), "cl0")
    mid = bar(grid2._morton_cell_id(cl0, ndim, L0), "mid")
    bounds = bar(su.searchsorted_1d(mid, jnp.arange(ncells + 1, dtype=I32)),
                 "bounds")
    b0, b1 = bounds[:-1], bounds[1:]

    s0 = box_size * (2.0 ** -L0)
    delta = (pos - grid2.cell_centers_of(cl0, box_size, L0, dtype)) / s0
    cols = []
    mono_cache = {tuple([0] * ndim): mass}

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
    vals = bar(jnp.stack(cols, axis=1), "vals")
    hi, lo = bar(su.dd_cumsum_cols(vals), "prefix")
    mom_m = bar(su.segment_sum_from_prefix_cols(hi, lo, b0, b1), "mom_m")
    flat = grid2._morton_to_rowmajor(ndim, L0)
    NM = vals.shape[1]
    mom_l0 = bar(jnp.zeros((ncells, NM), dtype).at[flat].set(
        mom_m.astype(dtype)), "mom_l0")

    moms = {L0: mom_l0}
    for l in range(L0 - 1, -1, -1):
        child = moms[l + 1]
        Gc = 1 << (l + 1)
        parts = None
        shape = (Gc // 2, 2) * ndim
        cview = child.reshape(shape + (NM,))
        for bidx in range(2 ** ndim):
            b = [(bidx >> d) & 1 for d in range(ndim)]
            t = jnp.asarray([(bb - 0.5) * 0.5 for bb in b], dtype)
            S = grid2.shift_matrix(t, ndim, q, "m2m", halving=True)
            sl = tuple()
            for d in range(ndim):
                sl = sl + (slice(None), b[d])
            contrib = jnp.einsum("...j,ij->...i", cview[sl], S)
            parts = contrib if parts is None else parts + contrib
        moms[l] = parts.reshape(-1, NM)
    return (moms[0][0, 0], jnp.sum(mom_l0[:, 0]),
            jnp.sum(mom_l0[:, 0] != 0))


def main():
    log("devices:", jax.devices())
    cfg = TreeConfig(traversal_mode="lmac", farfield="grid2",
                     local_order=ORDER, grid_sep=2, max_leaf_n=32,
                     ncrit=512, max_depth=14)
    pos, mass = particles.plummer(jax.random.PRNGKey(0), N)
    td = jax.jit(build.build_tree, static_argnames=("cfg",))(pos, mass, cfg)
    td = jax.block_until_ready(td)
    L0 = int(os.environ.get("L0", grid2.effective_grid_level(cfg, N)))
    q = cfg.local_order
    msum = float(np.asarray(jnp.sum(td.mass)))
    log(f"N={N} order={ORDER} L0={L0} sum(mass)={msum:.6f}")

    stages = os.environ.get(
        "STAGES", "none,mom_l0,mom_m,prefix,bounds,each").split(",")
    fn = jax.jit(pyramid_variant,
                 static_argnames=("max_depth", "L0", "q", "barrier"))
    for st in [s.strip() for s in stages if s.strip()]:
        t0 = time.time()
        root, leaf_sum, leaf_nz = jax.block_until_ready(
            fn(td.pos, td.mass, td.box_size, cfg.max_depth, L0, q, st))
        root = float(np.asarray(root))
        ok = abs(root - msum) < 1e-3 * abs(msum)
        log(("PASS" if ok else "FAIL"),
            f"barrier={st}: root={root:.6f} leaf_sum="
            f"{float(np.asarray(leaf_sum)):.6f} "
            f"leaf_nz={int(np.asarray(leaf_nz))} "
            f"wall={time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()

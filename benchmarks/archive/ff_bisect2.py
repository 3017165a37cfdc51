"""Drill into build_pyramid's leaf binning on the chip (round 3).

ff_bisect found the grid2 pyramid ZERO at every level on the TPU at
65k/L0=4 (probe_pyr's 8k/L0=3 ladder passed in round 2). This probe
stages the leaf-binning chain — particle_cells -> _morton_cell_id ->
searchsorted bounds -> moment columns -> dd_cumsum_cols ->
segment_sum_from_prefix_cols -> Morton->row-major relayout — in ONE
jitted function returning every intermediate, and diffs each against
the CPU backend. Also re-runs the upward M2M one level at a time.

Run (needs the chip): python benchmarks/ff_bisect2.py
Env: N (65536), ORDER (4), L0 (auto).
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

from rakau_tpu import build, grid2, particles, scan_utils as su  # noqa: E402
from rakau_tpu.config import TreeConfig  # noqa: E402

I32 = jnp.int32
N = int(os.environ.get("N", 65536))
ORDER = int(os.environ.get("ORDER", 4))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def dev(name, got, want, tol=1e-3):
    got = np.asarray(got)
    want = np.asarray(want)
    scale = float(np.max(np.abs(want))) + 1e-30
    err = float(np.max(np.abs(got.astype(np.float64)
                              - want.astype(np.float64)))) / scale
    log(("PASS" if err < tol else "FAIL"),
        f"{name}: max rel dev {err:.3e} (scale {scale:.3e})")
    return err < tol


def leaf_stage(pos, mass, box_size, max_depth: int, L0: int, q: int):
    """build_pyramid's leaf binning, returning all intermediates."""
    ndim = pos.shape[1]
    dtype = pos.dtype
    G = 1 << L0
    ncells = G ** ndim
    alphas, _, _ = grid2.multi_indices(ndim, q)

    cl0 = grid2.particle_cells(pos, box_size, max_depth, L0)
    mid = grid2._morton_cell_id(cl0, ndim, L0)
    bounds = su.searchsorted_1d(mid, jnp.arange(ncells + 1, dtype=I32))
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
    vals = jnp.stack(cols, axis=1)
    hi, lo = su.dd_cumsum_cols(vals)
    mom_m = su.segment_sum_from_prefix_cols(hi, lo, b0, b1)
    flat = grid2._morton_to_rowmajor(ndim, L0)
    mom_l0 = jnp.zeros((ncells, vals.shape[1]), dtype).at[flat].set(
        mom_m.astype(dtype))
    return dict(cl0=cl0, mid=mid, bounds=bounds, vals=vals,
                pre=hi + lo, mom_m=mom_m, flat=flat, mom_l0=mom_l0)


def main():
    log("devices:", jax.devices())
    cpu = jax.devices("cpu")[0]
    cfg = TreeConfig(traversal_mode="lmac", farfield="grid2",
                     local_order=ORDER, grid_sep=2, max_leaf_n=32,
                     ncrit=512, max_depth=14)
    pos, mass = particles.plummer(jax.random.PRNGKey(0), N)
    td = jax.jit(build.build_tree, static_argnames=("cfg",))(pos, mass, cfg)
    td = jax.block_until_ready(td)
    L0 = int(os.environ.get("L0", grid2.effective_grid_level(cfg, N)))
    q = cfg.local_order
    log(f"N={N} order={ORDER} L0={L0}")
    td_c = jax.device_put(td, cpu)

    fn = jax.jit(leaf_stage, static_argnames=("max_depth", "L0", "q"))
    t0 = time.time()
    out_d = jax.block_until_ready(
        fn(td.pos, td.mass, td.box_size, cfg.max_depth, L0, q))
    log(f"device leaf stage done {time.time()-t0:.1f}s")
    with jax.default_device(cpu):
        out_c = jax.block_until_ready(
            fn(td_c.pos, td_c.mass, td_c.box_size, cfg.max_depth, L0, q))

    for k in ("cl0", "mid", "bounds", "flat"):
        dev(k, out_d[k], out_c[k], tol=1e-9)
    for k in ("vals", "pre", "mom_m", "mom_l0"):
        dev(k, out_d[k], out_c[k])

    # upward M2M, one level at a time, CPU leaf moments fed to both
    def up_one(child, L0: int, l: int, q: int, ndim: int):
        moms = {l + 1: child}
        # replicate ONE upward step of build_pyramid
        dtype = child.dtype
        NM = child.shape[1]
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
        return parts.reshape(-1, NM)

    ndim = td.pos.shape[1]
    up = jax.jit(up_one, static_argnames=("L0", "l", "q", "ndim"))
    child_c = out_c["mom_l0"]
    child_d = jax.device_put(np.asarray(child_c), jax.devices()[0])
    for l in range(L0 - 1, -1, -1):
        t0 = time.time()
        pd = jax.block_until_ready(up(child_d, L0, l, q, ndim))
        with jax.default_device(cpu):
            pc = jax.block_until_ready(up(child_c, L0, l, q, ndim))
        dev(f"m2m level {l+1}->{l}", pd, np.asarray(pc))
        child_d = jax.device_put(np.asarray(pc), jax.devices()[0])
        child_c = pc


if __name__ == "__main__":
    main()

"""TPU probe for the grid2 pyramid-zeros bug.

Round-2 session 2 observed build_pyramid returning all-zero multipole
grids ON TPU while being correct on CPU. Suspects: dd_cumsum two-level
chunked scan, searchsorted_1d, or the Morton-id relayout on the axon
backend. This probe isolates each primitive and prints PASS/FAIL lines.

Run: python benchmarks/probe_pyr.py  (one process; keeps the axon claim).
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


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def check(name, got, want, tol=1e-4):
    got = np.asarray(got)
    want = np.asarray(want)
    err = float(np.max(np.abs(got - want))) if got.size else 0.0
    scale = max(1.0, float(np.max(np.abs(want))) if want.size else 1.0)
    ok = err / scale < tol
    log(("PASS" if ok else "FAIL"), name, f"maxabs={err:.3e} scale={scale:.3e}")
    return ok


def main():
    log("devices:", jax.devices())
    rng = np.random.default_rng(0)

    # 1. dd_cumsum small (single-scan path)
    v = rng.standard_normal(5000).astype(np.float32)
    hi, lo = jax.jit(su.dd_cumsum)(jnp.asarray(v))
    check("dd_cumsum small", np.asarray(hi) + np.asarray(lo),
          np.cumsum(v.astype(np.float64)).astype(np.float32))

    # 2. dd_cumsum large (two-level chunked path: n > 16384)
    v = rng.standard_normal(50000).astype(np.float32)
    hi, lo = jax.jit(su.dd_cumsum)(jnp.asarray(v))
    check("dd_cumsum large", np.asarray(hi) + np.asarray(lo),
          np.cumsum(v.astype(np.float64)).astype(np.float32))

    # 3. dd_cumsum_cols + segment_sum_from_prefix_cols
    v2 = rng.standard_normal((50000, 4)).astype(np.float32)
    b0 = np.arange(0, 50000, 500, dtype=np.int32)
    b1 = np.minimum(b0 + 500, 50000).astype(np.int32)
    hi, lo = jax.jit(su.dd_cumsum_cols)(jnp.asarray(v2))
    seg = jax.jit(su.segment_sum_from_prefix_cols)(
        hi, lo, jnp.asarray(b0), jnp.asarray(b1))
    want = np.add.reduceat(v2.astype(np.float64), b0, axis=0)
    check("segment_sum_cols", seg, want.astype(np.float32))

    # 4. searchsorted_1d
    a = np.sort(rng.integers(0, 1000, 4096).astype(np.int32))
    q = rng.integers(-5, 1005, 512).astype(np.int32)
    got = jax.jit(su.searchsorted_1d)(jnp.asarray(a), jnp.asarray(q))
    check("searchsorted_1d", got, np.searchsorted(a, q, side="left"),
          tol=1e-9)

    # 5. build_pyramid mass conservation + CPU cross-check (8k plummer)
    n = 8192
    key = jax.random.PRNGKey(0)
    pos, mass = particles.plummer(key, n)
    cfg = TreeConfig(traversal_mode="lmac", farfield="grid2")
    build_jit = jax.jit(build.build_tree, static_argnames=("cfg",))
    td = jax.block_until_ready(build_jit(pos, mass, cfg))
    L0 = grid2.effective_grid_level(cfg, n)
    log("L0 =", L0)
    pyr_jit = jax.jit(grid2.build_pyramid, static_argnames=("cfg", "L0", "q"))
    pyr = jax.block_until_ready(pyr_jit(td, cfg, L0, 2))
    tot = float(np.asarray(pyr.mom[0][0, 0]))
    msum = float(np.asarray(jnp.sum(td.mass)))
    log(("PASS" if abs(tot - msum) < 1e-3 * abs(msum) else "FAIL"),
        f"pyramid mass: level0 root mono {tot:.6f} vs sum(mass) {msum:.6f}")
    for lvl, m in enumerate(pyr.mom):
        s = float(np.asarray(jnp.sum(m[:, 0])))
        nz = int(np.asarray(jnp.sum(m[:, 0] != 0)))
        log(f"  level {lvl}: mono sum {s:.6f} nonzero cells {nz}/{m.shape[0]}")

    # 6. far_field on TPU vs CPU
    th, ep, g = jnp.float32(0.5), jnp.float32(0.0), jnp.float32(1.0)
    ff_jit = jax.jit(grid2.far_field, static_argnames=("cfg",))
    acc_t, pot_t = jax.block_until_ready(ff_jit(td, cfg, ep, g))
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        td_c = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), td)
        acc_c, pot_c = jax.jit(
            grid2.far_field, static_argnames=("cfg",))(td_c, cfg, ep, g)
    check("far_field acc tpu vs cpu", acc_t, np.asarray(acc_c), tol=1e-3)
    check("far_field pot tpu vs cpu", pot_t, np.asarray(pot_c), tol=1e-3)


if __name__ == "__main__":
    main()

"""Bisect the on-chip grid2 far-field wrongness (round 3).

acc_probe measured the grid2 far field 100% wrong ON CHIP at 65k
(o6s3 AND o4s2; m2p paths fine; probe_pyr's 8k default-config ladder
passed in round 2). The far field is three stages:

    build_pyramid -> dense_far_field -> l2p_particles

This probe runs each stage on the device and on CPU, cross-feeding the
CPU-verified input into the device stage, so the first deviating stage
is isolated with three compiles. Stage A additionally compares every
pyramid level so binning vs upward-shift breakage is distinguishable.

Run (needs the chip): python benchmarks/ff_bisect.py
Env: N (65536), ORDER (4), SEP (2), L0 (auto).
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

from rakau_tpu import build, grid2, particles  # noqa: E402
from rakau_tpu.config import TreeConfig  # noqa: E402

N = int(os.environ.get("N", 65536))
ORDER = int(os.environ.get("ORDER", 4))
SEP = int(os.environ.get("SEP", 2))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def dev(name, got, want, tol=1e-3):
    got = np.asarray(got)
    want = np.asarray(want)
    scale = float(np.max(np.abs(want))) + 1e-30
    err = float(np.max(np.abs(got - want))) / scale
    log(("PASS" if err < tol else "FAIL"),
        f"{name}: max rel dev {err:.3e} (scale {scale:.3e})")
    return err < tol


def main():
    log("devices:", jax.devices())
    cpu = jax.devices("cpu")[0]
    cfg = TreeConfig(traversal_mode="lmac", farfield="grid2",
                     local_order=ORDER, grid_sep=SEP, max_leaf_n=32,
                     ncrit=512, max_depth=14)
    pos, mass = particles.plummer(jax.random.PRNGKey(0), N)
    td = jax.jit(build.build_tree, static_argnames=("cfg",))(pos, mass, cfg)
    td = jax.block_until_ready(td)
    L0 = int(os.environ.get("L0", grid2.effective_grid_level(cfg, N)))
    p = cfg.local_order
    q = p
    eps = jnp.float32(0.0)
    g = jnp.float32(1.0)
    log(f"N={N} order={ORDER} sep={SEP} L0={L0}")

    td_c = jax.device_put(td, cpu)

    # ---- stage A: pyramid ------------------------------------------------
    pyr_fn = jax.jit(grid2.build_pyramid,
                     static_argnames=("cfg", "L0", "q"))
    t0 = time.time()
    pyr_d = jax.block_until_ready(pyr_fn(td, cfg, L0, q))
    log(f"pyramid device done {time.time()-t0:.1f}s")
    with jax.default_device(cpu):
        pyr_c = jax.block_until_ready(pyr_fn(td_c, cfg, L0, q))
    ok_a = True
    for l in range(L0 + 1):
        ok_a &= dev(f"pyramid level {l}", pyr_d.mom[l], pyr_c.mom[l])

    # ---- stage B: dense far field (CPU pyramid fed to both) --------------
    ff_fn = jax.jit(grid2.dense_far_field,
                    static_argnames=("cfg", "L0", "p", "q", "sep"))
    pyr_c_on_d = jax.device_put(pyr_c, jax.devices()[0])
    t0 = time.time()
    L_d = jax.block_until_ready(ff_fn(pyr_c_on_d, cfg, L0, td.box_size,
                                      eps, p, q, SEP))
    log(f"dense_far_field device done {time.time()-t0:.1f}s")
    with jax.default_device(cpu):
        L_c = jax.block_until_ready(ff_fn(pyr_c, cfg, L0,
                                          td_c.box_size, eps, p, q, SEP))
    ok_b = dev("dense_far_field Lleaf", L_d, L_c)

    # ---- stage C: L2P (CPU Lleaf fed to both) -----------------------------
    cells_fn = jax.jit(grid2.particle_cells, static_argnames=("depth", "L0"))
    l2p_fn = jax.jit(grid2.l2p_particles, static_argnames=("L0", "p"))
    L_c_on_d = jax.device_put(L_c, jax.devices()[0])
    cells_d = cells_fn(td.pos, td.box_size, cfg.max_depth, L0)
    t0 = time.time()
    acc_d, pot_d = jax.block_until_ready(
        l2p_fn(L_c_on_d, cells_d, td.pos, td.box_size, L0, g, p))
    log(f"l2p device done {time.time()-t0:.1f}s")
    with jax.default_device(cpu):
        cells_c = cells_fn(td_c.pos, td_c.box_size, cfg.max_depth, L0)
        acc_c, pot_c = jax.block_until_ready(
            l2p_fn(L_c, cells_c, td_c.pos, td_c.box_size, L0, g, p))
    dev("particle_cells", cells_d, np.asarray(cells_c), tol=1e-9)
    ok_c = dev("l2p acc", acc_d, np.asarray(acc_c))
    ok_c &= dev("l2p pot", pot_d, np.asarray(pot_c))

    log("summary: pyramid", "OK" if ok_a else "BROKEN",
        "| dense_ff", "OK" if ok_b else "BROKEN",
        "| l2p", "OK" if ok_c else "BROKEN")


if __name__ == "__main__":
    main()

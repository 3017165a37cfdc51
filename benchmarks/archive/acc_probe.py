"""On-chip accuracy ladder / bisection probe (round 3).

gate65k measured RMS 2.9e-1 ON CHIP for lmac+grid2 order-6/sep-3 quad
at theta=0.5 — the same config measures 9.1e-5 on CPU. This probe
isolates which component is wrong on hardware: runs a ladder of configs
at 65k against the native fp64 oracle, plus a direct far-field
cross-check (device grid2.far_field vs the identical computation forced
through the CPU backend).

Run (needs the chip):  python benchmarks/acc_probe.py
Stages via RAKAU_PROBE (comma list), default all.
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

from rakau_tpu import build, engine, native, particles  # noqa: E402
from rakau_tpu.config import TreeConfig  # noqa: E402

N = int(os.environ.get("N", 65536))
THETA = float(os.environ.get("THETA", 0.5))

BASE = dict(max_depth=14, max_leaf_n=32, ncrit=512, tile_chunk=32,
            m2p_cap=8192, p2p_leaf_cap=8192, p2p_src_cap=131072,
            frontier_cap=65536)

CONFIGS = {
    "o4s2_mono": dict(farfield="grid2", traversal_mode="lmac",
                      local_order=4, grid_sep=2),
    "o6s3_mono": dict(farfield="grid2", traversal_mode="lmac",
                      local_order=6, grid_sep=3),
    "o6s3_quad": dict(farfield="grid2", traversal_mode="lmac",
                      local_order=6, grid_sep=3, multipole_order=2),
    "o6s3_quad_xla": dict(farfield="grid2", traversal_mode="lmac",
                          local_order=6, grid_sep=3, multipole_order=2,
                          kernel_backend="xla"),
    "m2p_quad": dict(farfield="m2p", traversal_mode="lmac",
                     multipole_order=2),
    "m2p_mono": dict(farfield="m2p", traversal_mode="lmac"),
}


def main():
    pos, mass = particles.plummer(jax.random.PRNGKey(0), N)
    samp = np.sort(np.random.default_rng(1).choice(N, 512, replace=False))

    names = os.environ.get("RAKAU_PROBE", ",".join(CONFIGS)).split(",")
    acc_cache = {}
    for name in [n.strip() for n in names if n.strip()]:
        if name == "farfield_xcheck":
            farfield_xcheck(pos, mass)
            continue
        cfg = TreeConfig(**BASE, **CONFIGS[name])
        t0 = time.time()
        td = jax.jit(build.build_tree, static_argnames=("cfg",))(
            pos, mass, cfg)
        acc, pot, ovf, mx = engine.acc_pot_u_host(
            td, cfg, jnp.float32(THETA), jnp.float32(0.0), 1.0)
        acc = np.asarray(acc)
        inv = np.asarray(td.inv_perm)
        acc_u = acc[inv]         # original order
        pos64 = np.asarray(pos, np.float64)
        acc_o, _ = native.direct_acc_pot(pos64, np.asarray(mass, np.float64),
                                         targets=samp)
        num = np.linalg.norm(acc_u[samp] - acc_o, axis=1)
        den = np.maximum(np.linalg.norm(acc_o, axis=1), 1e-300)
        rel = num / den
        rms = float(np.sqrt(np.mean(rel ** 2)))
        print(f"{name}: rms={rms:.3e} max={rel.max():.3e} "
              f"ovf={np.asarray(ovf).tolist()} wall={time.time()-t0:.1f}s",
              flush=True)
        acc_cache[name] = acc_u


def farfield_xcheck(pos, mass):
    """grid2.far_field on device vs the same arrays on CPU."""
    from rakau_tpu import grid2
    cfg = TreeConfig(**BASE, farfield="grid2", traversal_mode="lmac",
                     local_order=6, grid_sep=3)
    td = jax.jit(build.build_tree, static_argnames=("cfg",))(pos, mass, cfg)
    t0 = time.time()
    acc_d, pot_d = jax.jit(grid2.far_field, static_argnames=("cfg",))(
        td, cfg, jnp.float32(0.0), jnp.float32(1.0))
    acc_d = np.asarray(acc_d)
    pot_d = np.asarray(pot_d)
    cpu = jax.devices("cpu")[0]
    td_c = jax.device_put(td, cpu)
    with jax.default_device(cpu):
        acc_c, pot_c = jax.jit(grid2.far_field, static_argnames=("cfg",))(
            td_c, cfg, jnp.float32(0.0), jnp.float32(1.0))
    acc_c = np.asarray(acc_c)
    scale = np.abs(acc_c).max() + 1e-30
    d = np.abs(acc_d - acc_c).max() / scale
    dp = np.abs(pot_d - np.asarray(pot_c)).max() / (np.abs(pot_c).max()
                                                    + 1e-30)
    print(f"farfield_xcheck: max rel dev acc={d:.3e} pot={dp:.3e} "
          f"|acc_cpu|max={scale:.3e} wall={time.time()-t0:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()

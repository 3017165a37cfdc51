"""M2L conv formulation shootout (round 3).

The grid2 M2L is the gate on grid depth L0: lmac1m measured 6141
useful pairs/particle at the occupancy-32 default (L0=5 at 1M) because
deepening L0 8x's the conv cost, and the conv runs far off the MXU
roof. Hypotheses: (a) XLA:TPU lowers 3-D conv poorly (TPU convs are
2-D native), (b) NM=35-channel operands pad to 128 lanes on both sides
(~13x waste), (c) HIGHEST costs 3-6 bf16 passes (unavoidable for the
~1e-4 far-field error budget).

Variants (identical math, cross-checked):
  V0: production _parity_conv — 2^D strided 3-D convs.
  V1: z-fold — fold the K z-offsets x NM into channels, batch over
      target z, 2^D strided 2-D convs (kernel K x K).
Run (chip): python benchmarks/m2l_probe.py   Env: G (32), ORDER (4),
SEP (2), REPS (3).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rakau_tpu.utils.tpu import ensure_tpu  # noqa: E402
ensure_tpu()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from rakau_tpu import grid2  # noqa: E402

G = int(os.environ.get("G", 32))
ORDER = int(os.environ.get("ORDER", 4))
SEP = int(os.environ.get("SEP", 2))
REPS = int(os.environ.get("REPS", 3))
NDIM = 3


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    log(f"devices: {jax.devices()}  G={G} order={ORDER} sep={SEP}")
    NM = grid2.n_coeffs(NDIM, ORDER)
    key = jax.random.PRNGKey(0)
    M = jax.random.normal(key, (G ** 3, NM), jnp.float32)
    s_cell = 1.0 / G
    W = grid2.m2l_kernels(NDIM, ORDER, ORDER, SEP, s_cell, 0.0)
    # m2l_kernels returns [2^D, (K,)*D, NL, NM]
    log(f"W shape {W.shape}  NM={NM}")

    def v0_fn(m):
        os.environ["RAKAU_M2L_CONV"] = "3d"
        return grid2._parity_conv(m, W, NDIM, G)

    def v1_fn(m):
        os.environ["RAKAU_M2L_CONV"] = "2d"
        return grid2._parity_conv(m, W, NDIM, G)

    v0 = jax.jit(v0_fn)
    v1 = jax.jit(v1_fn)

    outs = {}
    for name, fn in [("v0_conv3d", v0), ("v1_zfold2d", v1)]:
        t0 = time.time()
        o = np.asarray(fn(M))
        cold = time.time() - t0
        t0 = time.time()
        for _ in range(REPS):
            o = fn(M)
        o.block_until_ready()
        warm = (time.time() - t0) / REPS
        outs[name] = np.asarray(o)
        K = W.shape[1]
        flops = 8 * (G / 2) ** 3 * K ** 3 * NM * W.shape[-2] * 2
        log(f"{name}: warm={warm*1e3:.1f}ms cold={cold:.1f}s "
            f"dense-flops={flops:.3g} -> {flops/warm/1e12:.2f} TFLOP/s")
    a, b = outs["v0_conv3d"], outs["v1_zfold2d"]
    scale = np.abs(a).max()
    log(f"max abs dev v1 vs v0: {np.abs(a - b).max():.3e} "
        f"(scale {scale:.3e})")


if __name__ == "__main__":
    main()

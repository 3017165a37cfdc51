#!/usr/bin/env python
"""Row-gather microbenchmark: what does table[ids] really cost on this
TPU, as a function of row width W, row count K, and table size M?
Decides between per-row (latency) and per-element (bandwidth) models,
and tests a Pallas VMEM-table gather as an alternative.
"""
import os
import time
from functools import partial

import numpy as np


def timeit(fn, *a, reps=5):
    import jax
    jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*a))
    for _ in range(reps - 1):
        out = jax.block_until_ready(fn(*a))
    return (time.perf_counter() - t0) / reps


def main():
    from rakau_tpu.utils.tpu import ensure_tpu
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        ensure_tpu()
    import jax
    import jax.numpy as jnp

    L = 10  # chain length to defeat overlap

    def chain_gather(table, ids0, M):
        @jax.jit
        def f(ids0):
            ids = ids0
            s = jnp.zeros((), jnp.float32)
            for _ in range(L):
                rows = table[ids]
                s = s + rows.reshape(-1)[0] + rows.reshape(-1)[-1]
                ids = (ids + s.astype(jnp.int32) % 3 + 1) % M
            return s
        return f

    key = jax.random.PRNGKey(0)
    print("XLA gather: per-gather ms (chain of 10)", flush=True)
    for M in (8192, 123_000, 1_000_000):
        tab = jax.random.normal(key, (M, 96), jnp.float32)
        for K in (1024, 8192, 65536):
            ids0 = jax.random.randint(key, (K,), 0, M, jnp.int32)
            for W in (1, 4, 12, 48, 96):
                t = timeit(chain_gather(tab[:, :W] if W < 96 else tab,
                                        ids0, M), ids0)
                print(f"  M={M:>8} K={K:>6} W={W:>3}: "
                      f"{t/L*1e3:8.3f} ms  ({t/L/K*1e9:7.1f} ns/row, "
                      f"{t/L/(K*W)*1e9:6.2f} ns/elem)", flush=True)

    # sorted ids (frontier ids are nearly sorted)
    M, K, W = 123_000, 8192, 12
    tab = jax.random.normal(key, (M, W), jnp.float32)
    ids_s = jnp.sort(jax.random.randint(key, (K,), 0, M, jnp.int32))

    @jax.jit
    def f_sorted(ids0):
        ids = ids0
        s = jnp.zeros((), jnp.float32)
        for _ in range(L):
            rows = tab[ids]
            s = s + rows.reshape(-1)[0]
            ids = jnp.sort((ids + s.astype(jnp.int32) % 3 + 1) % M)
        return s
    t = timeit(f_sorted, ids_s)
    print(f"sorted ids M={M} K={K} W={W}: {t/L*1e3:.3f} ms (incl sort)",
          flush=True)

    # one-hot matmul gather for small M
    M2 = 8192
    tab2 = jax.random.normal(key, (M2, 96), jnp.float32)
    ids0 = jax.random.randint(key, (8192,), 0, M2, jnp.int32)

    @jax.jit
    def f_onehot(ids0):
        ids = ids0
        s = jnp.zeros((), jnp.float32)
        for _ in range(L):
            oh = jax.nn.one_hot(ids, M2, dtype=jnp.bfloat16)
            rows = (oh @ tab2.astype(jnp.bfloat16)).astype(jnp.float32)
            s = s + rows.reshape(-1)[0]
            ids = (ids + s.astype(jnp.int32) % 3 + 1) % M2
        return s
    t = timeit(f_onehot, ids0)
    print(f"one-hot matmul M={M2} K=8192 W=96: {t/L*1e3:.3f} ms",
          flush=True)

    # ---- pallas gather: table VMEM-resident, ids scalar-prefetched ----
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    def pallas_gather(table, ids, block=1024):
        M, W = table.shape
        K = ids.shape[0]

        def kern(ids_ref, tab_ref, out_ref):
            c = pl.program_id(0)

            def body(i, _):
                r = ids_ref[c * block + i]
                out_ref[i, :] = tab_ref[r, :]
                return 0
            jax.lax.fori_loop(0, block, body, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(K // block,),
            in_specs=[pl.BlockSpec((M, W), lambda c, ids: (0, 0))],
            out_specs=pl.BlockSpec((block, W), lambda c, ids: (c, 0)),
        )
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((K, W), table.dtype),
        )(ids, table)

    for W in (12, 96):
        M3 = 123_000
        tab3 = jax.random.normal(key, (M3, W), jnp.float32)
        K3 = 8192

        @jax.jit
        def f_pl(ids0):
            ids = ids0
            s = jnp.zeros((), jnp.float32)
            for _ in range(L):
                rows = pallas_gather(tab3, ids)
                s = s + rows.reshape(-1)[0]
                ids = (ids + s.astype(jnp.int32) % 3 + 1) % M3
            return s
        ids0 = jax.random.randint(key, (K3,), 0, M3, jnp.int32)
        try:
            t = timeit(f_pl, ids0)
            print(f"pallas gather M={M3} K={K3} W={W}: {t/L*1e3:.3f} ms "
                  f"({t/L/K3*1e9:.0f} ns/row)", flush=True)
        except Exception as e:
            print(f"pallas gather W={W} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Fit the walk round-loop cost: vary fcap (K), C, R; time rounds-only.

Also times a single classify panel standalone and a chained sequence of
classifies (no frontier logic), to separate panel cost from loop/carry
overhead.
"""
import os
import time
from functools import partial

import numpy as np


def timeit(fn, reps=3):
    import jax
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / reps


def main():
    from rakau_tpu.utils.tpu import ensure_tpu
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        ensure_tpu()
    import jax
    import jax.numpy as jnp
    from rakau_tpu import build, engine, particles, traversal2
    from rakau_tpu.config import TreeConfig

    I32 = jnp.int32
    n = 1_000_000
    cfg0 = TreeConfig(max_depth=14, max_leaf_n=32, ncrit=512,
                      tile_chunk=64, m2p_cap=16384, p2p_leaf_cap=4096,
                      p2p_src_cap=65536, frontier_cap=1024,
                      farfield="grid")
    pos, mass = particles.plummer(jax.random.PRNGKey(0), n)
    td = jax.jit(build.build_tree, static_argnames=("cfg",))(
        pos, mass, cfg0)
    th = jnp.asarray(0.75, jnp.float32)
    tiles, tables = engine._tiles_jit(td, cfg0)
    _, tiles_idx, box_lo, box_hi, tiles_cell = tiles
    npart = td.pos.shape[0]

    def run_walk(cfg, C, R):
        blo, bhi = box_hi[4][:C] * 0 + box_lo[4][:C], box_hi[4][:C]
        tcell = tiles_cell[4][:C]
        tvalid = tiles_idx[4][:C, 0] < npart
        cfgr = cfg.with_(max_depth=R - 1)

        @partial(jax.jit, static_argnames=("cfg",))
        def w(td, cfg, theta):
            return traversal2.build_shared_sources(
                td, cfg, theta, blo, bhi, tables=None, tile_cell=tcell,
                tile_valid=tvalid)
        return timeit(lambda: w(td, cfgr, th))

    print("varying fcap (C=64, R=15):", flush=True)
    for fc in (256, 512, 1024):
        t = run_walk(cfg0.with_(frontier_cap=fc), 64, 15)
        print(f"  fcap={fc}: {t*1e3:.2f} ms", flush=True)
    print("varying C (fcap=1024, R=15):", flush=True)
    for C in (8, 16, 64):
        t = run_walk(cfg0, C, 15)
        print(f"  C={C}: {t*1e3:.2f} ms", flush=True)
    print("varying R (C=64, fcap=1024):", flush=True)
    for R in (4, 8, 15):
        t = run_walk(cfg0, 64, R)
        print(f"  R={R}: {t*1e3:.2f} ms", flush=True)

    # standalone classify chain: K ids, C tiles, L links
    C, K, L = 64, 8192, 14
    blo, bhi = box_lo[4], box_hi[4]
    lo = blo[:, None, :]
    hi = bhi[:, None, :]
    theta_inv = 1.0 / 0.75
    ids0 = jnp.arange(K, dtype=I32) % int(td.n_nodes)

    @jax.jit
    def chain(ids0):
        ids = ids0
        acc_n = jnp.zeros((), I32)
        for _ in range(L):
            row = tables.ff[jnp.clip(ids, 0, None)]
            com = row[:, :3]
            size = row[:, 4]
            d = jnp.maximum(jnp.maximum(lo - com[None], com[None] - hi),
                            0.0)
            d2 = jnp.sum(d * d, axis=-1)
            acc = d2 > (size * theta_inv)[None] ** 2
            acc_n = acc_n + jnp.sum(acc.astype(I32))
            ids = (ids + acc_n % 7 + 1) % int(td.n_nodes)  # serialize
        return acc_n

    t = timeit(lambda: chain(ids0))
    print(f"classify chain x{L} (unrolled, no loop): {t*1e3:.2f} ms "
          f"({t/L*1e6:.0f} us/classify)", flush=True)

    # same chain inside fori_loop
    @jax.jit
    def chain_loop(ids0):
        def body(r, carry):
            ids, acc_n = carry
            row = tables.ff[jnp.clip(ids, 0, None)]
            com = row[:, :3]
            size = row[:, 4]
            d = jnp.maximum(jnp.maximum(lo - com[None], com[None] - hi),
                            0.0)
            d2 = jnp.sum(d * d, axis=-1)
            acc = d2 > (size * theta_inv)[None] ** 2
            acc_n = acc_n + jnp.sum(acc.astype(I32))
            ids = (ids + acc_n % 7 + 1) % int(td.n_nodes)
            return ids, acc_n
        return jax.lax.fori_loop(0, L, body, (ids0, jnp.zeros((), I32)))[1]

    t = timeit(lambda: chain_loop(ids0))
    print(f"classify chain x{L} (fori_loop): {t*1e3:.2f} ms "
          f"({t/L*1e6:.0f} us/iter)", flush=True)

    # pure gather: K rows from ff, chained
    @jax.jit
    def gather_chain(ids0):
        ids = ids0
        s = jnp.zeros((), jnp.float32)
        for _ in range(L):
            row = tables.ff[jnp.clip(ids, 0, None)]
            s = s + row[:, 3].sum()
            ids = (ids + s.astype(I32) % 7 + 1) % int(td.n_nodes)
        return s
    t = timeit(lambda: gather_chain(ids0))
    print(f"gather chain x{L}: {t*1e3:.2f} ms ({t/L*1e6:.0f} us/gather "
          f"of {K} rows)", flush=True)


if __name__ == "__main__":
    main()

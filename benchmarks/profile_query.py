#!/usr/bin/env python
"""Phase-level timing of the shared-traversal query at scale.

Times, per tile chunk and end-to-end (warm):
  prep    : tile gather + packed node tables + dense grid far field
  walk    : traversal2.build_shared_sources (union walk, per-tile masks)
  kernel  : dispatch.eval_shared on the walk's output (Pallas fused)
  expand  : far-split + M2L + L2P tile-local expansion path
  full    : engine acc_pot_u_host (the real driver)

Run on TPU (default) or CPU (JAX_PLATFORMS=cpu). Env knobs mirror
bench.py: RAKAU_BENCH_N, RAKAU_BENCH_FARFIELD, ...
"""
import os
import time

import numpy as np


def timeit(fn, *args, reps=3, **kw):
    import jax
    out = jax.block_until_ready(fn(*args, **kw))  # warm/compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args, **kw))
    return (time.perf_counter() - t0) / reps, out


def main():
    from rakau_tpu.utils.tpu import ensure_tpu
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        ensure_tpu()
    import jax
    import jax.numpy as jnp
    from functools import partial
    from rakau_tpu import build, engine, particles, traversal2
    from rakau_tpu.config import TreeConfig
    from rakau_tpu.kernels import dispatch

    n = int(os.environ.get("RAKAU_BENCH_N", 1_000_000))
    theta = float(os.environ.get("RAKAU_BENCH_THETA", 0.75))
    cfg = TreeConfig(
        max_depth=int(os.environ.get("RAKAU_BENCH_DEPTH", 14)),
        max_leaf_n=int(os.environ.get("RAKAU_BENCH_LEAF", 32)),
        ncrit=int(os.environ.get("RAKAU_BENCH_NCRIT", 512)),
        tile_chunk=int(os.environ.get("RAKAU_BENCH_CHUNK", 64)),
        m2p_cap=int(os.environ.get("RAKAU_BENCH_M2P", 8192)),
        p2p_leaf_cap=int(os.environ.get("RAKAU_BENCH_P2PLEAF", 2048)),
        p2p_src_cap=int(os.environ.get("RAKAU_BENCH_P2PSRC", 65536)),
        frontier_cap=int(os.environ.get("RAKAU_BENCH_FCAP", 1024)),
        farfield=os.environ.get("RAKAU_BENCH_FARFIELD", "grid"),
    )
    pos, mass = particles.plummer(jax.random.PRNGKey(0), n)
    td = jax.jit(build.build_tree, static_argnames=("cfg",))(pos, mass, cfg)
    assert not bool(td.overflow)
    th = jnp.asarray(theta, jnp.float32)
    ep = jnp.asarray(0.0, jnp.float32)
    g = jnp.asarray(1.0, jnp.float32)

    # ---- full driver first: auto-tunes nothing, uses cfg as-is ----
    t_full, (_, _, ovf, mx) = timeit(
        lambda: engine.acc_pot_u_host(td, cfg, th, ep, g), reps=1)
    print(f"full acc_pot_u_host: {t_full*1e3:.1f} ms  ovf={np.asarray(ovf)}"
          f" mx={np.asarray(mx)}", flush=True)

    # ---- prep ----
    t_tiles, (tiles, tables) = timeit(engine._tiles_jit, td, cfg)
    t_grid, Lgrid = timeit(engine._grid_jit, td, cfg, ep)
    print(f"prep: tiles+tables {t_tiles*1e3:.1f} ms, grid far field "
          f"{t_grid*1e3:.1f} ms", flush=True)

    tiles_pos, tiles_idx, box_lo, box_hi, tiles_cell = tiles
    n_chunks = tiles_pos.shape[0]
    CH = tiles_pos.shape[1]
    n_live = max(1, -(-int(td.n_tiles) // CH))
    print(f"chunks: {n_chunks} total, {n_live} live, CH={CH}, "
          f"ncrit={cfg.ncrit}", flush=True)

    # ---- walk only, one chunk at a time over live chunks ----
    npart = td.pos.shape[0]

    @partial(jax.jit, static_argnames=("cfg",))
    def walk_chunk(td, cfg, theta, ci):
        blo = box_lo[ci]
        bhi = box_hi[ci]
        tidx = tiles_idx[ci]
        tcell = tiles_cell[ci]
        tvalid = tidx[:, 0] < npart
        src = traversal2.build_shared_sources(
            td, cfg, theta, blo, bhi, tables=tables,
            tile_cell=tcell, tile_valid=tvalid)
        return src

    src0 = jax.block_until_ready(walk_chunk(td, cfg, th, 0))
    t0 = time.perf_counter()
    for ci in range(n_live):
        src = walk_chunk(td, cfg, th, ci)
    jax.block_until_ready(src)
    t_walk = time.perf_counter() - t0
    print(f"walk: {t_walk*1e3:.1f} ms total "
          f"({t_walk/n_live*1e3:.2f} ms/chunk)", flush=True)

    # ---- kernel only on chunk 0's sources (repeated n_live times) ----
    @partial(jax.jit, static_argnames=("cfg",))
    def kern_chunk(cfg, tpos, tidx, spos, smass, sidx, smask):
        return dispatch.eval_shared(cfg, tpos, tidx, spos, smass, sidx,
                                    smask, ep, g)

    tp0 = tiles_pos[0]
    ti0 = tiles_idx[0]
    t_kern, _ = timeit(kern_chunk, cfg, tp0, ti0, src0.pos, src0.mass,
                       src0.idx, src0.mask, reps=3)
    print(f"kernel: {t_kern*1e3:.2f} ms/chunk -> {t_kern*n_live*1e3:.1f} "
          f"ms total est; S={src0.pos.shape[0]} "
          f"pairs/chunk={CH*cfg.ncrit*src0.pos.shape[0]/1e6:.1f}M "
          f"mask_density={float(jnp.mean(src0.mask)):.3f}", flush=True)

    gpairs = CH * cfg.ncrit * src0.pos.shape[0] / t_kern / 1e9
    print(f"kernel padded-pair rate: {gpairs:.1f} Gpairs/s", flush=True)


if __name__ == "__main__":
    main()

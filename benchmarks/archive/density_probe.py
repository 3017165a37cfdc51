#!/usr/bin/env python
"""Kernel-density / pairs-per-particle probe (VERDICT r1 item 8).

Measures, at bench-like configuration on the attached accelerator:
  * useful pairs per particle (kernel-mask-weighted, the number the
    1e9 evals/sec budget arithmetic needs),
  * fused-kernel in-active-block density (useful / padded pairs),
  * M2P-vs-P2P split of the kernel work and the far-field (local
    expansion) node count,
  * phase timing: walk+materialize vs full chunk eval (device-sliced,
    tunnel-amortized).

Prints one JSON line. Env: RAKAU_BENCH_N, RAKAU_PROBE_SLICES.
"""
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from rakau_tpu.utils.tpu import ensure_tpu
    ensure_tpu()
    import jax
    import jax.numpy as jnp
    from rakau_tpu import build, engine, expansion, particles, traversal2
    from rakau_tpu.config import TreeConfig

    n = int(os.environ.get("RAKAU_BENCH_N", 8_000_000))
    theta = float(os.environ.get("RAKAU_BENCH_THETA", 0.75))
    eps = 0.0
    block = int(os.environ.get("RAKAU_PALLAS_BLOCK", 1024))

    key = jax.random.PRNGKey(0)
    pos, mass = particles.plummer(key, n)
    cfg = TreeConfig(
        max_depth=int(os.environ.get("RAKAU_BENCH_DEPTH", 14)),
        max_leaf_n=int(os.environ.get("RAKAU_BENCH_LEAF", 32)),
        ncrit=int(os.environ.get("RAKAU_BENCH_NCRIT", 512)),
        tile_chunk=int(os.environ.get("RAKAU_BENCH_CHUNK", 32)),
        m2p_cap=int(os.environ.get("RAKAU_BENCH_M2P", 8192)),
        p2p_leaf_cap=int(os.environ.get("RAKAU_BENCH_P2PLEAF", 2048)),
        p2p_src_cap=int(os.environ.get("RAKAU_BENCH_P2PSRC", 65536)),
        frontier_cap=int(os.environ.get("RAKAU_BENCH_FCAP", 1024)),
        farfield=os.environ.get("RAKAU_BENCH_FARFIELD", "grid"),
    )
    if os.environ.get("RAKAU_BENCH_GRIDLEVEL"):
        cfg = cfg.with_(grid_level=int(os.environ["RAKAU_BENCH_GRIDLEVEL"]))

    build_jit = jax.jit(build.build_tree, static_argnames=("cfg",))
    t0 = time.perf_counter()
    td = jax.block_until_ready(build_jit(pos, mass, cfg))
    build_cold = time.perf_counter() - t0
    assert not bool(td.overflow), "tree build overflow"

    th = jnp.asarray(theta, cfg.jdtype)
    ep = jnp.asarray(eps, cfg.jdtype)
    g = jnp.asarray(1.0, cfg.jdtype)

    # Autotune caps the same way bench.py does, so stats reflect the
    # configuration the bench actually times.
    acc, pot, ovf, mx = engine.acc_pot_u_host(td, cfg, th, ep, g)
    for _ in range(4):
        if not bool(np.asarray(ovf).any()):
            break
        cfg = cfg.with_(m2p_cap=4 * cfg.m2p_cap,
                        p2p_src_cap=4 * cfg.p2p_src_cap,
                        p2p_leaf_cap=4 * cfg.p2p_leaf_cap,
                        frontier_cap=2 * cfg.frontier_cap)
        acc, pot, ovf, mx = engine.acc_pot_u_host(td, cfg, th, ep, g)
    m2p_max, p2p_max, f_max = (int(x) for x in np.asarray(mx))
    fit = lambda v, q: max(q, -(-int(v * 1.25) // q) * q)
    cfg = cfg.with_(m2p_cap=fit(m2p_max, 512),
                    p2p_src_cap=fit(p2p_max, 1024),
                    p2p_leaf_cap=max(256, fit(p2p_max, 1024) //
                                     max(cfg.max_leaf_n // 4, 1)),
                    frontier_cap=fit(f_max, 256))

    tiles, tables = engine._tiles_jit(td, cfg)
    Lgrid = engine._grid_jit(td, cfg, ep)
    n_chunks = tiles[0].shape[0]
    CH = tiles[0].shape[1]
    n_live = min(max(1, -(-int(td.n_tiles) // CH)), n_chunks)

    @partial(jax.jit, static_argnames=("cfg", "K", "block"))
    def slice_stats(td, cfg, theta, tiles, tables, start, K, block):
        tiles_pos, tiles_idx, box_lo, box_hi, tiles_cell = tiles

        def sl(a):
            return jax.lax.dynamic_slice_in_dim(a, start, K, axis=0)

        def chunk_fn(args):
            tpos, tidx, blo, bhi, tcell = args
            nn = td.pos.shape[0]
            tvalid = tidx[:, 0] < nn
            src = traversal2.build_shared_sources(
                td, cfg, theta, blo, bhi, tables=tables, tile_cell=tcell,
                tile_valid=tvalid)
            mask = src.mask
            U = cfg.m2p_cap
            center = 0.5 * (blo + bhi)
            rad2 = jnp.sum((0.5 * (bhi - blo)) ** 2, axis=-1)
            far, near = expansion.far_split(
                center, rad2, src.pos[:U], src.mass[:U], mask[:, :U],
                cfg.local_gamma)
            kmask = jnp.concatenate([near, mask[:, U:]], axis=1)
            tcnt = jnp.sum(tidx < nn, axis=1).astype(jnp.float32)
            mk = kmask.astype(jnp.float32)
            m2p_act = jnp.sum(mk[:, :U], axis=1)
            p2p_act = jnp.sum(mk[:, U:], axis=1)
            useful = jnp.sum((m2p_act + p2p_act) * tcnt)
            useful_m2p = jnp.sum(m2p_act * tcnt)
            useful_p2p = jnp.sum(p2p_act * tcnt)
            S0 = kmask.shape[1]
            nb = -(-S0 // block)
            padm = jnp.pad(mk, ((0, 0), (0, nb * block - S0)))
            steps = jnp.sum(
                padm.reshape(-1, nb, block).sum(axis=2) > 0, axis=1)
            padded = jnp.sum(steps.astype(jnp.float32)) * block * cfg.ncrit
            far_n = jnp.sum(far.astype(jnp.float32))
            return (useful, useful_m2p, useful_p2p, padded, far_n,
                    jnp.sum(tcnt))

        outs = jax.lax.map(chunk_fn, (sl(tiles_pos), sl(tiles_idx),
                                      sl(box_lo), sl(box_hi),
                                      sl(tiles_cell)))
        return [jnp.sum(o) for o in outs]

    # walk+materialize only (keep it alive via checksums)
    @partial(jax.jit, static_argnames=("cfg", "K"))
    def slice_walk(td, cfg, theta, tiles, tables, start, K):
        tiles_pos, tiles_idx, box_lo, box_hi, tiles_cell = tiles

        def sl(a):
            return jax.lax.dynamic_slice_in_dim(a, start, K, axis=0)

        def chunk_fn(args):
            tpos, tidx, blo, bhi, tcell = args
            nn = td.pos.shape[0]
            tvalid = tidx[:, 0] < nn
            src = traversal2.build_shared_sources(
                td, cfg, theta, blo, bhi, tables=tables, tile_cell=tcell,
                tile_valid=tvalid)
            return (jnp.sum(src.pos) + jnp.sum(src.mass)
                    + jnp.sum(src.mask.astype(jnp.float32)))

        return jnp.sum(jax.lax.map(
            chunk_fn, (sl(tiles_pos), sl(tiles_idx), sl(box_lo),
                       sl(box_hi), sl(tiles_cell))))

    K = min(int(os.environ.get("RAKAU_PROBE_K", 32)), n_live)
    n_slices = int(os.environ.get("RAKAU_PROBE_SLICES", 4))
    starts = [int(s) for s in
              np.linspace(0, n_live - K, n_slices).astype(int)]

    tot = np.zeros(6)
    for s in starts:
        out = slice_stats(td, cfg, th, tiles, tables, s, K, block)
        tot += np.asarray([float(x) for x in out])
    scale = n_live / (len(starts) * K)
    useful, useful_m2p, useful_p2p, padded, far_n, tsum = tot * scale

    # timing: walk-only vs full slice (warm, averaged)
    s0 = starts[0]
    slice_walk(td, cfg, th, tiles, tables, s0, K).block_until_ready()
    t0 = time.perf_counter()
    for s in starts:
        slice_walk(td, cfg, th, tiles, tables, s, K).block_until_ready()
    walk_s = (time.perf_counter() - t0) / len(starts)

    engine._slice_query_jit(td, cfg, th, ep, g, tiles, tables, Lgrid,
                            s0, K)[0].block_until_ready()
    t0 = time.perf_counter()
    for s in starts:
        jax.block_until_ready(engine._slice_query_jit(
            td, cfg, th, ep, g, tiles, tables, Lgrid, s, K))
    full_s = (time.perf_counter() - t0) / len(starts)

    out = {
        "n": n, "theta": theta, "cfg": {
            "ncrit": cfg.ncrit, "tile_chunk": cfg.tile_chunk,
            "m2p_cap": cfg.m2p_cap, "p2p_src_cap": cfg.p2p_src_cap,
            "grid_level": cfg.grid_level, "farfield": cfg.farfield},
        "useful_pairs_per_particle": useful / n,
        "m2p_pairs_per_particle": useful_m2p / n,
        "p2p_pairs_per_particle": useful_p2p / n,
        "far_local_nodes_per_tile": far_n / max(int(td.n_tiles), 1),
        "kernel_density": useful / max(padded, 1.0),
        "padded_pairs_per_particle": padded / n,
        "n_tiles": int(td.n_tiles),
        "walk_ms_per_slice": walk_s * 1e3,
        "full_ms_per_slice": full_s * 1e3,
        "kernel_ms_per_slice_est": (full_s - walk_s) * 1e3,
        "slices": len(starts), "K": K, "n_live_chunks": n_live,
        "est_query_ms": full_s * n_live / K * 1e3,
        "build_cold_ms": build_cold * 1e3,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

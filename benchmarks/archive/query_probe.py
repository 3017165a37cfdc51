#!/usr/bin/env python
"""Phase breakdown of the query path: union-walk bookkeeping vs kernel.

Times, per tile-chunk size C:
  * walk-only: traversal2.build_shared_sources over all chunks (forced
    by a scalar reduction of the outputs so nothing is DCE'd),
  * full query: engine.acc_pot_u_host,
and derives kernel+overhead = full - walk. This tells us whether the
next lever is walk amortization (raise C) or kernel throughput.

Env: RAKAU_PROBE_N (default 262144), RAKAU_PROBE_CHUNKS ("8,32,64").
"""
import os
import time

import numpy as np


def main():
    from rakau_tpu.utils.tpu import ensure_tpu
    ensure_tpu()
    import jax
    import jax.numpy as jnp
    from functools import partial
    from rakau_tpu import build, engine, particles, traversal2
    from rakau_tpu.config import TreeConfig

    n = int(os.environ.get("RAKAU_PROBE_N", 262144))
    chunks = [int(c) for c in
              os.environ.get("RAKAU_PROBE_CHUNKS", "8,32,64").split(",")]
    theta = float(os.environ.get("RAKAU_PROBE_THETA", 0.75))

    key = jax.random.PRNGKey(0)
    pos, mass = particles.plummer(key, n)

    base = TreeConfig(max_depth=14, max_leaf_n=32, ncrit=512)
    build_jit = jax.jit(build.build_tree, static_argnames=("cfg",))
    td = build_jit(pos, mass, base)
    jax.block_until_ready(td.pos)

    @partial(jax.jit, static_argnames=("cfg", "K"))
    def walk_only(td, cfg, theta, tiles, tables, start, K):
        tiles_pos, tiles_idx, box_lo, box_hi = tiles

        def sl(a):
            return jax.lax.dynamic_slice_in_dim(a, start, K, axis=0)

        def chunk_fn(args):
            _tp, _ti, blo, bhi = args
            src = traversal2.build_shared_sources(td, cfg, theta, blo, bhi,
                                                  tables=tables)
            # cheap forced reductions (can't be DCE'd)
            return (jnp.sum(src.mass), jnp.sum(src.mask.astype(jnp.int32)),
                    src.count, src.maxima)

        s, mk, cnt, mx = jax.lax.map(
            chunk_fn, (sl(tiles_pos), sl(tiles_idx), sl(box_lo), sl(box_hi)))
        return jnp.sum(s), jnp.sum(mk), jnp.max(cnt), jnp.max(mx, axis=0)

    th = jnp.asarray(theta, jnp.float32)
    ep = jnp.asarray(0.0, jnp.float32)
    g = jnp.asarray(1.0, jnp.float32)

    for C in chunks:
        cfg = base.with_(tile_chunk=C)
        # auto-tuned caps from a first stats query
        acc, pot, ovf, mx = engine.acc_pot_u_host(td, cfg, th, ep, g)
        while bool(np.asarray(ovf).any()):
            cfg = cfg.with_(m2p_cap=2 * cfg.m2p_cap,
                            p2p_src_cap=2 * cfg.p2p_src_cap,
                            p2p_leaf_cap=2 * cfg.p2p_leaf_cap,
                            frontier_cap=2 * cfg.frontier_cap)
            acc, pot, ovf, mx = engine.acc_pot_u_host(td, cfg, th, ep, g)
        m2p_max, src_max, f_max = (int(x) for x in np.asarray(mx))
        fit = lambda v, q: max(q, -(-int(v * 1.25) // q) * q)
        cfg = cfg.with_(m2p_cap=fit(m2p_max, 512),
                        p2p_src_cap=fit(src_max - m2p_max, 1024),
                        p2p_leaf_cap=max(256, fit(src_max, 1024) // 8),
                        frontier_cap=fit(f_max, 256))

        tiles, tables = engine._tiles_jit(td, cfg)
        n_chunks = tiles[0].shape[0]
        n_live = max(1, -(-int(td.n_tiles) // C))
        K = min(n_live, n_chunks)

        # walk only (whole live range in one dispatch if it fits)
        r = walk_only(td, cfg, th, tiles, tables, 0, K)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = walk_only(td, cfg, th, tiles, tables, 0, K)
        jax.block_until_ready(r)
        walk_s = time.perf_counter() - t0

        # full query
        acc, pot, ovf, mx = engine.acc_pot_u_host(td, cfg, th, ep, g)
        jax.block_until_ready(acc)
        t0 = time.perf_counter()
        acc, pot, ovf, mx = engine.acc_pot_u_host(td, cfg, th, ep, g)
        jax.block_until_ready(acc)
        full_s = time.perf_counter() - t0

        pairs = float(np.asarray(r[1]))  # sum of per-tile masked sources
        print(f"C={C:4d} caps(m2p={cfg.m2p_cap},src={cfg.p2p_src_cap},"
              f"f={cfg.frontier_cap}) walk={walk_s*1e3:8.1f}ms "
              f"full={full_s*1e3:8.1f}ms kernel~={(full_s-walk_s)*1e3:8.1f}ms"
              f" evals/s={n/full_s:,.0f} maskpairs={pairs*512:.3g}",
              flush=True)


if __name__ == "__main__":
    main()

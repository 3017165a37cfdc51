"""Stage attribution for the gwalk engine (r5): times the global walk,
pool build, schedule, kernel, far field, and assembly as separate
jitted stages on the live chip, then the fused engine call.

Two phases: an untuned pass (dynamic while-loop walk) fits the global
caps AND the per-round frontier caps (engine.tune_gwalk); the timed
stages then run the production configuration (unrolled walk).

Usage: python benchmarks/gwalk_probe.py [N] [--theta 0.75]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from rakau_tpu.utils.tpu import ensure_tpu
    ensure_tpu()
    import jax
    import jax.numpy as jnp
    from functools import partial
    from rakau_tpu import build, engine, particles, traversal4
    from rakau_tpu.config import TreeConfig

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    theta = float(os.environ.get("GW_THETA", 0.75))
    ncrit = int(os.environ.get("GW_NCRIT", 512))
    caps = dict(
        m2p_cap=int(os.environ.get("GW_M2P", 4 * n // 2)),
        p2p_leaf_cap=int(os.environ.get("GW_LEAF", n)),
        p2p_src_cap=int(os.environ.get("GW_POOL", 16 * n)),
        frontier_cap=int(os.environ.get("GW_FCAP", n // 4)),
    )
    cfg = TreeConfig(max_depth=14, max_leaf_n=32, ncrit=ncrit,
                     tile_chunk=64, farfield=os.environ.get(
                         "GW_FF", "grid"),
                     traversal_mode="gwalk",
                     pool_block=int(os.environ.get("GW_BLOCK", 512)),
                     pool_group=int(os.environ.get("GW_GROUP", 8)),
                     multipole_order=int(os.environ.get("GW_MPOLE", 0)),
                     local_order=int(os.environ.get("GW_ORDER", 3)),
                     grid_sep=int(os.environ.get("GW_SEP", 3)),
                     **caps)
    if os.environ.get("GW_GRIDLEVEL"):
        cfg = cfg.with_(grid_level=int(os.environ["GW_GRIDLEVEL"]))
    if os.environ.get("GW_WINDOW"):
        cfg = cfg.with_(pool_window=int(os.environ["GW_WINDOW"]))
    elif cfg.multipole_order >= 2:
        # 6 extra quad window planes: halve the VMEM-resident window to
        # stay inside the pallas scoped budget (105.7M > 101M at W=256k)
        cfg = cfg.with_(pool_window=131072)
    if os.environ.get("GW_LEAF_N"):
        cfg = cfg.with_(max_leaf_n=int(os.environ["GW_LEAF_N"]))
    if os.environ.get("GW_MAC"):
        cfg = cfg.with_(mac=os.environ["GW_MAC"])
    pos, mass = particles.plummer(jax.random.PRNGKey(0), n)
    td = build.build_tree(np.asarray(pos), np.asarray(mass), cfg)
    if os.environ.get("GW_FIT_TILES", "1") == "1":
        # fit tile_cap to the measured tile count (the static capacity
        # formula's grid-clip term over-provisions ~30x; every gwalk
        # stage pays per-padded-tile costs)
        tc = int(td.n_tiles)
        cfg = cfg.with_(tile_cap=-(-int(tc * 1.1) // 256) * 256)
        td = build.build_tree(np.asarray(pos), np.asarray(mass), cfg)
        print(f"tiles: {tc} -> tile_cap {cfg.tile_cap}", flush=True)
        assert not bool(td.overflow)
    th = jnp.float32(theta)
    ep = jnp.float32(0.0)
    g = jnp.float32(1.0)

    # ---- tune: global caps + per-round frontier caps ----
    t0 = time.perf_counter()
    cfg = engine.tune_gwalk(td, cfg, th, ep, g)
    print(f"tuned in {time.perf_counter()-t0:.1f}s: "
          f"caps=({cfg.m2p_cap}, {cfg.p2p_leaf_cap}, {cfg.p2p_src_cap}, "
          f"{cfg.frontier_cap}) rounds={cfg.gwalk_round_caps}",
          flush=True)

    tiles, tables, Lgrid = engine._query_state(td, cfg, ep)
    (tpos, tidx, blo, bhi, tcell), gx = engine._split_tiles(tiles)
    nc, CH = tpos.shape[:2]
    G0 = nc * CH
    ndim = td.pos.shape[1]
    tpos_f = tpos.reshape(G0, ncrit, ndim)
    tidx_f = tidx.reshape(G0, ncrit)
    blo_f = blo.reshape(G0, ndim)
    bhi_f = bhi.reshape(G0, ndim)
    tcell_f = tcell.reshape(G0, ndim)
    tvalid = tidx_f[:, 0] < n
    use_grid = cfg.farfield in ("grid", "grid2")
    kw = dict(tcell_lo=tcell_f, tcell_hi=tcell_f) if use_grid else {}

    wf = jax.jit(lambda td, th: traversal4.build_global_incidences(
        td, cfg, th, blo_f, bhi_f, tile_valid=tvalid, **kw))

    def timeit(f, *a, reps=3, warm=1):
        for _ in range(warm):
            out = jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jax.block_until_ready(f(*a))
        return (time.perf_counter() - t0) / reps, out

    t_walk, gl = timeit(wf, td, th)
    print(f"walk: {t_walk*1e3:.1f} ms  maxima={np.asarray(gl.maxima)} "
          f"ovf={np.asarray(gl.overflow)}", flush=True)

    block = cfg.pool_block
    W = cfg.pool_window
    Wb = W // block
    pkw = {}
    if use_grid:
        from rakau_tpu import traversal2 as _t2
        from rakau_tpu.grid2 import particle_cells
        L0 = _t2._grid_l0(cfg, n)
        pkw = dict(pcell=particle_cells(td.pos, td.box_size,
                                        cfg.max_depth, L0),
                   tcell_lo=tcell_f, tcell_hi=tcell_f,
                   sep=_t2._grid_sep(cfg), cell_bits=L0)

    pf = jax.jit(lambda td, gl: traversal4.build_pool(
        td, gl, G0, block, cfg.p2p_src_cap, window_blocks=Wb,
        group=cfg.pool_group, **pkw))
    t_pool, pool = timeit(pf, td, gl)
    print(f"pool: {t_pool*1e3:.1f} ms  rows={int(pool.total_rows)} "
          f"({int(pool.total_rows)/n:.1f}/ptcl, cap {cfg.p2p_src_cap}) "
          f"ovf={bool(pool.overflow)}", flush=True)

    NW = -(-cfg.p2p_src_cap // W)

    def kern(pool, tpos_f, tidx_f):
        from rakau_tpu.kernels import dispatch
        pool_cap = cfg.p2p_src_cap
        dtype = td.pos.dtype
        sentinel = jnp.asarray(4.0, dtype) * td.box_size
        ppos = jnp.concatenate(
            [pool.pos[:pool_cap],
             jnp.full((NW * W - pool_cap, ndim), sentinel, dtype)], 0)
        pmass = jnp.concatenate(
            [pool.mass[:pool_cap], jnp.zeros(NW * W - pool_cap, dtype)])
        pidx = jnp.concatenate(
            [pool.idx[:pool_cap], jnp.full(NW * W - pool_cap, -1,
                                           jnp.int32)])
        win = jnp.clip(pool.m2p_blk // Wb, 0, NW - 1)
        start = jnp.clip(pool.m2p_blk - win * Wb, 0, Wb - 1)
        m_nb = jnp.clip(pool.m2p_nblk, 0, jnp.maximum(Wb - start, 0))
        p_nb = jnp.clip(pool.p2p_nblk, 0,
                        jnp.maximum(Wb - start - m_nb, 0))
        sched = jnp.stack([win, start, m_nb, p_nb], axis=1)
        return dispatch.eval_pool(cfg, tpos_f, tidx_f, ppos, pmass,
                                  pidx, sched, W, block, ep, g)

    kf = jax.jit(kern)
    t_kern, (acc, pot) = timeit(kf, pool, tpos_f, tidx_f)
    rows = int(pool.total_rows)
    pairs = rows * ncrit
    print(f"kernel: {t_kern*1e3:.1f} ms  padded pairs={pairs/1e9:.2f}G "
          f"-> {pairs/t_kern/1e9:.1f} Gpairs/s", flush=True)

    af = jax.jit(lambda acc, pot: engine._assemble_impl(td, cfg, acc,
                                                        pot))
    t_asm, _ = timeit(af, acc, pot)
    print(f"assembly: {t_asm*1e3:.1f} ms", flush=True)

    t_all, out = timeit(lambda: engine.acc_pot_u_host(td, cfg, th, ep, g),
                        reps=3)
    print(f"full engine: {t_all*1e3:.1f} ms "
          f"({n/t_all/1e6:.2f}M evals/s) ovf={np.asarray(out[2])}",
          flush=True)
    print(f"stage sum: {(t_walk+t_pool+t_kern+t_asm)*1e3:.1f} ms  "
          f"occupancy={n/(int(td.n_tiles)*ncrit):.2f}", flush=True)

    if os.environ.get("GW_RMS", "1") == "1":
        from rakau_tpu import native as _native
        rng = np.random.default_rng(1)
        samp = np.sort(rng.choice(n, min(512, n), replace=False))
        acc_or, _ = _native.direct_acc_pot(
            np.asarray(td.pos, np.float64), np.asarray(td.mass, np.float64),
            eps=0.0, targets=samp)
        acc_s = np.asarray(out[0])[samp]
        num = np.linalg.norm(acc_s - acc_or, axis=1)
        den = np.linalg.norm(acc_or, axis=1)
        rms = float(np.sqrt(np.mean((num / np.maximum(den, 1e-30)) ** 2)))
        print(f"rms rel force err (512 sampled): {rms:.3e}", flush=True)


if __name__ == "__main__":
    main()

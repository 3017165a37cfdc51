#!/usr/bin/env python
"""Ablation timing of the shared-traversal walk (traversal2) at 1M.

Stages ablated (copied round structure; keep in sync when traversal2
changes — this is a measurement tool, not production code):
  full        : build_shared_sources as shipped
  no_mat      : rounds only, skip union materialization
  no_compact  : rounds with frontier compaction replaced by first-fcap
  no_grid     : rounds without the grid separation drop test
  no_stack    : rounds without the [R,K,C] DUS stack writes
  classify1   : ONE classify call on a full-K id vector, repeated R times
                (pure panel cost, no gather variation)

Also: fused-kernel executed-block stats (mean active blocks per tile) to
get the real (not padded) pair rate.
"""
import os
import time
from functools import partial

import numpy as np


def timeit(fn, reps=3):
    import jax
    out = jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / reps, out


def main():
    from rakau_tpu.utils.tpu import ensure_tpu
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        ensure_tpu()
    import jax
    import jax.numpy as jnp
    from rakau_tpu import build, engine, particles, traversal2
    from rakau_tpu import scan_utils as su
    from rakau_tpu.config import TreeConfig

    I32 = jnp.int32
    n = int(os.environ.get("RAKAU_BENCH_N", 1_000_000))
    theta = float(os.environ.get("RAKAU_BENCH_THETA", 0.75))
    cfg = TreeConfig(
        max_depth=14, max_leaf_n=32, ncrit=512, tile_chunk=64,
        m2p_cap=16384, p2p_leaf_cap=4096, p2p_src_cap=65536,
        frontier_cap=1024,
        farfield=os.environ.get("RAKAU_BENCH_FARFIELD", "grid"))
    pos, mass = particles.plummer(jax.random.PRNGKey(0), n)
    td = jax.jit(build.build_tree, static_argnames=("cfg",))(pos, mass, cfg)
    assert not bool(td.overflow)
    th = jnp.asarray(theta, jnp.float32)
    tiles, tables = engine._tiles_jit(td, cfg)
    tiles_pos, tiles_idx, box_lo, box_hi, tiles_cell = tiles
    n_live = max(1, -(-int(td.n_tiles) // tiles_pos.shape[1]))
    npart = td.pos.shape[0]
    ci = min(4, n_live - 1)  # a busy chunk
    blo, bhi = box_lo[ci], box_hi[ci]
    tcell = tiles_cell[ci]
    tvalid = tiles_idx[ci][:, 0] < npart

    # ---- full walk ----------------------------------------------------
    @partial(jax.jit, static_argnames=("cfg",))
    def walk_full(td, cfg, theta):
        return traversal2.build_shared_sources(
            td, cfg, theta, blo, bhi, tables=tables, tile_cell=tcell,
            tile_valid=tvalid)

    t_full, src = timeit(lambda: walk_full(td, cfg, th))
    print(f"full walk: {t_full*1e3:.2f} ms/chunk; S={src.pos.shape[0]} "
          f"count={int(src.count)} maxima={np.asarray(src.maxima)}",
          flush=True)

    # ---- ablated round loop (copy of traversal2 internals) -----------
    from rakau_tpu.config import MAC_BH_GEOM
    from rakau_tpu.grid import effective_grid_level

    def rounds_only(td, cfg, theta, do_compact=True, do_grid=True,
                    do_stack=True, materialize=False):
        C, D = blo.shape
        dtype = td.pos.dtype
        theta_inv = 1.0 / theta
        lo = blo[:, None, :]
        hi = bhi[:, None, :]
        L0 = effective_grid_level(cfg, npart) if do_grid and \
            cfg.farfield == "grid" else 0
        use_grid = L0 > 0
        fcap = cfg.frontier_cap
        k8 = 2 ** cfg.ndim
        K = fcap * k8
        R = cfg.max_depth + 1

        def classify(ids, par_active_kc):
            valid = ids >= 0
            ids_c = jnp.where(valid, ids, 0)
            row = tables.ff[ids_c]
            com = row[:, :D]
            mass = row[:, 3]
            size = row[:, 4]
            extra = row[:, 5]
            leaf = row[:, 6] > 0.5
            d = jnp.maximum(jnp.maximum(lo - com[None], com[None] - hi), 0.0)
            d2 = jnp.sum(d * d, axis=-1)
            thresh = size * theta_inv + extra
            acc = d2 > (thresh * thresh)[None, :]
            use = par_active_kc.T & valid[None, :]
            if use_grid:
                lvl = row[:, 7].astype(I32)
                ncell = row[:, 8:8 + D].astype(I32)
                sh_n = jnp.maximum(lvl - L0, 0)
                sh_t = jnp.maximum(L0 - lvl, 0)
                ncell_e = ncell >> sh_n[:, None]
                tcell_e = (tcell[:, None, :] >> sh_t[None, :, None])
                sep = jnp.max(jnp.abs(ncell_e[None, :, :] - tcell_e),
                              axis=-1)
                use = use & (sep < 3)
                acc = acc & (lvl >= L0)[None, :]
            accepted = acc & use & (mass > 0)[None, :]
            opened = (~acc) & use
            return accepted.T, (opened & leaf[None, :]).T, \
                (opened & (~leaf)[None, :]).T

        vary0 = (blo[0, 0] * 0).astype(I32)
        m2p_stack = jnp.zeros((R, K, C), bool) & (vary0 > 0)
        p2p_stack = jnp.zeros((R, K, C), bool) & (vary0 > 0)
        id_stack = jnp.full((R, K), -1, I32) + vary0
        root_ids = jnp.concatenate([jnp.zeros(1, I32),
                                    jnp.full(K - 1, -1, I32)])
        root_act = (jnp.arange(K)[:, None] < 1) & tvalid[None, :]
        m0, p0, next0 = classify(root_ids, root_act)
        if do_stack:
            m2p_stack = m2p_stack.at[0].set(m0)
            p2p_stack = p2p_stack.at[0].set(p0)
            id_stack = id_stack.at[0].set(root_ids)
        idxs, cnt0 = su.compact_indices(jnp.any(next0, axis=1), fcap)
        idxs_c = jnp.clip(idxs, 0, K - 1)
        frontier = jnp.where(idxs < K, root_ids[idxs_c], 0)
        f_active = next0[idxs_c] & (idxs < K)[:, None]
        f_cnt = jnp.minimum(cnt0, fcap)

        def round_body(r, carry):
            (frontier, f_cnt, f_active, m2p_stack, p2p_stack,
             id_stack) = carry
            fvalid = jnp.arange(fcap, dtype=I32) < f_cnt
            fr = jnp.where(fvalid, frontier, 0)
            rowi = tables.ii[fr]
            cb = rowi[:, 0]
            cc = rowi[:, 1]
            kids = (cb[:, None] + jnp.arange(k8, dtype=I32)).reshape(-1)
            kval = ((jnp.arange(k8, dtype=I32)[None, :] < cc[:, None])
                    .reshape(-1) & jnp.repeat(fvalid, k8))
            ids = jnp.where(kval, kids, -1)
            par_active = jnp.repeat(f_active, k8, axis=0)
            m2p_m, p2p_m, next_a = classify(ids, par_active)
            if do_stack:
                m2p_stack = jax.lax.dynamic_update_slice(
                    m2p_stack, m2p_m[None], (r, 0, 0))
                p2p_stack = jax.lax.dynamic_update_slice(
                    p2p_stack, p2p_m[None], (r, 0, 0))
                id_stack = jax.lax.dynamic_update_slice(
                    id_stack, ids[None], (r, 0))
            if do_compact:
                f_sel = jnp.any(next_a, axis=1)
                idxs, cnt = su.compact_indices(f_sel, fcap)
                idxs_c = jnp.clip(idxs, 0, K - 1)
                frontier = jnp.where(idxs < K, ids[idxs_c], 0)
                f_active = next_a[idxs_c] & (idxs < K)[:, None]
                f_cnt = jnp.minimum(cnt, fcap)
            else:
                frontier = jnp.where(jnp.arange(fcap) < fcap,
                                     ids[:fcap], 0)
                f_active = next_a[:fcap]
                f_cnt = jnp.minimum(jnp.sum(ids >= 0), fcap)
            return (frontier, f_cnt, f_active, m2p_stack, p2p_stack,
                    id_stack)

        carry = (frontier, f_cnt, f_active, m2p_stack, p2p_stack, id_stack)
        carry = jax.lax.fori_loop(1, R, round_body, carry)
        # tiny summary output so nothing is DCE'd
        return (carry[3].sum(), carry[4].sum(), carry[5].sum())

    variants = [
        ("no_mat     ", dict()),
        ("no_compact ", dict(do_compact=False)),
        ("no_grid    ", dict(do_grid=False)),
        ("no_stack   ", dict(do_stack=False)),
        ("no_stack+cp", dict(do_stack=False, do_compact=False)),
    ]
    for name, kw in variants:
        f = jax.jit(partial(rounds_only, cfg=cfg, **kw),
                    static_argnames=())
        t, _ = timeit(lambda: f(td, theta=th))
        print(f"{name}: {t*1e3:.2f} ms/chunk", flush=True)

    # ---- fused kernel executed-block stats ----------------------------
    from rakau_tpu.kernels import pallas as pk
    block = 1024
    S = src.pos.shape[0]
    nb = -(-S // block)
    mb = np.asarray(src.mask).reshape(src.mask.shape[0], nb, -1).any(2)
    cnt = mb.sum(1)
    print(f"fused-kernel active blocks/tile: mean {cnt.mean():.1f} "
          f"of {nb} ({cnt.mean()/nb*100:.0f}%), max {cnt.max()}",
          flush=True)
    act = float(np.asarray(src.mask).mean())
    print(f"mask density {act*100:.2f}%; in-active-block density "
          f"{act*nb/max(cnt.mean(),1e-9)*100:.1f}%", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Trace-attribute the post-walk pieces of _eval_chunk at realistic 1M
shapes: far_split, m2l, l2p, grid-inherit, mask concat, fused kernel."""
import os
from functools import partial

from trace_attr import trace_call  # same directory


def main():
    from rakau_tpu.utils.tpu import ensure_tpu
    ensure_tpu()
    import jax
    import jax.numpy as jnp
    from rakau_tpu import build, engine, expansion, particles, traversal2
    from rakau_tpu import grid as gridmod
    from rakau_tpu.config import TreeConfig
    from rakau_tpu.kernels import dispatch

    n = 1_000_000
    cfg = TreeConfig(max_depth=14, max_leaf_n=32, ncrit=512,
                     tile_chunk=64, m2p_cap=16384, p2p_leaf_cap=4096,
                     p2p_src_cap=65536, frontier_cap=1024,
                     farfield="grid")
    pos, mass = particles.plummer(jax.random.PRNGKey(0), n)
    td = jax.jit(build.build_tree, static_argnames=("cfg",))(pos, mass, cfg)
    th = jnp.asarray(0.75, jnp.float32)
    ep = jnp.asarray(0.0, jnp.float32)
    g = jnp.asarray(1.0, jnp.float32)
    tiles, tables = engine._tiles_jit(td, cfg)
    tiles_pos, tiles_idx, box_lo, box_hi, tiles_cell = tiles
    npart = td.pos.shape[0]
    ci = 4
    blo, bhi, tcell = box_lo[ci], box_hi[ci], tiles_cell[ci]
    tpos, tidx = tiles_pos[ci], tiles_idx[ci]
    tvalid = tidx[:, 0] < npart
    Lgrid = engine._grid_jit(td, cfg, ep)

    @partial(jax.jit, static_argnames=("cfg",))
    def walk(td, cfg, theta):
        return traversal2.build_shared_sources(
            td, cfg, theta, blo, bhi, tables=tables, tile_cell=tcell,
            tile_valid=tvalid)
    src = jax.block_until_ready(walk(td, cfg, th))

    U = cfg.m2p_cap
    center = 0.5 * (blo + bhi)
    rad2 = jnp.sum((0.5 * (bhi - blo)) ** 2, axis=-1)

    f_split = jax.jit(lambda: expansion.far_split(
        center, rad2, src.pos[:U], src.mass[:U], src.mask[:, :U],
        cfg.local_gamma))
    far, near = jax.block_until_ready(f_split())
    trace_call("far_split", f_split)

    f_m2l = jax.jit(lambda: expansion.m2l(
        center, src.pos[:U], src.mass[:U], far, ep, cfg.local_order))
    L = jax.block_until_ready(f_m2l())
    trace_call("m2l", f_m2l)

    def inherit():
        L0 = gridmod.effective_grid_level(cfg, n)
        flat = gridmod.rowmajor_cell_index(tcell, 3, L0)
        Lg = Lgrid[flat]
        s0 = td.box_size * (2.0 ** -L0)
        cc = (tcell.astype(jnp.float32) + 0.5) * s0 - td.box_size / 2
        shift = jnp.where(tvalid[:, None], center - cc, 0.0)
        return L + jnp.where(tvalid[:, None],
                             expansion.l2l(Lg, shift, cfg.local_order), 0.0)
    trace_call("inherit", jax.jit(inherit))

    f_l2p = jax.jit(lambda: expansion.l2p(L, center, tpos, g,
                                          cfg.local_order))
    trace_call("l2p", f_l2p)

    f_mask = jax.jit(lambda: jnp.concatenate(
        [near, src.mask[:, U:]], axis=1))
    newmask = jax.block_until_ready(f_mask())
    trace_call("mask_concat", f_mask)

    @partial(jax.jit, static_argnames=("cfg",))
    def kern(cfg):
        return dispatch.eval_shared(cfg, tpos, tidx, src.pos, src.mass,
                                    src.idx, newmask, ep, g)
    trace_call("kernel_nearmask", lambda: kern(cfg))

    # whole post-walk section for reference
    @partial(jax.jit, static_argnames=("cfg",))
    def post(cfg):
        far, near = expansion.far_split(
            center, rad2, src.pos[:U], src.mass[:U], src.mask[:, :U],
            cfg.local_gamma)
        mask = jnp.concatenate([near, src.mask[:, U:]], axis=1)
        L = expansion.m2l(center, src.pos[:U], src.mass[:U], far, ep,
                          cfg.local_order)
        L0 = gridmod.effective_grid_level(cfg, n)
        flat = gridmod.rowmajor_cell_index(tcell, 3, L0)
        Lg = Lgrid[flat]
        s0 = td.box_size * (2.0 ** -L0)
        cc = (tcell.astype(jnp.float32) + 0.5) * s0 - td.box_size / 2
        shift = jnp.where(tvalid[:, None], center - cc, 0.0)
        L2 = L + jnp.where(tvalid[:, None],
                           expansion.l2l(Lg, shift, cfg.local_order), 0.0)
        acc_l, pot_l = expansion.l2p(L2, center, tpos, g, cfg.local_order)
        acc, pot = dispatch.eval_shared(cfg, tpos, tidx, src.pos,
                                        src.mass, src.idx, mask, ep, g)
        return acc + acc_l, pot + pot_l
    trace_call("post_walk_all", lambda: post(cfg))


if __name__ == "__main__":
    main()

"""CPU analysis of the lmac+grid2 chunk structure at bench shapes.

Computes, for a few sampled tile chunks: m2p rows, p2p rows, total S,
per-tile active block-step counts (the fused kernel's grid cost), and
useful pairs before/after the per-pair cell kill — to explain the
measured 310 ms/chunk on TPU (1M, theta=0.75, order 4, sep 2).

Run: JAX_PLATFORMS=cpu python benchmarks/lmac_cost_probe.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from rakau_tpu import build, engine, particles
from rakau_tpu.config import TreeConfig

I32 = jnp.int32


def main():
    n = int(os.environ.get("N", 1 << 20))
    cfg = TreeConfig(
        max_depth=14, max_leaf_n=32, ncrit=512, tile_chunk=32,
        m2p_cap=8192, p2p_leaf_cap=2048, p2p_src_cap=65536,
        frontier_cap=1024, farfield="grid2", traversal_mode="lmac",
        local_order=4, grid_sep=2)
    pos, mass = particles.plummer(jax.random.PRNGKey(0), n)
    td = jax.jit(build.build_tree, static_argnames=("cfg",))(pos, mass, cfg)
    print("nodes", int(td.n_nodes), "tiles", int(td.n_tiles), flush=True)
    tiles, tables = engine._tiles_jit(td, cfg)
    (tpos_a, tidx_a, blo_a, bhi_a, tcell_a), gx = engine._split_tiles(tiles)
    tpc_a, clo_a, chi_a = gx
    trav = engine._traversal_mod(cfg)
    th = jnp.asarray(0.75, jnp.float32)
    n_chunks = tidx_a.shape[0]
    n_live = max(1, min(-(-int(td.n_tiles) // tidx_a.shape[1]), n_chunks))
    print("live chunks", n_live, flush=True)

    from rakau_tpu import grid2
    L0 = grid2.effective_grid_level(cfg, n)
    print("L0", L0, flush=True)

    block = 512
    for ci in np.linspace(0, n_live - 1, 5).astype(int):
        tidx = tidx_a[ci]
        tvalid = tidx[:, 0] < n
        src = trav.build_shared_sources(
            td, cfg, th, blo_a[ci], bhi_a[ci], tables=tables,
            tile_valid=tvalid, tcell_lo=clo_a[ci], tcell_hi=chi_a[ci])
        mask = np.asarray(src.mask)                       # [C, S]
        S = mask.shape[1]
        ucap = cfg.m2p_cap
        m2p_rows = int(np.asarray(src.mask)[:, :ucap].any(axis=0).sum())
        p2p_rows = int(mask[:, ucap:].any(axis=0).sum())
        # per-tile active blocks (fused kernel fori_loop steps)
        nb = -(-S // block)
        pad = nb * block - S
        mpad = np.pad(mask, ((0, 0), (0, pad)))
        blk_any = mpad.reshape(mask.shape[0], nb, block).any(axis=2)
        steps = blk_any.sum(axis=1)                        # [C]
        tcnt = np.asarray((tidx < n).sum(axis=1))
        useful_tile = (mask.sum(axis=1) * tcnt).sum()
        # per-pair cell kill (exact): recompute with particle cells
        cells_p = np.asarray(grid2.particle_cells(
            td.pos, td.box_size, cfg.max_depth, L0))
        scell = np.asarray(src.cell)                       # [S, D]
        killed = 0
        kept = 0
        tb = np.asarray(tidx)
        for t in range(mask.shape[0]):
            rows = np.nonzero(mask[t])[0]
            if not rows.size:
                continue
            pidx = tb[t][tb[t] < n]
            pc = cells_p[pidx]                             # [T, D]
            sc = scell[rows]                               # [R, D]
            exempt = sc[:, 0] < 0
            sep = np.abs(pc[:, None, :] - sc[None, :, :]).max(-1)
            dead = (~exempt[None, :]) & (sep >= cfg.grid_sep)
            killed += int(dead.sum())
            kept += int((~dead).sum())
        print(f"chunk {ci}: S={S} m2p_rows={m2p_rows} p2p_rows={p2p_rows} "
              f"steps min/med/max={steps.min()}/{int(np.median(steps))}/"
              f"{steps.max()} useful(tile-mask)={useful_tile:.3g} "
              f"kept={kept} killed={killed} "
              f"kept/particle={kept/max(tcnt.sum(),1):.0f}", flush=True)


if __name__ == "__main__":
    main()

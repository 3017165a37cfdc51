"""Trace-attribute the lmac+grid2 1M query (the 26 s mystery).

Traces separately: (a) the lmac build_shared_sources for one chunk,
(b) the fused kernel launch at realistic shapes, (c) one 4-chunk
_slice_query_jit, (d) the grid2 far field. Prints per-op device ms.

Run (needs the chip): python benchmarks/trace_lmac.py
"""
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from trace_attr import trace_call  # noqa: E402

from rakau_tpu.utils.tpu import ensure_tpu  # noqa: E402
ensure_tpu()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rakau_tpu import build, engine, particles  # noqa: E402
from rakau_tpu.config import TreeConfig  # noqa: E402


def main():
    n = int(os.environ.get("N", 1 << 20))
    # caps near what bench autotune lands on (measured maxima ~1.25x)
    cfg = TreeConfig(
        max_depth=14, max_leaf_n=32, ncrit=512, tile_chunk=32,
        m2p_cap=2048, p2p_leaf_cap=1024, p2p_src_cap=24576,
        frontier_cap=256, farfield="grid2", traversal_mode="lmac",
        local_order=4, grid_sep=2)
    pos, mass = particles.plummer(jax.random.PRNGKey(0), n)
    td = jax.block_until_ready(
        jax.jit(build.build_tree, static_argnames=("cfg",))(pos, mass, cfg))
    th = jnp.asarray(0.75, jnp.float32)
    ep = jnp.asarray(0.0, jnp.float32)
    g = jnp.asarray(1.0, jnp.float32)
    tiles, tables = engine._tiles_jit(td, cfg)
    (tpos_a, tidx_a, blo_a, bhi_a, tcell_a), gx = engine._split_tiles(tiles)
    tpc_a, clo_a, chi_a = gx
    trav = engine._traversal_mod(cfg)
    ci = 4

    @partial(jax.jit, static_argnames=("cfg",))
    def walk(td, cfg, theta):
        tvalid = tidx_a[ci][:, 0] < n
        return trav.build_shared_sources(
            td, cfg, theta, blo_a[ci], bhi_a[ci], tables=tables,
            tile_valid=tvalid, tcell_lo=clo_a[ci], tcell_hi=chi_a[ci])

    src = jax.block_until_ready(walk(td, cfg, th))
    print("src S =", src.pos.shape[0],
          "ovf =", np.asarray(src.overflow), flush=True)
    trace_call("lmac_walk", lambda: walk(td, cfg, th))

    # kernel alone at the same shapes
    from rakau_tpu.kernels import dispatch
    tcell_part = None
    if src.cell is not None:
        from rakau_tpu import grid2
        L0 = grid2.effective_grid_level(cfg, n)
        cells_p = grid2.particle_cells(td.pos, td.box_size, cfg.max_depth,
                                       L0)
        tidx_c = jnp.clip(tidx_a[ci], 0, n - 1)
        tcell_part = jnp.where((tidx_a[ci] < n)[..., None],
                               cells_p[tidx_c], -1)

    @jax.jit
    def kern(src, tpos, tidx):
        return dispatch.eval_shared(cfg, tpos, tidx, src.pos, src.mass,
                                    src.idx, src.mask, ep, g,
                                    src_cell=src.cell, tgt_cell=tcell_part)

    jax.block_until_ready(kern(src, tpos_a[ci], tidx_a[ci]))
    trace_call("fused_kernel", lambda: kern(src, tpos_a[ci], tidx_a[ci]))

    # one 4-chunk engine slice
    cfg4 = cfg
    sl = partial(engine._slice_query_jit, td, cfg4, th, ep, g, tiles,
                 tables, None, 0, 4)
    jax.block_until_ready(sl())
    trace_call("slice4", sl)

    # far field
    far = partial(engine._far_jit, td, cfg, ep, g)
    jax.block_until_ready(far())
    trace_call("far_field", far)


if __name__ == "__main__":
    main()

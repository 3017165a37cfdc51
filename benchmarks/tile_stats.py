"""Tile-extent and per-chunk interaction-cap statistics vs
tile_clip_level (CPU; the diagnosis tool for the wide-halo-tile cap
blowup measured at 1M grid2 on chip).

For each clip level: n_tiles, tile AABB edge distribution (in units of
the L0 cell size), and the per-chunk lmac m2p/p2p row counts
(traversal3 predicate, counts only — no panels), whose MAXIMA are what
bench's caps (and every chunk's padded panel cost) are sized by.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/tile_stats.py
Env: N (262144), CLIPS ("0,3,4,5"), GRIDLEVEL, THETA.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rakau_tpu import build, engine, particles, traversal3  # noqa: E402
from rakau_tpu.config import TreeConfig  # noqa: E402


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    n = int(os.environ.get("N", 262144))
    theta = float(os.environ.get("THETA", 0.75))
    clips = [int(c) for c in os.environ.get("CLIPS", "0,3,4,5").split(",")]
    pos, mass = particles.plummer(jax.random.PRNGKey(0), n)
    for clip in clips:
        cfg = TreeConfig(
            max_depth=14, max_leaf_n=32, ncrit=512, tile_chunk=32,
            m2p_cap=8192, p2p_leaf_cap=2048, p2p_src_cap=65536,
            frontier_cap=65536, farfield="grid2", traversal_mode="lmac",
            local_order=4, grid_sep=2,
            tile_clip_level=clip if clip else None)
        if os.environ.get("GRIDLEVEL"):
            cfg = cfg.with_(grid_level=int(os.environ["GRIDLEVEL"]))
        td = jax.jit(build.build_tree, static_argnames=("cfg",))(
            pos, mass, cfg)
        assert not bool(td.overflow)
        tiles, tables = engine._tiles_jit(td, cfg)
        (tpos, tidx, blo, bhi, tcell), gx = engine._split_tiles(tiles)
        nch, CH = tidx.shape[0], tidx.shape[1]
        n_live = max(1, min(-(-int(td.n_tiles) // CH), nch))
        from rakau_tpu.grid2 import effective_grid_level
        L0 = effective_grid_level(cfg, n)
        s0 = float(td.box_size) * 2.0 ** -L0
        nt = int(td.n_tiles)
        ext = np.asarray((bhi - blo).max(axis=-1)).reshape(-1)[:nt] / s0
        th = jnp.asarray(theta, jnp.float32)

        @jax.jit
        def chunk_counts(td, tables, tidx, blo, bhi, clo, chi):
            tvalid = tidx[:, 0] < n
            dt = td.pos.dtype
            thc = traversal3._clamp_theta(cfg, th, dt, 3)
            big = jnp.asarray(jnp.finfo(dt).max / 4, dt)
            tv = tvalid[:, None]
            ch_lo = jnp.min(jnp.where(tv, blo, big), axis=0)
            ch_hi = jnp.max(jnp.where(tv, bhi, -big), axis=0)
            bigc = jnp.asarray(1 << 30, jnp.int32)
            ch_clo = jnp.min(jnp.where(tv, clo, bigc), axis=0)
            ch_chi = jnp.max(jnp.where(tv, chi, -1), axis=0)
            m2p_sel, p2p_sel = traversal3._box_selection(
                tables.lm, 3, td.box_size, dt, 1.0 / thc, False,
                L0 > 0, L0, cfg.grid_sep, ch_lo, ch_hi, ch_clo, ch_chi)
            lcnt = jnp.where(p2p_sel, td.node_end - td.node_begin, 0)
            return jnp.sum(m2p_sel), jnp.sum(p2p_sel), jnp.sum(lcnt)

        m2p, p2p_leaves, p2p_rows = [], [], []
        for c in range(n_live):
            u, l, p = chunk_counts(td, tables, tidx[c], blo[c], bhi[c],
                                   gx[1][c], gx[2][c])
            m2p.append(int(u)); p2p_leaves.append(int(l))
            p2p_rows.append(int(p))
        m2p = np.array(m2p); p2p_rows = np.array(p2p_rows)
        pct = lambda a: " ".join(
            f"{q}%={int(np.percentile(a, q))}" for q in (50, 90, 99, 100))
        log(f"clip={clip} L0={L0} n_tiles={nt} chunks={n_live} "
            f"tile_ext/cell: med={np.median(ext):.2f} "
            f"p99={np.percentile(ext, 99):.1f} max={ext.max():.1f}")
        log(f"   m2p rows/chunk: {pct(m2p)}")
        log(f"   p2p rows/chunk: {pct(p2p_rows)}  "
            f"sum={p2p_rows.sum()/1e6:.1f}M")
        # anatomy of the monster chunk: its bbox extent (cell units) and
        # how many particles its own tiles hold
        w = int(np.argmax(p2p_rows))
        tv = np.asarray(tidx[w][:, 0] < n)
        cblo = np.asarray(blo[w])[tv].min(axis=0)
        cbhi = np.asarray(bhi[w])[tv].max(axis=0)
        own = int(np.asarray((tidx[w] < n).sum()))
        log(f"   worst chunk #{w}: ext/cell="
            f"{(cbhi - cblo).max() / s0:.2f} own_targets={own} "
            f"p2p={p2p_rows[w]} m2p={m2p[w]}")


if __name__ == "__main__":
    main()

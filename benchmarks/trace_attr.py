#!/usr/bin/env python
"""Device-op attribution via jax.profiler traces (the axon tunnel's ~25ms
round-trip makes naive host timing useless for sub-dispatch costs).

Traces the walk, the fused kernel, and one engine slice separately, then
sums per-op device durations from the trace JSON.
"""
import glob
import gzip
import json
import os
import time
from functools import partial

import numpy as np


def device_ops(trace_dir):
    """Parse newest trace; return [(name, total_ms, count)] on TPU tracks."""
    files = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(files[-1]) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    # find device pids: process_name metadata containing "TPU" / "/device"
    dev_pids = set()
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "device" in nm.lower() or "Chip" in nm:
                dev_pids.add(e.get("pid"))
    out = {}
    for e in ev:
        if e.get("ph") == "X" and (not dev_pids or e.get("pid") in dev_pids):
            nm = e.get("name", "")
            if nm.startswith("$") or "PjitFunction" in nm or nm.startswith(
                    "jit_") or ":" in nm:
                continue
            t, c = out.get(nm, (0.0, 0))
            out[nm] = (t + e.get("dur", 0) / 1e3, c + 1)
    return sorted(((k, v[0], v[1]) for k, v in out.items()),
                  key=lambda x: -x[1])


def trace_call(tag, fn):
    import jax
    jax.block_until_ready(fn())  # warm
    d = f"/tmp/jtrace_{tag}"
    os.system(f"rm -rf {d}")
    with jax.profiler.trace(d):
        jax.block_until_ready(fn())
    ops = device_ops(d)
    tot = sum(o[1] for o in ops)
    print(f"--- {tag}: device total {tot:.2f} ms ---", flush=True)
    for nm, ms, c in ops[:18]:
        print(f"  {ms:8.3f} ms x{c:<4} {nm[:70]}", flush=True)
    return tot


def main():
    from rakau_tpu.utils.tpu import ensure_tpu
    ensure_tpu()
    import jax
    import jax.numpy as jnp
    from rakau_tpu import build, engine, particles, traversal2
    from rakau_tpu.config import TreeConfig
    from rakau_tpu.kernels import dispatch

    n = int(os.environ.get("RAKAU_BENCH_N", 1_000_000))
    cfg = TreeConfig(max_depth=14, max_leaf_n=32, ncrit=512,
                     tile_chunk=64, m2p_cap=16384, p2p_leaf_cap=4096,
                     p2p_src_cap=65536, frontier_cap=1024,
                     farfield=os.environ.get("RAKAU_BENCH_FARFIELD",
                                             "grid"))
    pos, mass = particles.plummer(jax.random.PRNGKey(0), n)
    td = jax.jit(build.build_tree, static_argnames=("cfg",))(pos, mass, cfg)
    th = jnp.asarray(0.75, jnp.float32)
    ep = jnp.asarray(0.0, jnp.float32)
    g = jnp.asarray(1.0, jnp.float32)
    tiles, tables = engine._tiles_jit(td, cfg)
    tiles_pos, tiles_idx, box_lo, box_hi, tiles_cell = tiles
    npart = td.pos.shape[0]
    ci = 4

    @partial(jax.jit, static_argnames=("cfg",))
    def walk(td, cfg, theta):
        return traversal2.build_shared_sources(
            td, cfg, theta, box_lo[ci], box_hi[ci], tables=tables,
            tile_cell=tiles_cell[ci],
            tile_valid=tiles_idx[ci][:, 0] < npart)

    src = jax.block_until_ready(walk(td, cfg, th))
    trace_call("walk", lambda: walk(td, cfg, th))

    @partial(jax.jit, static_argnames=("cfg",))
    def kern(cfg, tpos, tidx, spos, smass, sidx, smask):
        return dispatch.eval_shared(cfg, tpos, tidx, spos, smass, sidx,
                                    smask, ep, g)
    trace_call("kernel", lambda: kern(cfg, tiles_pos[ci], tiles_idx[ci],
                                      src.pos, src.mass, src.idx,
                                      src.mask))

    Lgrid = engine._grid_jit(td, cfg, ep)
    trace_call("slice8", lambda: engine._slice_query_jit(
        td, cfg, th, ep, g, tiles, tables, Lgrid, 0, 8))

    trace_call("build", lambda: jax.jit(
        build.build_tree, static_argnames=("cfg",))(pos, mass, cfg))


if __name__ == "__main__":
    main()

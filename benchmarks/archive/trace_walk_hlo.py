#!/usr/bin/env python
"""(1) Kernel block-size sweep (device-time via trace). (2) Walk trace
with fusion names mapped back to compiled-HLO op definitions."""
import os
import re
from functools import partial

from trace_attr import trace_call, device_ops


def main():
    from rakau_tpu.utils.tpu import ensure_tpu
    ensure_tpu()
    import jax
    import jax.numpy as jnp
    from rakau_tpu import build, engine, particles, traversal2
    from rakau_tpu.config import TreeConfig
    from rakau_tpu.kernels import pallas as pk

    n = 1_000_000
    cfg = TreeConfig(max_depth=14, max_leaf_n=32, ncrit=512,
                     tile_chunk=64, m2p_cap=16384, p2p_leaf_cap=4096,
                     p2p_src_cap=65536, frontier_cap=1024,
                     farfield="grid")
    pos, mass = particles.plummer(jax.random.PRNGKey(0), n)
    td = jax.jit(build.build_tree, static_argnames=("cfg",))(pos, mass, cfg)
    th = jnp.asarray(0.75, jnp.float32)
    ep = jnp.asarray(0.0, jnp.float32)
    tiles, tables = engine._tiles_jit(td, cfg)
    tiles_pos, tiles_idx, box_lo, box_hi, tiles_cell = tiles
    npart = td.pos.shape[0]
    ci = 4
    tvalid = tiles_idx[ci][:, 0] < npart

    @partial(jax.jit, static_argnames=("cfg",))
    def walk(td, cfg, theta):
        return traversal2.build_shared_sources(
            td, cfg, theta, box_lo[ci], box_hi[ci], tables=tables,
            tile_cell=tiles_cell[ci], tile_valid=tvalid)
    src = jax.block_until_ready(walk(td, cfg, th))

    # ---- kernel block sweep ------------------------------------------
    import numpy as np
    mask_np = np.asarray(src.mask)
    S = src.pos.shape[0]
    for B in (128, 256, 512, 1024):
        nb = -(-S // B)
        pad = nb * B - S
        mb = np.pad(mask_np, ((0, 0), (0, pad))).reshape(
            mask_np.shape[0], nb, B).any(2)
        act = mb.sum(1)
        print(f"block={B}: active blocks/tile mean {act.mean():.0f}, "
              f"padded pairs/tile {act.mean()*B*512/1e6:.2f}M", flush=True)

        f = jax.jit(lambda: pk.eval_shared_fused(
            tiles_pos[ci], tiles_idx[ci], src.pos, src.mass, src.idx,
            src.mask, ep, 1.0, block=B))
        try:
            t = trace_call(f"kern_b{B}", f)
        except Exception as e:
            print(f"block={B} FAILED: {str(e)[:200]}", flush=True)

    # ---- walk HLO mapping --------------------------------------------
    lowered = jax.jit(walk, static_argnames=("cfg",)).lower(td, cfg, th)
    hlo = lowered.compile().as_text()
    with open("/tmp/walk_hlo.txt", "w") as f:
        f.write(hlo)
    defs = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.-]+)\s*=", line)
        if m:
            defs[m.group(1)] = line.strip()[:220]
    os.system("rm -rf /tmp/jtrace_walkmap")
    with jax.profiler.trace("/tmp/jtrace_walkmap"):
        jax.block_until_ready(walk(td, cfg, th))
    ops = device_ops("/tmp/jtrace_walkmap")
    print("--- walk ops mapped to HLO ---", flush=True)
    for nm, ms, c in ops[:25]:
        d = defs.get(nm, defs.get(nm.replace("fusion", "fusion"), ""))
        print(f"  {ms:8.3f} ms x{c:<4} {nm[:28]:28} {d[:150]}", flush=True)


if __name__ == "__main__":
    main()

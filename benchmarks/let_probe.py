"""LET halo-volume measurement on the virtual CPU mesh (VERDICT r4
item 8): runs the full distributed LET pipeline at N on an ndev-device
mesh, records the per-(src, dst) export counts and halo bytes, and
checks the LET result against the single-device engine — the measured
counterpart of docs/multislice.md's traffic budget ("export sets at
1M/8-dev are O(10k) rows").

Usage: [LET_NDEV=8] python benchmarks/let_probe.py [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

NDEV = int(os.environ.get("LET_NDEV", 8))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={NDEV}").strip()

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    # persistent CPU compile cache: the 8-dev shard_map graph costs
    # ~an hour of XLA time on this 1-core host — never pay it twice
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    from rakau_tpu import particles, integrate
    from rakau_tpu.config import TreeConfig
    from rakau_tpu.parallel import let, sharded

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    theta = 0.75
    cfg = TreeConfig(max_depth=12, max_leaf_n=32, ncrit=256, tile_chunk=16,
                     m2p_cap=12288, p2p_leaf_cap=4096, p2p_src_cap=49152,
                     frontier_cap=2048)
    pos, mass = particles.plummer(jax.random.PRNGKey(3), n)
    box = 64.0
    mesh = sharded.default_mesh(NDEV)
    th = jnp.float32(theta)
    ep = jnp.float32(0.02)

    t0 = time.time()
    acc, pot, ovf, exp_ovf, exports = let.acc_pot_let(
        pos, mass, cfg, th, ep, 1.0, mesh, box_size=box,
        export_cap=65536, export_node_cap=32768, export_part_cap=131072,
        export_leaf_cap=16384, export_frontier_cap=8192,
        with_stats=True)
    acc = np.asarray(acc)
    wall = time.time() - t0
    exports = np.asarray(exports)          # [ndev, ndev] rows src->dst
    assert not bool(np.asarray(exp_ovf)), "export overflow"
    assert not bool(np.asarray(ovf).any()), np.asarray(ovf)
    row_bytes = 16                          # pos3 + mass, fp32
    off = exports * (1 - np.eye(NDEV, dtype=exports.dtype))
    print(f"n={n} ndev={NDEV} wall={wall:.0f}s")
    print("exports[src,dst] rows:")
    print(exports)
    print(f"per-device export rows: mean {off.sum(1).mean():.0f} "
          f"max {off.sum(1).max()} "
          f"({off.sum(1).max() * row_bytes / 1e6:.2f} MB max/device)")
    print(f"total halo: {off.sum()} rows = "
          f"{off.sum() * row_bytes / 1e6:.2f} MB per query")

    # single-device reference (same MAC envelope claim)
    t0 = time.time()
    acc1, _, _ = integrate.acc_pot(pos, mass, cfg, th, ep, box_size=box)
    acc1 = np.asarray(acc1)
    print(f"single-device query: {time.time()-t0:.0f}s")
    scale = np.linalg.norm(acc1, axis=1).max()
    dev = np.linalg.norm(acc - acc1, axis=1) / scale
    print(f"LET vs single-device: max rel dev {dev.max():.3e}, "
          f"mean {dev.mean():.3e}")


if __name__ == "__main__":
    main()

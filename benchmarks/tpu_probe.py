"""Single-process TPU probe: build/query timing across N and backends.

Run: python benchmarks/tpu_probe.py  (honors RAKAU_PROBE_NS, default
"65536,1048576,8388608"). Keeps one process alive for all experiments
(the axon claim released by a dead process takes minutes to reacquire).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rakau_tpu.utils.tpu import ensure_tpu  # noqa: E402
ensure_tpu()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from rakau_tpu import build, engine, particles, traversal  # noqa: E402
from rakau_tpu.config import TreeConfig  # noqa: E402


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def probe(n, backend, cfg_kw, theta=0.75, reps=3):
    key = jax.random.PRNGKey(0)
    pos, mass = particles.plummer(key, n)
    cfg = TreeConfig(kernel_backend=backend, **cfg_kw)
    build_jit = jax.jit(build.build_tree, static_argnames=("cfg",))
    query_jit = jax.jit(engine.acc_pot_u, static_argnames=("cfg",))
    t0 = time.time()
    td = jax.block_until_ready(build_jit(pos, mass, cfg))
    log(f"n={n} {backend} build cold {time.time()-t0:.2f}s "
        f"nodes={int(td.n_nodes)} tiles={int(td.n_tiles)} "
        f"ovf={bool(td.overflow)}")
    t0 = time.time()
    td = jax.block_until_ready(build_jit(pos, mass, cfg))
    build_s = time.time() - t0
    th, ep, g = (jnp.float32(theta), jnp.float32(0.0), jnp.float32(1.0))
    t0 = time.time()
    out = jax.block_until_ready(query_jit(td, cfg, th, ep, g))
    log(f"n={n} {backend} query cold {time.time()-t0:.2f}s "
        f"ovf={np.asarray(out[2])}")
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(query_jit(td, cfg, th, ep, g))
        times.append(time.time() - t0)
    q = min(times)
    log(f"n={n} {backend} build {build_s*1e3:.1f}ms "
        f"query {q*1e3:.1f}ms -> {n/q/1e6:.1f}M evals/s")
    return td, cfg


def list_stats(td, cfg, theta=0.75):
    """Interaction-list occupancy (padding-waste diagnostics)."""
    tiles_pos, tiles_idx, blo, bhi, _tcell = engine._gather_tiles(td, cfg)
    nch = tiles_pos.shape[0]
    m2p, p2p = [], []
    f = jax.jit(traversal.build_interaction_lists,
                static_argnames=("cfg",))
    for c in range(min(nch, 8)):
        il = f(td, cfg, jnp.float32(theta), blo[c], bhi[c])
        m2p.append(np.asarray(il.m2p_count))
        p2p.append(np.asarray(il.p2p_count))
    m2p = np.concatenate(m2p); p2p = np.concatenate(p2p)
    log(f"m2p count mean={m2p.mean():.0f} p95={np.percentile(m2p,95):.0f} "
        f"max={m2p.max()} cap={cfg.m2p_cap}")
    log(f"p2p count mean={p2p.mean():.0f} p95={np.percentile(p2p,95):.0f} "
        f"max={p2p.max()} cap={cfg.p2p_src_cap}")
    tc = np.asarray(td.tile_cnt)[:int(td.n_tiles)]
    log(f"tile fill mean={tc.mean()/cfg.ncrit:.2f} n_tiles={int(td.n_tiles)}")


if __name__ == "__main__":
    ns = [int(x) for x in os.environ.get(
        "RAKAU_PROBE_NS", "65536,1048576").split(",")]
    log("devices:", jax.devices())
    base = dict(max_depth=12, max_leaf_n=64, ncrit=256, tile_chunk=256,
                m2p_cap=4096, p2p_leaf_cap=1024, p2p_src_cap=8192)
    for n in ns:
        for backend in os.environ.get("RAKAU_PROBE_BACKENDS",
                                      "xla,pallas").split(","):
            try:
                td, cfg = probe(n, backend, base)
            except Exception as e:
                log(f"n={n} {backend} FAILED: {type(e).__name__}: "
                    f"{str(e)[:300]}")
                continue
        try:
            list_stats(td, cfg)
        except Exception as e:
            log(f"list_stats failed: {e}")
    log("done")

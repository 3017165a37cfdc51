"""TPU probe for the shared-candidate traversal: sweep (ncrit,
tile_chunk) at a given N, report query time breakdown."""
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from rakau_tpu.utils.tpu import ensure_tpu  # noqa: E402
ensure_tpu()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from rakau_tpu import build, engine, particles  # noqa: E402
from rakau_tpu.config import TreeConfig  # noqa: E402


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def force(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])
    return x


def main():
    n = int(os.environ.get("N", 1 << 20))
    key = jax.random.PRNGKey(0)
    pos, mass = particles.plummer(key, n)
    log("devices", jax.devices(), "n", n)
    combos = os.environ.get("COMBOS", "256:16,256:32,512:16,512:8")
    for combo in combos.split(","):
        ncrit, chunk = (int(x) for x in combo.split(":"))
        cfg = TreeConfig(max_depth=14,
                         max_leaf_n=int(os.environ.get("LEAF", 64)),
                         ncrit=ncrit,
                         tile_chunk=chunk,
                         m2p_cap=int(os.environ.get("MCAP", 16384)),
                         p2p_src_cap=int(os.environ.get("PCAP", 32768)),
                         p2p_leaf_cap=int(os.environ.get("LCAP", 2048)),
                         frontier_cap=int(os.environ.get("FCAP", 2048)),
                         kernel_backend=os.environ.get("KB", "pallas"))
        try:
            bj = jax.jit(build.build_tree, static_argnames=("cfg",))
            t0 = time.time()
            td = force(bj(pos, mass, cfg))
            tb = time.time() - t0
            t0 = time.time()
            td = force(bj(pos, mass, cfg))
            tbw = time.time() - t0
            t0 = time.time()
            acc, pot, ovf, mx = engine.acc_pot_u_host(
                td, cfg, 0.75, 0.0, slice_chunks=16)
            force((acc, pot))
            tq0 = time.time() - t0
            if bool(np.asarray(ovf).any()):
                log(f"{combo}: OVF {np.asarray(ovf)} maxima {np.asarray(mx)}")
                continue
            ts = []
            for _ in range(3):
                t0 = time.time()
                acc, pot, ovf, mx = engine.acc_pot_u_host(
                    td, cfg, 0.75, 0.0, slice_chunks=16)
                force((acc, pot))
                ts.append(time.time() - t0)
            q = min(ts)
            log(f"ncrit={ncrit} chunk={chunk}: build {tbw*1e3:.0f}ms "
                f"query first {tq0:.1f}s warm {q*1e3:.0f}ms -> "
                f"{n/q/1e6:.2f}M evals/s  maxima={np.asarray(mx)} "
                f"tiles={int(td.n_tiles)}")
        except Exception as e:
            log(f"{combo}: FAILED {type(e).__name__} {str(e)[:200]}")
    log("done")


if __name__ == "__main__":
    main()

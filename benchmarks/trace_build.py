"""Trace-attribute the tree build (the r2 build regression: warm build
5.1 s -> 9.8 s at 8M, 496 ms -> ~1.5 s at 1M; VERDICT r2 item 4).

Traces jit(build_tree) at N (env, default 1M) and prints per-op device
durations, then re-traces with the suspect features disabled one at a
time via monkeypatched cheap stand-ins is NOT possible under jit — so
instead the per-op table itself attributes the cost (sort vs scans vs
node-table sort vs parent search vs gathers).

Run (chip): python benchmarks/trace_build.py     Env: N, MPOLE.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from trace_attr import trace_call  # noqa: E402

from rakau_tpu.utils.tpu import ensure_tpu  # noqa: E402
ensure_tpu()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rakau_tpu import build, particles  # noqa: E402
from rakau_tpu.config import TreeConfig  # noqa: E402


def main():
    n = int(os.environ.get("N", 1 << 20))
    cfg = TreeConfig(
        max_depth=int(os.environ.get("DEPTH", 14)), max_leaf_n=32,
        ncrit=512, tile_chunk=32,
        multipole_order=int(os.environ.get("MPOLE", 0)))
    pos, mass = particles.plummer(jax.random.PRNGKey(0), n)
    bj = jax.jit(build.build_tree, static_argnames=("cfg",))
    trace_call(f"build_n{n}", lambda: bj(pos, mass, cfg))


if __name__ == "__main__":
    main()

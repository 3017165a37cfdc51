"""Probe: what fused-kernel roofs does a raised per-kernel VMEM budget
(pltpu.CompilerParams(vmem_limit_bytes), pallas.fused_vmem_budget)
unlock?

The v5e core has 128 MB VMEM but XLA's *scoped* (stack) accounting caps
custom calls at 16 MB by default, which is the cliff every fused-kernel
segment had been tuned around (pallas.fused_vmem_src_limit). A client-
side XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib fails at local flag
parse (CPU XLA doesn't know the flag), so the budget rides the Mosaic
compiler params instead.

Prints one line per (mode, block, S): Gpairs/s or the failure class.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    from rakau_tpu.utils.tpu import ensure_tpu
    ensure_tpu()
    import jax
    import jax.numpy as jnp
    from rakau_tpu.kernels import pallas as pk

    log("devices:", jax.devices())
    log("XLA_FLAGS:", os.environ.get("XLA_FLAGS", "<unset>"))

    C, T, D = 32, 512, 3
    reps = 8

    cases = []
    for mode in ("grid2", "plain"):
        for block, S in [(1024, 262144), (2048, 262144), (4096, 262144),
                         (8192, 262144), (2048, 524288), (4096, 524288)]:
            cases.append((mode, block, S))

    for mode, block, S in cases:
        tgt = (jnp.arange(C * T * D, dtype=jnp.float32)
               .reshape(C, T, D) % 251.0) * 1e-3 + 1.0
        src = (jnp.arange(S * D, dtype=jnp.float32)
               .reshape(S, D) % 257.0) * 1e-3 - 1.0
        smass = jnp.ones((S,), jnp.float32)
        sidx = jnp.full((S,), -1, jnp.int32)
        tidx = jnp.arange(C * T, dtype=jnp.int32).reshape(C, T)
        mask = jnp.ones((C, S), bool)
        g2 = mode == "grid2"
        scell = jnp.zeros((S, D), jnp.int32) if g2 else None
        tcell = jnp.zeros((C, T, D), jnp.int32) if g2 else None
        ep = jnp.float32(0.0)
        gg = jnp.float32(1.0)

        def run(tgt):
            def step(t, _):
                a, p = pk.eval_shared_fused(
                    t, tidx, src, smass, sidx, mask, ep, gg, block=block,
                    src_cell=scell, tgt_cell=tcell, grid_sep=3 if g2 else 0)
                return t + 1e-12 * a, p[0, 0]
            t_fin, ps = jax.lax.scan(step, tgt, None, length=reps)
            return t_fin[0, 0, 0] + ps.sum()

        f = jax.jit(run)
        try:
            t0 = time.perf_counter()
            jax.block_until_ready(f(tgt))
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(f(tgt))
            dt = time.perf_counter() - t0
            rate = reps * C * T * S / dt
            log(f"{mode} block={block} S={S}: {rate/1e9:.1f} Gpairs/s "
                f"(cold {cold:.0f}s)")
        except Exception as e:
            msg = repr(e)
            key = "scoped" if "scoped" in msg else "other"
            i = msg.find("Scoped allocation")
            log(f"{mode} block={block} S={S}: FAILED ({key}) "
                f"{msg[i:i+90] if i >= 0 else msg[:200]}")


if __name__ == "__main__":
    main()

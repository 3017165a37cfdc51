"""Round-3 TPU sweep driver.

Stages:
  m2l   — M2L conv formulation probe at headline sizes,
  roof  — fused-kernel roof vs block size (metrics.measure_kernel_roof),
  sweep — bench.main() over an env-combo list (RAKAU_SWEEP, semicolon
          list of comma k=v sets applied on top of the lmac8m base),
          e.g. RAKAU_SWEEP="GRIDLEVEL=6;GRIDLEVEL=7,PALLAS_BLOCK=1024"

Every section is optional: RAKAU_R3=m2l,roof,sweep (default all).

The orchestrator runs each section (and each sweep combo) in its OWN
subprocess: a device-side RESOURCE_EXHAUSTED poisons the claiming
process's runtime for good (measured: every later dispatch fails in
0 s), so isolation is the only way one bad stage doesn't void the rest
of the session. ensure_tpu() in each child retries the claim while the
previous child's claim releases."""
import os
import subprocess
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


BASE = dict(RAKAU_BENCH_N="8388608", RAKAU_BENCH_REPS="3",
            RAKAU_BENCH_THETA="0.75", RAKAU_BENCH_TRAVERSAL="lmac",
            RAKAU_BENCH_FARFIELD="grid2", RAKAU_BENCH_ORDER="4",
            RAKAU_BENCH_SEP="2", RAKAU_BENCH_MPOLE="0")

# sweep-combo keys: BENCH_* and any other RAKAU_* knob, written without
# the RAKAU_ prefix, e.g. "BENCH_GRIDLEVEL=7,PALLAS_BLOCK=1024" (legacy
# bare names like GRIDLEVEL=7 mean BENCH_GRIDLEVEL)
_SWEEP_RESET = ("RAKAU_BENCH_", "RAKAU_PALLAS_", "RAKAU_M2L_")


def run_m2l():
    import jax
    import numpy as np
    from rakau_tpu import grid2
    import jax.numpy as jnp
    cases = [(64, 4, 2), (128, 4, 2), (64, 6, 3), (128, 6, 2),
             (128, 6, 3)]
    if os.environ.get("RAKAU_M2L_CASES"):
        cases = [tuple(int(x) for x in c.split("/"))
                 for c in os.environ["RAKAU_M2L_CASES"].split(",")]
    for (G, order, sep) in cases:
        NM = grid2.n_coeffs(3, order)
        M = jax.random.normal(jax.random.PRNGKey(0), (G ** 3, NM),
                              jnp.float32)
        W = grid2.m2l_kernels(3, order, order, sep, 1.0 / G, 0.0)
        K = W.shape[1]
        NL = W.shape[-2]
        flops = G ** 3 * K ** 3 * NM * NL * 2

        outs = {}
        variants = [("v1_2d", "2d", "highest"),
                    ("v1_2d_high", "2d", "high")]
        if G <= 64:
            variants.insert(0, ("v0_3d", "3d", "highest"))
        for name, env, prec in variants:
            # W as a jit ARG: a closed-over W becomes an MLIR literal
            # and order-6/sep-3 kernels (300 MB) blow the remote-compile
            # request-body limit (HTTP 413)
            def fn(m, w, _e=env, _p=prec):
                os.environ["RAKAU_M2L_CONV"] = _e
                os.environ["RAKAU_M2L_PREC"] = _p
                return grid2._parity_conv(m, w, 3, G)
            f = jax.jit(fn)
            try:
                t0 = time.time()
                o = np.asarray(f(M, W))
                cold = time.time() - t0
                t0 = time.time()
                r = 3
                for _ in range(r):
                    o2 = f(M, W)
                o2.block_until_ready()
                warm = (time.time() - t0) / r
                outs[name] = np.asarray(o2)
                log(f"m2l G={G} p=q={order} sep={sep} {name}: "
                    f"warm={warm*1e3:.1f}ms cold={cold:.0f}s "
                    f"-> {flops/warm/1e12:.2f} TF/s")
            except Exception as e:
                log(f"m2l G={G} {name} FAILED: {e!r}")
        if "v1_2d" in outs:
            ref = outs["v1_2d"]
            for k, v in outs.items():
                if k == "v1_2d":
                    continue
                log(f"  {k} vs v1_2d max abs dev: "
                    f"{np.abs(ref - v).max():.3e} "
                    f"(scale {np.abs(ref).max():.3e})")


def run_roof():
    from rakau_tpu import metrics
    from rakau_tpu.config import TreeConfig
    for desc, kw, blocks in [
            ("plain mono", dict(), (2048, 4096)),
            ("grid2 mono", dict(farfield="grid2"), (1024, 2048, 4096)),
            ("grid2 quad", dict(farfield="grid2", multipole_order=2),
             (512, 1024, 2048)),
            # small tiles: fewer self-pairs per target (processed floor
            # is T) IF the kernel rate survives the narrower panels
            ("grid2 mono T=256", dict(farfield="grid2", ncrit=256,
                                      tile_chunk=64), (2048,)),
            ("grid2 mono T=128", dict(farfield="grid2", ncrit=128,
                                      tile_chunk=128), (2048,)),
            ("grid2 quad T=256", dict(farfield="grid2", ncrit=256,
                                      tile_chunk=64, multipole_order=2),
             (1024,)),
    ]:
        for b in blocks:
            os.environ["RAKAU_PALLAS_BLOCK"] = str(b)
            try:
                cfg = TreeConfig(**kw)
                r = metrics.measure_kernel_roof(cfg)
                log(f"roof {desc} block={b}: {r/1e9:.1f} Gpairs/s")
            except Exception as e:
                log(f"roof {desc} block={b} FAILED: {e!r}")
    os.environ.pop("RAKAU_PALLAS_BLOCK", None)


def run_one_sweep():
    import bench
    bench.main()


def _combo_env(combo: str):
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(_SWEEP_RESET)}
    env.update(BASE)
    for kv in combo.split(","):
        k, v = kv.split("=")
        k = k.strip()
        if not k.startswith(("BENCH_", "PALLAS_", "M2L_")):
            k = f"BENCH_{k}"
        env[f"RAKAU_{k}"] = v.strip()
    return env


def _spawn(child: str, env, timeout_s: int = None) -> int:
    if timeout_s is None:
        timeout_s = int(os.environ.get("RAKAU_CHILD_TIMEOUT", 3600))
    env = dict(env)
    env["RAKAU_R3_CHILD"] = child
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, timeout=timeout_s)
        return r.returncode
    except subprocess.TimeoutExpired:
        log(f"child {child} TIMED OUT after {timeout_s}s")
        return -9


def main():
    sections = os.environ.get("RAKAU_R3", "m2l,roof,sweep").split(",")
    for s in sections:
        s = s.strip()
        log(f"### section {s} ###")
        if s == "sweep":
            combos = os.environ.get(
                "RAKAU_SWEEP", "GRIDLEVEL=6;GRIDLEVEL=7").split(";")
            for combo in (c.strip() for c in combos):
                if not combo:
                    continue
                log(f"=== sweep {combo} ===")
                t0 = time.time()
                rc = _spawn("sweep_one", _combo_env(combo))
                log(f"=== sweep {combo} done rc={rc} "
                    f"in {time.time()-t0:.0f}s ===")
        else:
            rc = _spawn(s, os.environ)
            log(f"### section {s} done rc={rc} ###")


def child_main(child: str):
    from rakau_tpu.utils.tpu import ensure_tpu
    ensure_tpu()
    fn = {"m2l": run_m2l, "roof": run_roof,
          "sweep_one": run_one_sweep}[child]
    try:
        fn()
    except Exception as e:
        traceback.print_exc()
        log(f"child {child} FAILED: {e!r}")
        sys.exit(1)


if __name__ == "__main__":
    c = os.environ.get("RAKAU_R3_CHILD")
    if c:
        child_main(c)
    else:
        main()

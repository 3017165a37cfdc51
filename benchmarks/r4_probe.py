"""Round-4 on-chip probes (VERDICT r3 items 1/2/6).

Sections (RAKAU_R4 env, comma list; each runs in its own subprocess so
one RESOURCE_EXHAUSTED cannot poison the rest — same pattern as
r3_sweep):

  attr8m : per-op device attribution of ONE host-driver slice of the 8M
           shared+grid bench config (after the same overflow/fit_caps
           flow bench.py runs), plus the far field and assembly — owns
           the "where do the other 6.6 s go" question.
  mxu    : MXU fused-kernel variant (pallas._shared_fused_kernel_mxu):
           on-chip correctness vs the VPU kernel at small size, then
           measure_kernel_roof for mono/grid2 at y_prec
           default/high/highest vs the VPU baseline. Go/no-go data.
  rooft  : kernel roof vs tile width (ncrit 512/256/128) for mono and
           grid2 — the tile-size lever trades union inflation against
           panel efficiency; this is the panel-efficiency side.
"""
import os
import subprocess
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def _bench_cfg_8m():
    """The bench-default 8M shared+grid config."""
    from rakau_tpu.config import TreeConfig
    return TreeConfig(max_depth=14, max_leaf_n=32, ncrit=512,
                      tile_chunk=32, m2p_cap=8192, p2p_leaf_cap=2048,
                      p2p_src_cap=65536, frontier_cap=1024,
                      farfield="grid", traversal_mode="shared",
                      local_order=3, grid_sep=3)


def run_attr8m():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from trace_attr import trace_call
    from rakau_tpu import build, engine, particles
    from rakau_tpu.config import fit_caps

    n = int(os.environ.get("RAKAU_BENCH_N", 8_388_608))
    cfg = _bench_cfg_8m()
    pos, mass = particles.plummer(jax.random.PRNGKey(0), n)
    t0 = time.time()
    td = jax.block_until_ready(
        jax.jit(build.build_tree, static_argnames=("cfg",))(pos, mass, cfg))
    log(f"build done {time.time()-t0:.0f}s n_tiles={int(td.n_tiles)}")
    th = jnp.asarray(0.75, jnp.float32)
    ep = jnp.asarray(0.0, jnp.float32)
    g = jnp.asarray(1.0, jnp.float32)
    # the same cap-growth + fit flow bench.py uses, so the traced slice
    # runs the exact benched executable
    acc, pot, ovf, mx = engine.acc_pot_u_host(td, cfg, th, ep, g)
    for _ in range(6):
        flags = np.asarray(ovf)
        if not flags.any():
            break
        fields = ("m2p_cap", "p2p_leaf_cap", "p2p_src_cap",
                  "frontier_cap")
        cfg = cfg.with_(**{f: 2 * getattr(cfg, f)
                           for f, hit in zip(fields, flags) if hit})
        acc, pot, ovf, mx = engine.acc_pot_u_host(td, cfg, th, ep, g)
    cfg = fit_caps(cfg, np.asarray(mx))
    log(f"caps: m2p={cfg.m2p_cap} p2pleaf={cfg.p2p_leaf_cap} "
        f"p2psrc={cfg.p2p_src_cap} frontier={cfg.frontier_cap}")
    t0 = time.time()
    acc, pot, ovf, mx = engine.acc_pot_u_host(td, cfg, th, ep, g)
    jax.block_until_ready(acc)
    log(f"fit-caps query: {time.time()-t0:.2f}s (incl recompiles? warm "
        f"check below)")
    t0 = time.time()
    acc, pot, ovf, mx = engine.acc_pot_u_host(td, cfg, th, ep, g)
    jax.block_until_ready(acc)
    full_q = time.time() - t0
    log(f"warm full query: {full_q:.2f}s")

    tiles, tables = engine._tiles_jit(td, cfg)
    Lgrid = engine._grid_jit(td, cfg, ep)
    n_chunks = tiles[0].shape[0]
    CH = tiles[0].shape[1]
    n_live = max(1, -(-int(td.n_tiles) // CH))
    K = min(32, n_live)
    log(f"n_chunks={n_chunks} live={n_live} tile_chunk={CH} K={K} "
        f"slices={-(-n_live // K)}")
    slice_ms = trace_call("slice32_8m", lambda: engine._slice_query_jit(
        td, cfg, th, ep, g, tiles, tables, Lgrid, 0, K))
    log(f"slice of {K} chunks: {slice_ms:.1f} ms device "
        f"-> {slice_ms/K:.2f} ms/chunk "
        f"-> {slice_ms * (n_live / K) / 1e3:.2f}s extrapolated")
    if Lgrid is not None:
        trace_call("gridfar_8m", lambda: engine._grid_jit(td, cfg, ep))
    trace_call("tiles_gather_8m", lambda: engine._tiles_jit(td, cfg))
    trace_call("build_8m", lambda: jax.jit(
        build.build_tree, static_argnames=("cfg",))(pos, mass, cfg))


def run_attrparts():
    """Walk-alone and kernel-alone device times at 8M with bench-fitted
    caps — the slice trace nests ops inside the lax.map while, so the
    clean split needs separate executables."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from trace_attr import trace_call
    from rakau_tpu import build, engine, particles, traversal2
    from rakau_tpu.kernels import dispatch

    n = int(os.environ.get("RAKAU_BENCH_N", 8_388_608))
    cfg = _bench_cfg_8m()
    # caps measured by attr8m's fit flow (2026-08-21): rerunning the
    # growth loop would waste 10 min of chip
    cfg = cfg.with_(m2p_cap=9728, p2p_leaf_cap=5888, p2p_src_cap=47104,
                    frontier_cap=int(os.environ.get("RAKAU_FCAP", 1024)))
    pos, mass = particles.plummer(jax.random.PRNGKey(0), n)
    td = jax.block_until_ready(
        jax.jit(build.build_tree, static_argnames=("cfg",))(pos, mass,
                                                            cfg))
    th = jnp.asarray(0.75, jnp.float32)
    ep = jnp.asarray(0.0, jnp.float32)
    g = jnp.asarray(1.0, jnp.float32)
    tiles, tables = engine._tiles_jit(td, cfg)
    tiles_pos, tiles_idx, box_lo, box_hi, tiles_cell = tiles
    npart = td.pos.shape[0]
    ci = 6  # a mid-density chunk

    from functools import partial

    # every operand as a jit ARG: closed-over tables/tile arrays become
    # MLIR literals and blow the remote-compile body limit (HTTP 413)
    @partial(jax.jit, static_argnames=("cfg",))
    def walk(td, cfg, theta, tabs, blo, bhi, tcell, tvalid):
        return traversal2.build_shared_sources(
            td, cfg, theta, blo, bhi, tables=tabs,
            tile_cell=tcell, tile_valid=tvalid)

    cis = [int(x) for x in os.environ.get("RAKAU_CI", str(ci)).split(",")]
    ablates = [a for a in os.environ.get(
        "RAKAU_ABLATES", "").split(";")] if os.environ.get(
        "RAKAU_ABLATES") is not None else [""]
    src = None
    for ab in ablates:
        os.environ["RAKAU_T2_ABLATE"] = ab
        # env is read at trace time; force a fresh trace per ablation
        walk.clear_cache()
        for ci_ in cis:
            wargs = (td, cfg, th, tables, box_lo[ci_], box_hi[ci_],
                     tiles_cell[ci_], tiles_idx[ci_][:, 0] < npart)
            s0 = jax.block_until_ready(walk(*wargs))
            t0 = time.time()
            for _ in range(5):
                jax.block_until_ready(walk(*wargs).pos)
            dt = (time.time() - t0) / 5 * 1e3
            log(f"walk+mat ci={ci_} ablate='{ab}': {dt:.2f} ms/chunk")
            if ab == "" and ci_ == cis[-1]:
                src = s0
                wargs_keep = wargs
    os.environ["RAKAU_T2_ABLATE"] = ""
    walk.clear_cache()
    trace_call("walk8m", lambda: walk(*wargs_keep))

    @partial(jax.jit, static_argnames=("cfg",))
    def kern(cfg, tpos, tidx, spos, smass, sidx, smask):
        return dispatch.eval_shared(cfg, tpos, tidx, spos, smass, sidx,
                                    smask, ep, g)

    ci_k = cis[-1]
    args = (cfg, tiles_pos[ci_k], tiles_idx[ci_k], src.pos, src.mass,
            src.idx, src.mask)
    jax.block_until_ready(kern(*args))
    t0 = time.time()
    for _ in range(5):
        out = kern(*args)
    jax.block_until_ready(out)
    log(f"kernel-alone wall: {(time.time()-t0)/5*1e3:.2f} ms/chunk")
    trace_call("kern8m", lambda: kern(*args))


def run_vmapab():
    """A/B the vmapped slice walk (RAKAU_WALK_VMAP) on the full 8M
    shared+grid query: same tree, same caps, warm wall times."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rakau_tpu import build, engine, particles

    n = int(os.environ.get("RAKAU_BENCH_N", 8_388_608))
    cfg = _bench_cfg_8m()
    cfg = cfg.with_(m2p_cap=9728, p2p_leaf_cap=5888, p2p_src_cap=47104,
                    frontier_cap=1024,
                    tile_chunk=int(os.environ.get("RAKAU_AB_CHUNK", 32)))
    pos, mass = particles.plummer(jax.random.PRNGKey(0), n)
    td = jax.block_until_ready(
        jax.jit(build.build_tree, static_argnames=("cfg",))(pos, mass,
                                                            cfg))
    th = jnp.asarray(0.75, jnp.float32)
    ep = jnp.asarray(0.0, jnp.float32)
    g = jnp.asarray(1.0, jnp.float32)
    for flag in ("0", "1", "0", "1"):
        os.environ["RAKAU_WALK_VMAP"] = flag
        engine._slice_query_jit.clear_cache()
        t0 = time.time()
        acc, pot, ovf, mx = engine.acc_pot_u_host(td, cfg, th, ep, g)
        jax.block_until_ready(acc)
        cold = time.time() - t0
        t0 = time.time()
        acc, pot, ovf, mx = engine.acc_pot_u_host(td, cfg, th, ep, g)
        jax.block_until_ready(acc)
        warm = time.time() - t0
        log(f"vmap={flag}: warm {warm:.2f}s cold {cold:.1f}s "
            f"ovf={list(np.asarray(ovf))} evals/s={n/warm:.3g}")
    os.environ.pop("RAKAU_WALK_VMAP", None)


def run_mxu():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from rakau_tpu.kernels import pallas as pk
    from rakau_tpu import metrics
    from rakau_tpu.config import TreeConfig

    rng = np.random.default_rng(0)
    C, T, D, S = 4, 512, 3, 4096
    tgt = jnp.asarray(rng.normal(0.5, 0.2, (C, T, D)).astype(np.float32))
    tidx = jnp.arange(C * T, dtype=jnp.int32).reshape(C, T)
    src = jnp.asarray(rng.normal(0.5, 0.2, (S, D)).astype(np.float32))
    smass = jnp.asarray(rng.uniform(0.5, 1.0, S).astype(np.float32))
    sidx = jnp.full((S,), -1, jnp.int32)
    src = src.at[:T].set(tgt[0])
    sidx = sidx.at[:T].set(jnp.arange(T))
    mask = jnp.asarray(rng.random((C, S)) < 0.8)
    scell = jnp.asarray(rng.integers(0, 8, (S, D)), jnp.int32)
    tcell = jnp.asarray(rng.integers(0, 8, (C, T, D)), jnp.int32)

    def run(mxu, prec="high", grid=False):
        os.environ["RAKAU_PALLAS_MXU"] = "1" if mxu else "0"
        os.environ["RAKAU_MXU_PREC"] = prec
        kw = dict(src_cell=scell, tgt_cell=tcell, grid_sep=3) if grid \
            else {}
        f = jax.jit(lambda *a: pk.eval_shared_fused(*a, block=2048, **kw))
        return jax.block_until_ready(
            f(tgt, tidx, src, smass, sidx, mask,
              jnp.float32(0.01), jnp.float32(1.0)))

    for grid in (False, True):
        a0, p0 = run(False, grid=grid)
        a0 = np.asarray(a0)
        p0 = np.asarray(p0)
        sc = float(np.abs(a0).max())
        for prec in ("highest", "x3", "bf16"):
            a1, p1 = run(True, prec, grid=grid)
            da = float(np.abs(np.asarray(a1) - a0).max()) / sc
            dp = (float(np.abs(np.asarray(p1) - p0).max())
                  / float(np.abs(p0).max()))
            log(f"mxu correctness grid={grid} prec={prec}: "
                f"acc dev {da:.2e} pot dev {dp:.2e}")

    # roofs via the same harness the bench MFU uses
    for ff in ("m2p", "grid2"):
        cfg = TreeConfig(farfield=ff) if ff == "grid2" else TreeConfig()
        os.environ["RAKAU_PALLAS_MXU"] = "0"
        r0 = metrics.measure_kernel_roof(cfg)
        log(f"roof {ff} vpu: {r0/1e9:.1f} Gpairs/s")
        os.environ["RAKAU_PALLAS_MXU"] = "1"
        for prec in ("bf16", "x3", "highest"):
            os.environ["RAKAU_MXU_PREC"] = prec
            try:
                r1 = metrics.measure_kernel_roof(cfg)
                log(f"roof {ff} mxu/{prec}: {r1/1e9:.1f} Gpairs/s "
                    f"({r1/r0:.2f}x)")
            except Exception as e:
                log(f"roof {ff} mxu/{prec} FAILED: {e!r}")
    os.environ["RAKAU_PALLAS_MXU"] = "0"


def run_rooft():
    from rakau_tpu import metrics
    from rakau_tpu.config import TreeConfig
    for ff_kw in (dict(), dict(farfield="grid2")):
        for ncrit, chunk in ((512, 32), (256, 64), (128, 128)):
            cfg = TreeConfig(ncrit=ncrit, tile_chunk=chunk, **ff_kw)
            for mxu in ("0", "1"):
                os.environ["RAKAU_PALLAS_MXU"] = mxu
                try:
                    r = metrics.measure_kernel_roof(cfg)
                    log(f"roof {ff_kw or 'mono'} T={ncrit} mxu={mxu}: "
                        f"{r/1e9:.1f} Gpairs/s")
                except Exception as e:
                    log(f"roof T={ncrit} mxu={mxu} FAILED: {e!r}")
    os.environ["RAKAU_PALLAS_MXU"] = "0"


def _spawn(child: str, timeout_s: int = None) -> int:
    if timeout_s is None:
        timeout_s = int(os.environ.get("RAKAU_CHILD_TIMEOUT", 3600))
    env = dict(os.environ)
    env["RAKAU_R4_CHILD"] = child
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, timeout=timeout_s)
        return r.returncode
    except subprocess.TimeoutExpired:
        log(f"child {child} TIMED OUT after {timeout_s}s")
        return -9


def main():
    for s in os.environ.get("RAKAU_R4", "attr8m,mxu,rooft").split(","):
        s = s.strip()
        if not s:
            continue
        for attempt in range(3):
            log(f"### section {s} (attempt {attempt}) ###")
            t0 = time.time()
            rc = _spawn(s)
            log(f"### section {s} done rc={rc} "
                f"in {time.time()-t0:.0f}s ###")
            if rc != 3:
                break
            # first-dispatch watchdog tripped: a stale device claim
            # blocks execution RPCs and only expires server-side
            # (~15 min observed). Sleep it out, then retry.
            log("claim watchdog tripped; sleeping 900 s for the stale "
                "claim TTL")
            time.sleep(900)


def child_main(child: str):
    import signal

    def _trip(signum, frame):
        log("FIRST-DISPATCH WATCHDOG: device did not answer in 240 s "
            "(stale claim?); exiting 3")
        os._exit(3)

    # armed BEFORE ensure_tpu: the observed block is jax.devices()
    # waiting forever inside the claim, not the first computation
    signal.signal(signal.SIGALRM, _trip)
    signal.alarm(240)
    from rakau_tpu.utils.tpu import ensure_tpu
    ensure_tpu()
    import jax
    import jax.numpy as jnp
    jax.block_until_ready(jax.jit(lambda x: x + 1)(jnp.ones(8)))
    signal.alarm(0)
    fn = {"attr8m": run_attr8m, "attrparts": run_attrparts,
          "vmapab": run_vmapab, "mxu": run_mxu,
          "rooft": run_rooft}[child]
    try:
        fn()
    except Exception:
        traceback.print_exc()
        sys.exit(1)


if __name__ == "__main__":
    c = os.environ.get("RAKAU_R4_CHILD")
    if c:
        child_main(c)
    else:
        main()

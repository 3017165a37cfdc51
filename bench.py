#!/usr/bin/env python
"""Headline benchmark: particle-accel evaluations/sec/chip at theta=0.75.

BASELINE.json north star: >= 1e9 particle-accel evals/sec/chip on 8M
particles at theta=0.75, within the per-theta accuracy envelope (RMS
relative force error vs direct-sum; sampled fp64 oracle).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...aux...}

"value" counts completed full-query particle-acceleration evaluations per
second per chip (N_particles * reps / wall_time on one chip), the natural
reading of the north-star metric. The aux block also reports pairwise
interaction throughput, tree build time, and the sampled RMS force error.

Env knobs: RAKAU_BENCH_N (particles), RAKAU_BENCH_REPS, RAKAU_BENCH_THETA,
RAKAU_BENCH_PRESET (quick|full).
"""
import json
import os
import sys
import time
from functools import partial

import numpy as np


def main():
    from rakau_tpu.utils.tpu import ensure_tpu
    ensure_tpu()
    import jax
    import jax.numpy as jnp
    from rakau_tpu import build, engine, particles
    from rakau_tpu.config import TreeConfig
    from rakau_tpu.direct import direct_acc_pot_np

    backend = jax.default_backend()
    on_accel = backend in ("tpu", "gpu")
    n = int(os.environ.get("RAKAU_BENCH_N", 8_000_000 if on_accel
                           else 65_536))
    reps = int(os.environ.get("RAKAU_BENCH_REPS", 5 if on_accel else 2))
    theta = float(os.environ.get("RAKAU_BENCH_THETA", 0.75))
    eps = 0.0

    key = jax.random.PRNGKey(0)
    pos, mass = particles.plummer(key, n)
    trav = os.environ.get("RAKAU_BENCH_TRAVERSAL", "shared")
    if trav == "gwalk":
        # gwalk caps are GLOBAL (config.py): start from measured
        # per-particle ratios (262k/1M probes) and let the tuning pass
        # shrink/grow them
        gdef = dict(m2p=3 * n, leaf=n, src=16 * n, fcap=n // 4)
    else:
        gdef = dict(m2p=9728, leaf=5888, src=47104,
                    fcap=65536 if trav == "lmac" else 1024)
    cfg = TreeConfig(
        max_depth=int(os.environ.get("RAKAU_BENCH_DEPTH", 14)),
        max_leaf_n=int(os.environ.get("RAKAU_BENCH_LEAF", 32)),
        ncrit=int(os.environ.get("RAKAU_BENCH_NCRIT", 512)),
        tile_chunk=int(os.environ.get("RAKAU_BENCH_CHUNK", 32)),
        # shared defaults = the measured fitted caps of the 8M default
        # run (aux "caps", r4): when the maxima fit first try, the
        # growth loop and the fit re-jit both skip — two fewer cold
        # compiles on the driver's fresh-container run
        m2p_cap=int(os.environ.get("RAKAU_BENCH_M2P", gdef["m2p"])),
        p2p_leaf_cap=int(os.environ.get("RAKAU_BENCH_P2PLEAF",
                                        gdef["leaf"])),
        p2p_src_cap=int(os.environ.get("RAKAU_BENCH_P2PSRC", gdef["src"])),
        # lmac reuses frontier_cap as the slice-level group-candidate
        # capacity (engine._slice_query_jit); needs ~node-table scale
        frontier_cap=int(os.environ.get("RAKAU_BENCH_FCAP", gdef["fcap"])),
        farfield=os.environ.get("RAKAU_BENCH_FARFIELD", "grid"),
        accum=os.environ.get("RAKAU_BENCH_ACCUM", "fp32"),
        traversal_mode=trav,
        local_order=int(os.environ.get("RAKAU_BENCH_ORDER", 3)),
        grid_sep=int(os.environ.get("RAKAU_BENCH_SEP", 3)),
        multipole_order=int(os.environ.get("RAKAU_BENCH_MPOLE", 0)),
    )
    if os.environ.get("RAKAU_BENCH_GRIDLEVEL"):
        cfg = cfg.with_(grid_level=int(os.environ["RAKAU_BENCH_GRIDLEVEL"]))
    if cfg.traversal_mode == "gwalk" and cfg.multipole_order >= 2:
        # 6 extra quad window planes: halve the VMEM-resident pool
        # window to stay inside the pallas scoped budget
        cfg = cfg.with_(pool_window=int(
            os.environ.get("RAKAU_BENCH_WINDOW", 131072)))
    if os.environ.get("RAKAU_BENCH_GAMMA"):
        cfg = cfg.with_(local_gamma=float(os.environ["RAKAU_BENCH_GAMMA"]))

    build_jit = jax.jit(build.build_tree, static_argnames=("cfg",))

    def query_jit(td, cfg, th, ep, g):
        # host-sliced driver (watchdog-safe dispatches)
        return engine.acc_pot_u_host(td, cfg, th, ep, g)

    def force(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0])
        return x

    # --- build (timed separately; the headline is query throughput) ---
    t0 = time.perf_counter()
    td = force(build_jit(pos, mass, cfg))
    build_cold = time.perf_counter() - t0
    if cfg.traversal_mode == "gwalk" and not bool(td.overflow):
        # fit tile_cap to the measured tile count: the static capacity
        # formula's grid-clip term over-provisions, and every padded
        # tile costs a kernel grid step + walk/pool slots in gwalk
        tc = int(td.n_tiles)
        fitted_tc = -(-int(tc * 1.1) // 256) * 256
        if fitted_tc < cfg.tile_capacity(n):
            cfg = cfg.with_(tile_cap=fitted_tc)
            td = force(build_jit(pos, mass, cfg))
    t0 = time.perf_counter()
    td = force(build_jit(pos, mass, cfg))
    build_s = time.perf_counter() - t0
    if bool(td.overflow):
        print(json.dumps({"metric": "error", "value": 0.0,
                          "unit": "tree build overflow",
                          "vs_baseline": 0.0}))
        return

    th = jnp.asarray(theta, cfg.jdtype)
    ep = jnp.asarray(eps, cfg.jdtype)
    g = jnp.asarray(1.0, cfg.jdtype)

    # Grow ONLY the overflowed capacities (ovf aligns with OVF_FIELDS).
    # Round 2's "26 s mystery" was this loop quadrupling EVERYTHING:
    # the shared source row blew past pallas.FUSED_VMEM_SRC_LIMIT and
    # dispatch fell back to the slow XLA kernel for the whole bench.
    from rakau_tpu.config import grow_overflowed
    if cfg.traversal_mode == "gwalk":
        rc = os.environ.get("RAKAU_BENCH_ROUNDCAPS")
        if rc:
            # pre-fitted round caps (baked like the shared caps above):
            # skips the dynamic-walk tuning compile on fresh containers
            cfg = cfg.with_(gwalk_round_caps=tuple(
                int(x) for x in rc.split(",")))
        else:
            # one tuning pass fits the global caps AND the per-round
            # frontier caps (engine.tune_gwalk)
            cfg = engine.tune_gwalk(td, cfg, th, ep, g)
    acc, pot, ovf, mx = force(query_jit(td, cfg, th, ep, g))
    for _ in range(6):
        flags = np.asarray(ovf)
        if not flags.any():
            break
        cfg = grow_overflowed(cfg, flags)
        acc, pot, ovf, mx = force(query_jit(td, cfg, th, ep, g))

    # --- shrink caps to measured maxima (padding waste is the main TPU
    # perf risk, SURVEY.md §8) and re-jit for the timed runs ---
    if (os.environ.get("RAKAU_BENCH_AUTOTUNE", "1") != "0"
            and cfg.traversal_mode != "gwalk"):
        from rakau_tpu.config import fit_caps
        cfg = fit_caps(cfg, np.asarray(mx))
        acc, pot, ovf, mx = force(query_jit(td, cfg, th, ep, g))
        if bool(np.asarray(ovf).any()):  # paranoia: fall back
            cfg = cfg.with_(m2p_cap=2 * cfg.m2p_cap,
                            p2p_src_cap=2 * cfg.p2p_src_cap,
                            p2p_leaf_cap=2 * cfg.p2p_leaf_cap,
                            frontier_cap=2 * cfg.frontier_cap)
            acc, pot, ovf, mx = force(query_jit(td, cfg, th, ep, g))

    t0 = time.perf_counter()
    for _ in range(reps):
        acc, pot, ovf, mx = query_jit(td, cfg, th, ep, g)
    jax.block_until_ready((acc, pot))
    np.asarray(acc)
    query_s = (time.perf_counter() - t0) / reps

    evals_per_sec = n / query_s

    # --- kernel useful-pair density (VERDICT r1 item 8): the single
    # number that says whether traversal restructuring is working ---
    density_aux = {}
    from rakau_tpu import engine as _eng
    if (_eng._use_shared(cfg)
            and os.environ.get("RAKAU_BENCH_DENSITY", "1") != "0"):
        try:
            from rakau_tpu import metrics
            ds = metrics.collect_shared_density(td, cfg, theta, eps=eps)
            density_aux = {
                "kernel_density": ds.density,
                "slot_density": ds.slot_density,
                "useful_pairs_per_particle": ds.pairs_per_particle,
                "useful_pairs_per_sec": ds.useful_pairs / query_s,
                "processed_pairs_per_sec": ds.processed_pairs / query_s,
            }
            if os.environ.get("RAKAU_BENCH_MFU", "1") != "0":
                # measured dense ceiling of the same kernel config ->
                # how much of the kernel's own roof the query achieves
                roof = metrics.measure_kernel_roof(cfg)
                density_aux["kernel_roof_pairs_per_sec"] = roof
                density_aux["kernel_mfu"] = (
                    ds.processed_pairs / query_s / roof)
                density_aux["useful_mfu"] = (
                    ds.useful_pairs / query_s / roof)
        except Exception as e:  # diagnostics must never fail the bench
            density_aux = {"kernel_density_error": repr(e)}

    # --- sampled accuracy vs fp64 oracle (native OpenMP when available;
    # 512 targets — VERDICT r1 "bench accuracy sampling is thin") ---
    from rakau_tpu import native as _native
    n_sample = min(int(os.environ.get("RAKAU_BENCH_SAMPLES", 512)), n)
    rng = np.random.default_rng(1)
    samp = np.sort(rng.choice(n, n_sample, replace=False))
    pos_np = np.asarray(td.pos, np.float64)
    mass_np = np.asarray(td.mass, np.float64)
    acc_o, pot_o = _native.direct_acc_pot(pos_np, mass_np, eps=eps,
                                          targets=samp)
    acc_s = np.asarray(acc)[samp]
    num = np.linalg.norm(acc_s - acc_o, axis=1)
    den = np.linalg.norm(acc_o, axis=1)
    rms_err = float(np.sqrt(np.mean((num / np.maximum(den, 1e-300)) ** 2)))
    pot_s = np.asarray(pot)[samp]
    rel_p = np.abs(pot_s - pot_o) / np.maximum(np.abs(pot_o), 1e-300)
    rms_pot_err = float(np.sqrt(np.mean(rel_p ** 2)))

    out = {
        "metric": "particle-accel evals/sec/chip at "
                  f"{n/1e6:.3g}M, theta={theta}",
        "value": float(evals_per_sec),
        "unit": "evals/sec/chip",
        "vs_baseline": float(evals_per_sec / 1e9),
        "aux": {
            "backend": backend,
            "caps": [cfg.m2p_cap, cfg.p2p_leaf_cap, cfg.p2p_src_cap,
                     cfg.frontier_cap],
            "n": n,
            "theta": theta,
            "query_ms": query_s * 1e3,
            "build_ms": build_s * 1e3,
            "build_cold_ms": build_cold * 1e3,
            "rms_rel_force_err_sampled": rms_err,
            "rms_rel_pot_err_sampled": rms_pot_err,
            "reps": reps,
            "n_nodes": int(td.n_nodes),
            "n_tiles": int(td.n_tiles),
            "farfield": cfg.farfield,
            **density_aux,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

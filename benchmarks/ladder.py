"""On-chip accuracy ladder: RMS vs (local order p, grid mpole q, sep,
theta, quad) for lmac+grid2 at 65k (geometry-driven errors transfer to
8M; VERDICT r2 item 3).

Each rung builds the tree, runs the full engine query on the chip, and
checks 2048 sampled targets against the native fp64 oracle. Prints one
line per rung: rms / max rel force err + query wall.

Run: python benchmarks/ladder.py   Env: N (65536), RUNGS (semicolon
list of p,q,sep,theta,mpole[,L0]), REPS (1).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rakau_tpu.utils.tpu import ensure_tpu  # noqa: E402
ensure_tpu()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from rakau_tpu import build, engine, native, particles  # noqa: E402
from rakau_tpu.config import TreeConfig, fit_caps  # noqa: E402

N = int(os.environ.get("N", 65536))
DEFAULT_RUNGS = ";".join([
    "4,4,2,0.75,0",      # mono baseline (far-field floor ~2.8e-3)
    "6,6,2,0.75,2",      # cheap-conv quad: is sep2 enough at order 6?
    "7,7,2,0.75,2",
    "8,8,2,0.75,2",
    "6,6,3,0.75,2",      # the 65k gate config at headline theta
    "6,6,3,0.65,2",
    "8,6,3,0.75,2",      # asymmetric p/q: cheaper conv, same rms?
    "6,6,3,0.5,2",       # the proven gate rung (7.9e-5)
])


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    rungs = os.environ.get("RUNGS", DEFAULT_RUNGS).split(";")
    key = jax.random.PRNGKey(0)
    pos, mass = particles.plummer(key, N)
    pos_np = np.asarray(pos, np.float64)
    mass_np = np.asarray(mass, np.float64)
    samp = np.sort(np.random.default_rng(1).choice(N, 2048, replace=False))
    acc_o, _ = native.direct_acc_pot(pos_np, mass_np, eps=0.0,
                                     targets=samp)
    den = np.linalg.norm(acc_o, axis=1)
    log(f"N={N} oracle ready ({len(samp)} targets)")

    for rung in rungs:
        f = [s.strip() for s in rung.split(",")]
        p, q, sep, theta, mpole = (int(f[0]), int(f[1]), int(f[2]),
                                   float(f[3]), int(f[4]))
        # optional trailing fields: bare int = L0; key=value pairs pass
        # through to TreeConfig (traversal_mode=shared, accum=..., ...)
        L0 = None
        extra = {}
        for tok in f[5:]:
            if "=" in tok:
                k, v = tok.split("=", 1)
                extra[k] = int(v) if v.lstrip("-").isdigit() else v
            elif tok:
                L0 = int(tok)
        kw = dict(max_depth=14, max_leaf_n=32, ncrit=512,
                  tile_chunk=32, traversal_mode="lmac",
                  farfield="grid2", local_order=p,
                  grid_multipole_order=q, grid_sep=sep,
                  multipole_order=mpole, frontier_cap=65536,
                  grid_level=L0,
                  # 1M-scale starting caps (the 65k defaults overflowed
                  # every 1M rung past the single x4 retry, r4)
                  m2p_cap=16384, p2p_leaf_cap=16384,
                  p2p_src_cap=131072)
        kw.update(extra)
        if kw["traversal_mode"] != "lmac" and "frontier_cap" not in extra:
            kw["frontier_cap"] = 4096
        cfg = TreeConfig(**kw)
        try:
            t0 = time.time()
            td = build.build_tree(pos, mass, cfg)
            out = engine.acc_pot_u_host(td, cfg, theta, 0.0, 1.0)
            acc, pot, ovf, mx = out
            # per-flag growth until clean (results with ANY overflow
            # are silently wrong — the r4 ladder burned 35 min of chip
            # printing rms=5 garbage on one under-sized retry)
            for _ in range(3):
                flags = np.asarray(ovf)
                if not flags.any():
                    break
                fields = ("m2p_cap", "p2p_leaf_cap", "p2p_src_cap",
                          "frontier_cap")
                cfg = cfg.with_(**{fl: 4 * getattr(cfg, fl)
                                   for fl, hit in zip(fields, flags)
                                   if hit})
                acc, pot, ovf, mx = engine.acc_pot_u_host(
                    td, cfg, theta, 0.0, 1.0)
            cold = time.time() - t0
            t0 = time.time()
            acc, pot, ovf, mx = engine.acc_pot_u_host(
                td, cfg, theta, 0.0, 1.0)
            # acc is Morton-ordered (_u); map to user order before
            # indexing with user-order sample ids (this mismatch made
            # every 1M rung print rms~5 in the first r4 ladder run)
            acc = np.asarray(acc)[np.asarray(td.inv_perm)]
            warm = time.time() - t0
            rel = (np.linalg.norm(acc[samp] - acc_o, axis=1)
                   / np.maximum(den, 1e-300))
            rms = float(np.sqrt(np.mean(rel ** 2)))
            log(f"p={p} q={q} sep={sep} th={theta} quad={mpole//2} "
                f"L0={L0}: rms={rms:.3e} max={rel.max():.3e} "
                f"warm={warm:.2f}s cold={cold:.0f}s "
                f"ovf={list(np.asarray(ovf))}")
        except Exception as e:
            log(f"rung {rung} FAILED: {e!r}")


if __name__ == "__main__":
    main()

"""One-process TPU measurement session (round 2).

Runs bench.py's main() across a stage list (env RAKAU_STAGES, comma
list) without releasing the axon claim between stages. Stages:

  gate65k   : 65k lmac+grid2 order-6/sep-3 quad theta=0.5 (accuracy gate)
  lmac1m    : 1M  lmac+grid2 order-4/sep-2 mono theta=0.75
  shared1m  : 1M  shared+grid r1-style theta=0.75 (comparison)
  lmac8m    : 8M  lmac+grid2 order-4/sep-2 mono theta=0.75 (headline)

Each stage prints the bench's one-line JSON tagged with the stage name.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STAGES = {
    "gate65k": dict(RAKAU_BENCH_N="65536", RAKAU_BENCH_REPS="2",
                    RAKAU_BENCH_THETA="0.5", RAKAU_BENCH_TRAVERSAL="lmac",
                    RAKAU_BENCH_FARFIELD="grid2", RAKAU_BENCH_ORDER="6",
                    RAKAU_BENCH_SEP="3", RAKAU_BENCH_MPOLE="2"),
    "lmac1m": dict(RAKAU_BENCH_N="1048576", RAKAU_BENCH_REPS="3",
                   RAKAU_BENCH_THETA="0.75", RAKAU_BENCH_TRAVERSAL="lmac",
                   RAKAU_BENCH_FARFIELD="grid2", RAKAU_BENCH_ORDER="4",
                   RAKAU_BENCH_SEP="2", RAKAU_BENCH_MPOLE="0"),
    "shared1m": dict(RAKAU_BENCH_N="1048576", RAKAU_BENCH_REPS="3",
                     RAKAU_BENCH_THETA="0.75",
                     RAKAU_BENCH_TRAVERSAL="shared",
                     RAKAU_BENCH_FARFIELD="grid", RAKAU_BENCH_ORDER="3",
                     RAKAU_BENCH_SEP="3", RAKAU_BENCH_MPOLE="0"),
    "lmac8m": dict(RAKAU_BENCH_N="8388608", RAKAU_BENCH_REPS="3",
                   RAKAU_BENCH_THETA="0.75", RAKAU_BENCH_TRAVERSAL="lmac",
                   RAKAU_BENCH_FARFIELD="grid2", RAKAU_BENCH_ORDER="4",
                   RAKAU_BENCH_SEP="2", RAKAU_BENCH_MPOLE="0"),
    # deeper leaf grid: ~4 particles/cell at 8M, near field ~27 cells
    "lmac8m_l7": dict(RAKAU_BENCH_N="8388608", RAKAU_BENCH_REPS="3",
                      RAKAU_BENCH_THETA="0.75",
                      RAKAU_BENCH_TRAVERSAL="lmac",
                      RAKAU_BENCH_FARFIELD="grid2", RAKAU_BENCH_ORDER="4",
                      RAKAU_BENCH_SEP="2", RAKAU_BENCH_MPOLE="0",
                      RAKAU_BENCH_GRIDLEVEL="7"),
    "lmac1m_l6": dict(RAKAU_BENCH_N="1048576", RAKAU_BENCH_REPS="3",
                      RAKAU_BENCH_THETA="0.75",
                      RAKAU_BENCH_TRAVERSAL="lmac",
                      RAKAU_BENCH_FARFIELD="grid2", RAKAU_BENCH_ORDER="4",
                      RAKAU_BENCH_SEP="2", RAKAU_BENCH_MPOLE="0",
                      RAKAU_BENCH_GRIDLEVEL="6"),
    # the bench-default (driver-run) configuration: shared walk + grid
    "shared8m": dict(RAKAU_BENCH_N="8388608", RAKAU_BENCH_REPS="3",
                     RAKAU_BENCH_THETA="0.75",
                     RAKAU_BENCH_TRAVERSAL="shared",
                     RAKAU_BENCH_FARFIELD="grid", RAKAU_BENCH_ORDER="3",
                     RAKAU_BENCH_SEP="3", RAKAU_BENCH_MPOLE="0"),
}


def run_configs(configs="2,3", scale=None):
    """BASELINE configs at scale on the live chip (VERDICT r1 item 5)."""
    sys.argv = ["configs.py", "--configs", configs] + (
        ["--scale", str(scale)] if scale is not None else [])
    import runpy
    runpy.run_path(os.path.join(os.path.dirname(__file__), "configs.py"),
                   run_name="__main__")


def main():
    import traceback

    import bench
    names = [n.strip() for n in os.environ.get(
        "RAKAU_STAGES", "gate65k,lmac1m,shared1m,lmac8m").split(",")]
    # validate ALL names before burning chip time on any stage
    bad = [n for n in names if not n.startswith("cfg:") and n not in STAGES]
    if bad:
        print(f"unknown stage(s) {bad}; valid: "
              f"{sorted(STAGES)} or cfg:<ids>", flush=True)
        sys.exit(2)
    failed = []
    for name in names:
        if name.startswith("cfg:"):
            print(f"=== stage {name} ===", flush=True)
            t0 = time.time()
            try:
                run_configs(name.split(":", 1)[1])
            except Exception as e:
                failed.append(name)
                traceback.print_exc()
                print(f"stage {name} FAILED: {e!r}", flush=True)
            print(f"=== stage {name} done in {time.time()-t0:.1f}s ===",
                  flush=True)
            continue
        env = STAGES[name]
        for k in [k for k in os.environ if k.startswith("RAKAU_BENCH_")]:
            del os.environ[k]
        os.environ.update(env)
        print(f"=== stage {name} {env} ===", flush=True)
        t0 = time.time()
        try:
            bench.main()
        except Exception as e:
            failed.append(name)
            traceback.print_exc()
            print(f"stage {name} FAILED: {e!r}", flush=True)
        print(f"=== stage {name} done in {time.time()-t0:.1f}s ===",
              flush=True)
    if failed:
        print(f"FAILED stages: {failed}", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()

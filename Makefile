# Local CI-equivalent targets (reference C21: circleci/appveyor configs;
# here: make targets runnable in any checkout, SURVEY.md §2).
#
# Tests force the CPU backend with 8 virtual devices so the multi-chip
# sharding suite runs without hardware (tests/conftest.py); bench targets
# use the real accelerator when one is attached.

PY ?= python
PYTEST_ENV = PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

.PHONY: test test-fast bench bench-quick native lint dryrun all

test:
	$(PYTEST_ENV) $(PY) -m pytest tests/ -q

test-fast:
	$(PYTEST_ENV) $(PY) -m pytest tests/ -q -x -m "not slow"

native:
	cd native && ./build.sh

bench:
	$(PY) bench.py

bench-quick:
	RAKAU_BENCH_N=262144 RAKAU_BENCH_REPS=2 $(PY) bench.py

dryrun:
	$(PYTEST_ENV) $(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('multichip dryrun OK')"

lint:
	$(PY) -m compileall -q rakau_tpu tests benchmarks bench.py __graft_entry__.py

all: lint test

"""Test env: CPU backend with 8 virtual devices (multi-chip sharding tests
run on a simulated mesh, SURVEY.md §5 "shard-count invariance"), x64 enabled
so the fp64 tree path is exercisable (TPU runs stay fp32).

Note: the environment may pre-import jax and force JAX_PLATFORMS=axon (TPU
tunnel) via sitecustomize, so both the env var and the live jax config are
overridden here. For fast local iteration run tests as
`PALLAS_AXON_POOL_IPS= python -m pytest ...` to skip the ~30s TPU tunnel
registration entirely.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# NOTE: RAKAU_DIAG_MODES is deliberately NOT set suite-wide. The r4
# MULTICHIP regression shipped because the whole suite ran with it set,
# so no test could exercise the product-mode validation that broke
# (VERDICT r4 weak #2). Tests that exercise the diagnostic modes (lists
# traversal, quad fallback paths) opt in via the `diag_modes` fixture.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may already be imported (sitecustomize) with platforms=axon baked in
# from the env; override the live config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache for the CPU test graphs (single-core machine:
# sort-bearing XLA:CPU compiles dominate suite wall time otherwise).
# Separate dir from the TPU cache; same-host reuse only.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    # real `slow` marker so `make test-fast` (-m "not slow") actually
    # deselects the expensive accuracy/matrix tests (VERDICT r2 item 9)
    config.addinivalue_line(
        "markers", "slow: multi-minute CPU test (deselected by test-fast)")


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def diag_modes(monkeypatch):
    """Opt-in for tests whose SUBJECT is a diagnostic mode (the 'lists'
    traversal, quad-with-tile-expansion fallbacks). Everything else runs
    with product-mode validation live."""
    monkeypatch.setenv("RAKAU_DIAG_MODES", "1")

"""TPU attach helpers for the axon-tunneled single-chip environment.

The environment registers the TPU PJRT plugin in sitecustomize; that
registration can fail transiently (e.g., the previous process's device
claim has not been released yet). `ensure_tpu` retries the registration
in-process so benchmarks don't flake."""
from __future__ import annotations

import os
import time
import uuid


def enable_compile_cache(path: str = "/root/.jax_cache"):
    """Persistent compilation cache — essential here: Mosaic/XLA compiles
    of the tree kernels take minutes on this platform."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def ensure_tpu(retries: int = 30, sleep_s: float = 15.0) -> bool:
    """Return True if a TPU backend is live (retrying registration)."""
    import jax
    if os.environ.get("JAX_PLATFORMS", "") not in ("axon", "tpu", ""):
        return False
    # Cache only TPU executables (CPU AOT entries are host-feature
    # sensitive and unsafe to share).
    enable_compile_cache()
    for attempt in range(retries):
        try:
            jax.devices()
            return True
        except RuntimeError:
            pass
        try:
            from axon.register import register
            register(
                None,
                f"{os.environ.get('PALLAS_AXON_TPU_GEN', 'v5e')}:1x1x1",
                so_path="/opt/axon/libaxon_pjrt.so",
                session_id=str(uuid.uuid4()),
                remote_compile=os.environ.get(
                    "PALLAS_AXON_REMOTE_COMPILE") == "1",
            )
            jax.devices()
            return True
        except Exception:
            time.sleep(sleep_s)
    return False

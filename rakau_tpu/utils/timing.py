"""Phase timing (reference: `detail/simple_timer.hpp` scoped RAII timers
around encode/sort/build/traverse phases, SURVEY.md C17).

Enabled via RAKAU_TPU_TIMING=1 or `enable(True)`; collects wall times per
phase into a module registry and optionally prints. On-device work is
asynchronous under JAX, so timers measure dispatch+blocking only when the
caller synchronizes; benchmark code blocks explicitly."""
from __future__ import annotations

import os
import time
from collections import defaultdict
from contextlib import contextmanager

_enabled = os.environ.get("RAKAU_TPU_TIMING", "") not in ("", "0")
_records = defaultdict(list)


def enable(on: bool = True):
    global _enabled
    _enabled = on


def records():
    return {k: list(v) for k, v in _records.items()}


def reset():
    _records.clear()


@contextmanager
def phase_timer(name: str):
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _records[name].append(dt)
        print(f"[rakau_tpu] {name}: {dt * 1e3:.3f} ms", flush=True)

"""Tracing / profiling: per-stage wall-clock + throughput, jax.profiler.

The reference's only telemetry is a wall-clock print in its job runner
(gadget/python/script_util.py:8,23).  Here profiling is first-class:
``StageTimer`` collects per-stage durations and item throughputs (the
edges/s the BASELINE metric asks for), and ``trace`` wraps
``jax.profiler.trace`` for TensorBoard-compatible device traces.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Dict, List, Optional


class StageTimer:
    def __init__(self):
        self.records: List[dict] = []

    @contextlib.contextmanager
    def stage(self, name: str, n_items: Optional[int] = None,
              unit: str = "items"):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            rec = {"stage": name, "seconds": dt}
            if n_items is not None:
                rec[f"{unit}_per_s"] = n_items / dt if dt > 0 else 0.0
                rec["n"] = n_items
            self.records.append(rec)

    def report(self, file=sys.stderr):
        for r in self.records:
            extra = "".join(
                f" {k}={v:,.0f}" for k, v in r.items()
                if k not in ("stage", "seconds"))
            print(f"[timer] {r['stage']}: {r['seconds']*1e3:.1f}ms{extra}",
                  file=file)

    def json(self) -> str:
        return json.dumps(self.records)


@contextlib.contextmanager
def trace(logdir: str):
    """Device trace via jax.profiler (view in TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_and_time(fn, *args, n_iter=10, warmup=1):
    """Time a jitted function with proper device synchronization."""
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter, out

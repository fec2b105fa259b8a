"""Tracing / profiling utilities.

The reference has NO tracing or profiling (SURVEY.md §5: wall-clock-free
print logging only). TPU-native replacements:
  * `annotate(name)` — jax.profiler trace annotation visible in
    TensorBoard/XProf traces;
  * `trace(dir)` — capture a device trace around a code block;
  * `StepTimer` — robust wall-clock phase timing. NOTE: on tunneled TPU
    platforms `jax.block_until_ready` can return at enqueue-ack rather than
    completion, so `StepTimer.sync` forces a genuine device->host readback
    (the same lesson is baked into bench.py).
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def annotate(name: str):
    """Trace annotation context: shows up as a named span in XProf."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace (view with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree: Any) -> float:
    """Force device work in `tree` to finish via a host readback; returns a
    (meaningless) scalar so the transfer cannot be elided."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    x = leaves[0]
    if getattr(x, "size", 1) > 1 and hasattr(x, "aval"):
        # slice ON DEVICE first: np.asarray on the full array would pull
        # the whole buffer through the (slow, tunnelled) transfer link and
        # dominate the measurement for MB-sized outputs
        x = jnp.ravel(x)[0]
    return float(np.asarray(x))


class StepTimer:
    """Accumulates per-phase wall-clock timings.

    with timer.phase("data"):               # host work
        batch = next(loader)
    with timer.phase("step") as ph:         # device work: hand the phase the
        state, m = model.train_step(state, batch)
        ph["sync"] = (state, m)             # OUTPUT of the step to sync on
    # (a sync target captured at `with`-entry would already be materialised
    # and return immediately — the enqueue-ack pitfall described above)
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        result_holder: dict[str, Any] = {}
        try:
            yield result_holder
        finally:
            if "sync" in result_holder:
                sync(result_holder["sync"])
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            name: {"total_s": self.totals[name], "count": self.counts[name],
                   "mean_ms": self.totals[name] / max(self.counts[name], 1) * 1e3}
            for name in self.totals
        }

    def report(self) -> str:
        return json.dumps(self.summary(), sort_keys=True)

"""Profiling / tracing subsystem (SURVEY.md §5: absent in the reference;
needed here to certify images/sec/chip).

- `StepTimer`: wall-clock per-step statistics with warmup exclusion; honest
  through async dispatch when used with `block=True` or around host fetches.
- `trace`: context manager over jax.profiler for TensorBoard-viewable traces.
- `chain_throughput`: the scan-slope methodology from bench.py as a reusable
  measurement primitive (robust to relays that acknowledge dispatch early).
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable, Dict, List

import numpy as np


class StepTimer:
    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0 = None
        self._n = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    def stats(self) -> Dict[str, float]:
        if not self.times:
            return {"mean_s": 0.0, "p50_s": 0.0, "p95_s": 0.0, "steps": 0}
        t = np.asarray(self.times)
        return {
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
            "steps": int(t.size),
        }


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """jax.profiler trace for TensorBoard's profile plugin."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def chain_throughput(
    step_fn: Callable, init_carry, *, k_short: int = 2, k_long: int = 10,
    repeats: int = 3,
) -> float:
    """Per-step seconds via the chain-slope method: jit a lax.scan of
    `step_fn` (carry -> carry) at two lengths, fetch a scalar, take the
    slope. Fixed dispatch/fetch overhead cancels; works even when
    block_until_ready returns at dispatch-ack (remote relays)."""
    import jax

    @functools.partial(jax.jit, static_argnames="k")
    def chain(c, k):
        def body(c, _):
            return step_fn(c), ()

        c, _ = jax.lax.scan(body, c, None, length=k)
        leaves = jax.tree_util.tree_leaves(c)
        return sum(l.reshape(-1)[0].astype("float32") for l in leaves)

    times = {}
    for k in (k_short, k_long):
        _ = np.asarray(chain(init_carry, k))  # compile + first
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            _ = np.asarray(chain(init_carry, k))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[k_long] - times[k_short]) / (k_long - k_short)

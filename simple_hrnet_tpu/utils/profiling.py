"""Tracing / profiling utilities.

The reference's only observability is wall-clock fps prints
(live-demo.py:143-144). Here:

  * ``trace(logdir)``       — context manager around ``jax.profiler`` for
                              full XLA/TPU traces viewable in TensorBoard
                              or Perfetto;
  * ``StageTimer``          — lightweight named-stage wall timers with
                              EMA smoothing for per-frame pipeline stages
                              (detector / crops / pose / decode);
  * ``device_timer``        — relay-safe on-chip timing of a jitted fn via
                              lax.scan chaining (the only reliable method
                              through high-latency device tunnels; see
                              PERF.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional


@contextlib.contextmanager
def trace(logdir: str = '/tmp/jax-trace'):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Named per-stage timers with exponential smoothing."""

    def __init__(self, alpha: float = 0.9):
        self.alpha = alpha
        self.means: Dict[str, float] = {}
        self._start: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            prev = self.means.get(name)
            self.means[name] = dt if prev is None else \
                self.alpha * prev + (1 - self.alpha) * dt

    def summary(self) -> str:
        return ' | '.join(f'{k}: {v * 1000:.1f}ms'
                          for k, v in self.means.items())


def device_timer(fn: Callable, *args, iters_lo: int = 2, iters_hi: int = 12,
                 repeats: int = 3) -> float:
    """Seconds per call of ``fn(*args)`` measured ON-CHIP.

    Chains serialized invocations inside one jit via lax.scan and
    differences two chain lengths, cancelling tunnel RTT and dispatch
    overhead. ``fn`` must map its first arg to an array of any shape.

    EVERY output leaf is reduced into the chained scalar: any output not
    feeding the chain is dead code XLA deletes from the timed graph. (A
    first version kept only the first leaf — timing the fused
    detect+pose pipeline, whose first output is the detector's validity
    mask, silently measured a detector-only graph.)
    """
    import jax
    import jax.numpy as jnp

    x0, rest = args[0], args[1:]

    def chained(v, r, iters):
        def body(carry, _):
            y = fn(carry, *r)
            acc = jnp.float32(0)
            for leaf in jax.tree_util.tree_leaves(y):
                acc = acc + jnp.mean(leaf).astype(jnp.float32)
            return (carry + acc.astype(carry.dtype) * 1e-9, acc)
        _, means = jax.lax.scan(body, v, None, length=iters)
        return means.sum()

    times = {}
    for iters in (iters_lo, iters_hi):
        # NOTE: ``rest`` (weights etc) must travel as jit ARGUMENTS —
        # closing over large arrays bakes them into the HLO as constants
        # and the remote compiler rejects the body with HTTP 413
        f = jax.jit(lambda v, *r, n=iters: chained(v, r, n))
        float(f(x0, *rest))  # compile + warm
        best = float('inf')
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(f(x0, *rest))
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    return (times[iters_hi] - times[iters_lo]) / (iters_hi - iters_lo)

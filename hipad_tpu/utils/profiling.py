"""Tracing / profiling helpers (SURVEY §5: the reference has only a
commented-out mmcv profiler hook, `apis/mmdet_train.py:160-163` — here the
jax.profiler is wired in properly).

  * ``trace(logdir)``: context manager writing a TensorBoard-viewable device
    trace for the enclosed steps;
  * ``StepTimer``: wall-clock EMA + percentiles for the training loop;
  * ``device_time(fn, *args, iters)``: robust device timing for a jitted
    callable by chaining iterations inside one jit (dispatch/tunnel latency
    and executor caching otherwise corrupt measurements — see
    .claude/skills/verify/SKILL.md gotchas).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, ema: float = 0.98):
        self.ema = ema
        self.avg = None
        self.history: List[float] = []
        self._t = None

    def tic(self):
        self._t = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._t
        self.history.append(dt)
        self.avg = dt if self.avg is None else self.ema * self.avg + (1 - self.ema) * dt
        return dt

    def summary(self) -> Dict[str, float]:
        h = np.asarray(self.history)
        return {
            "mean_s": float(h.mean()),
            "p50_s": float(np.percentile(h, 50)),
            "p99_s": float(np.percentile(h, 99)),
            "steps_per_s": float(1.0 / h.mean()),
        }


def device_time(fn: Callable, *args, iters: int = 20) -> float:
    """Seconds per call of ``fn(*args)`` measured on device.

    ``fn`` must return a pytree; a scalar derived from its first leaf is fed
    back as a perturbation so XLA cannot elide or parallelize iterations.
    """

    @jax.jit
    def many(*a):
        def body(c, _):
            out = fn(*jax.tree_util.tree_map(
                lambda x: (x + c * 1e-12).astype(x.dtype)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact) else x, a))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return leaf.reshape(-1)[0].astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    float(many(*args))  # compile
    t0 = time.perf_counter()
    float(many(*args))
    return (time.perf_counter() - t0) / iters

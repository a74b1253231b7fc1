"""Tracing / profiling subsystem (SURVEY §5.1).

The reference exposes wall-clock timers only (`time/fps`, `time/rollout`,
`time/training` — on_policy_algorithm_grid_obs.py:264-292, ppo_grid_obs.py:
181-297).  This module provides:

- :class:`PhaseTimer` — named-phase wall-clock accounting with
  ``block_until_ready`` fencing, emitting the reference-compatible
  ``time/*`` metric keys;
- :func:`trace` — a context manager around ``jax.profiler`` writing an XLA
  trace (viewable in TensorBoard / Perfetto) for the enclosed steps,
  wired to the training CLI as ``--set runner.profile_dir=<dir>``.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase.

    with timer.phase("rollout", fence=batch): ...
    metrics.update(timer.metrics(steps_per_iter))
    """

    def __init__(self):
        self._acc: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, fence=None):
        t0 = time.perf_counter()
        yield
        if fence is not None:
            jax.block_until_ready(fence)
        self._acc[name] = self._acc.get(name, 0.0) + time.perf_counter() - t0

    def metrics(self, env_steps: Optional[int] = None) -> Dict[str, float]:
        out = {f"time/{k}": v for k, v in self._acc.items()}
        total = sum(self._acc.values())
        out["time/time_elapsed"] = total
        if env_steps and total > 0:
            out["time/fps"] = env_steps / total
        return out

    def reset(self):
        self._acc.clear()


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace for the enclosed block; no-op when log_dir is
    falsy (so call sites need no branching)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

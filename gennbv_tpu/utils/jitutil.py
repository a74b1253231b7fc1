"""Unwrap nested jit boundaries on the hot path.

A ``@jax.jit``-wrapped function invoked inside an outer jitted computation
becomes a pjit sub-call in the jaxpr.  On TPU, XLA does not reliably
optimize across that call boundary: the splat op timed **13x slower**
(422 ms vs 33.6 ms at 256 envs x 400^2, bit-identical outputs) when
reached through its inner jit wrapper than when inlined into the caller's
trace (tools/bench_splat_bisect.py).  Consequently:

- compute ops in ``gennbv_tpu.ops`` are plain functions (no jit);
- ``env.step`` keeps its jit wrapper — it is the natural entry point for
  eager callers (tests, tools, interactive use);
- jitted training/eval loops (rollout scan, off-policy iteration, eval
  scan) unwrap it with :func:`unjitted_method` so the env step inlines
  into the loop body's trace.
"""
from __future__ import annotations


def unjitted_method(obj, name: str):
    """Bound method ``obj.<name>`` with any ``jax.jit`` wrapper removed.

    Falls back to the attribute as-is when the method is a plain function
    (``jax.jit`` exposes the original via ``__wrapped__``; plain methods
    don't have it).
    """
    fn = getattr(type(obj), name, None)
    raw = getattr(fn, "__wrapped__", None)
    if raw is None:
        return getattr(obj, name)
    return raw.__get__(obj)


def unjitted_step(env):
    """``env.step`` without its jit wrapper — use inside jitted loops."""
    return unjitted_method(env, "step")

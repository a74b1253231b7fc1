"""Environment contract checker — the counterpart of SB3's
``common/env_checker.py`` (SURVEY §2.4) for this framework's functional env
protocol.

Checks that an env behaves like the jit-steppable contract the learners
assume (ReconEnv, env/synthetic.py):

    state, out = env.reset(num_envs[, rng])        # or reset(num_envs)
    state, out = env.step(state, actions)
    out.obs [N, obs_dim] float, out.reward [N] float,
    out.done [N] bool, out.time_out [N] bool

plus jit-ability, static shapes/dtypes across steps, auto-reset sanity
(done envs keep stepping), and value finiteness.  Raises AssertionError
with a precise message on the first violation.
"""
from __future__ import annotations

import inspect

import jax
import jax.numpy as jnp
import numpy as np


def _sample_actions(env, n, rng):
    """Discrete envs expose `nvec`; continuous expose `num_actions`."""
    nvec = getattr(env, "nvec", None)
    if nvec is not None:
        nvec = jnp.asarray(nvec)
        u = jax.random.uniform(rng, (n, nvec.shape[0]))
        return (u * nvec[None, :]).astype(jnp.int32)
    return jax.random.normal(rng, (n, env.num_actions))


def check_env(env, num_envs: int = 4, steps: int = 8, seed: int = 0) -> None:
    rng = jax.random.PRNGKey(seed)

    # --- reset signature: (num_envs) or (num_envs, rng) — match by name,
    # not arity (ReconEnv's second param is scene_id, not rng)
    params = inspect.signature(env.reset).parameters
    if "rng" in params or "key" in params:
        state, out = env.reset(num_envs, rng)
    else:
        state, out = env.reset(num_envs)

    assert hasattr(out, "obs") and hasattr(out, "reward"), \
        "step output must have .obs and .reward"
    assert hasattr(out, "done") and hasattr(out, "time_out"), \
        "step output must have .done and .time_out"

    obs = out.obs
    assert obs.ndim == 2 and obs.shape[0] == num_envs, \
        f"obs must be [num_envs, obs_dim], got {obs.shape}"
    obs_dim = getattr(env, "obs_dim", obs.shape[1])
    assert obs.shape[1] == obs_dim, \
        f"obs dim {obs.shape[1]} != env.obs_dim {obs_dim}"
    assert jnp.issubdtype(obs.dtype, jnp.floating), f"obs dtype {obs.dtype}"

    # --- jit-ability + shape/dtype stability over steps
    step = jax.jit(env.step)
    shapes0 = jax.tree.map(lambda x: (x.shape, x.dtype), state)
    saw_done = False
    for t in range(steps):
        rng, r = jax.random.split(rng)
        actions = _sample_actions(env, num_envs, r)
        state, out = step(state, actions)

        shapes_t = jax.tree.map(lambda x: (x.shape, x.dtype), state)
        assert shapes_t == shapes0, f"state shapes/dtypes changed at step {t}"
        assert out.reward.shape == (num_envs,), out.reward.shape
        assert out.done.dtype == jnp.bool_, f"done dtype {out.done.dtype}"
        assert out.time_out.dtype == jnp.bool_, out.time_out.dtype
        assert bool(jnp.all(jnp.isfinite(out.obs))), f"non-finite obs at {t}"
        assert bool(jnp.all(jnp.isfinite(out.reward))), f"non-finite reward at {t}"
        # time_out must imply done (the bootstrap relies on it)
        assert bool(jnp.all(~out.time_out | out.done)), \
            "time_out must be a subset of done"
        saw_done = saw_done or bool(out.done.any())

    # --- auto-reset: envs must keep producing valid steps after done
    if saw_done:
        rng, r = jax.random.split(rng)
        state, out = step(state, _sample_actions(env, num_envs, r))
        assert bool(jnp.all(jnp.isfinite(out.obs))), "obs broken after auto-reset"

    # --- determinism of the jitted step under identical inputs
    rng, r = jax.random.split(rng)
    a = _sample_actions(env, num_envs, r)
    s1, o1 = step(state, a)
    s2, o2 = step(state, a)
    np.testing.assert_array_equal(np.asarray(o1.obs), np.asarray(o2.obs),
                                  err_msg="step is not deterministic")

"""On-device rollout collection: one lax.scan over the env + policy.

Replaces collect_rollouts (on_policy_algorithm_grid_obs.py:128-221).  The
obs/reward/done tensors never leave the device; the timeout value-bootstrap
uses the *next step's* policy values (the pre-reset obs at a terminal step is
also the obs the next action is computed from, so V(obs_{t+1}) == values[t+1]
— no second forward pass needed).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gennbv_tpu.models import distributions
from gennbv_tpu.utils.jitutil import unjitted_step


class RolloutBatch(NamedTuple):
    obs: jnp.ndarray        # [T, N, D]
    actions: jnp.ndarray    # [T, N, 6] int32
    rewards: jnp.ndarray    # [T, N]  (bootstrap-adjusted)
    dones: jnp.ndarray      # [T, N] bool
    values: jnp.ndarray     # [T, N]
    log_probs: jnp.ndarray  # [T, N]
    last_values: jnp.ndarray  # [N]


class RolloutStats(NamedTuple):
    """Per-step env metrics for logging (reference extras["episode"],
    env_train_base.py:629-639)."""
    coverage: jnp.ndarray            # [T, N]
    collision: jnp.ndarray           # [T, N]
    ep_reward: jnp.ndarray           # [T, N] (nonzero at terminal steps)
    ep_length: jnp.ndarray           # [T, N]
    ep_rew_coverage: jnp.ndarray     # [T, N]
    ep_rew_short_path: jnp.ndarray   # [T, N]
    ep_rew_termination: jnp.ndarray  # [T, N]
    num_dones: jnp.ndarray           # [T, N]


def collect(
    env,
    model,
    variables,
    env_state,
    obs: jnp.ndarray,
    rng: jax.Array,
    n_steps: int,
    gamma: float,
    obs_dtype=jnp.float32,
):
    """Returns (env_state', obs', batch: RolloutBatch, stats: RolloutStats)."""

    env_step = unjitted_step(env)   # inline into the scan body's trace

    def step_fn(carry, rng_t):
        env_state, obs = carry
        out = model.apply(variables, obs, train=False)
        actions = distributions.sample(out.logits, rng_t)
        logp = distributions.log_prob(out.logits, actions)
        env_state, step_out = env_step(env_state, actions)
        record = (
            obs.astype(obs_dtype), actions, step_out.reward, step_out.done,
            out.value, logp, step_out.time_out,
            RolloutStats(
                coverage=step_out.coverage,
                collision=step_out.collision.astype(jnp.float32),
                ep_reward=step_out.ep_reward,
                ep_length=step_out.ep_length,
                ep_rew_coverage=step_out.ep_rew_coverage,
                ep_rew_short_path=step_out.ep_rew_short_path,
                ep_rew_termination=step_out.ep_rew_termination,
                num_dones=step_out.done.astype(jnp.float32),
            ),
        )
        return (env_state, step_out.obs), record

    rngs = jax.random.split(rng, n_steps)
    (env_state, obs_final), (obs_seq, actions, rewards, dones, values, logps,
                             time_outs, stats) = jax.lax.scan(
        step_fn, (env_state, obs), rngs
    )

    # final value for GAE + the last step's timeout bootstrap
    last_out = model.apply(variables, obs_final, train=False)
    last_values = last_out.value

    next_values = jnp.concatenate([values[1:], last_values[None]], axis=0)
    rewards = rewards + gamma * next_values * time_outs.astype(jnp.float32)

    batch = RolloutBatch(
        obs=obs_seq, actions=actions, rewards=rewards, dones=dones,
        values=values, log_probs=logps, last_values=last_values,
    )
    return env_state, obs_final, batch, stats

"""Device-resident ring replay buffer for the off-policy family.

Counterpart of SB3's ReplayBuffer (stable_baselines3/common/buffers.py:152,
SURVEY §2.4) re-designed for XLA: a fixed-capacity pytree that lives in HBM,
with `add_batch` (dynamic_update_slice ring write of a whole env batch) and
`sample` (uniform gather) both jit-compatible — the entire
collect->store->sample->update off-policy iteration compiles to one program.

Capacity is in TRANSITIONS and must be a multiple of the env batch size so
ring writes never straddle the wrap point (SB3 stores [capacity, n_envs];
here the env axis is flattened into the ring for sampling simplicity).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ReplayState(NamedTuple):
    obs: jnp.ndarray        # [C, D]
    actions: jnp.ndarray    # [C, A] (float for continuous, int32 for discrete)
    rewards: jnp.ndarray    # [C]
    next_obs: jnp.ndarray   # [C, D]
    # 1.0 where the episode truly ended (timeouts excluded: the target
    # bootstraps through timeouts, SB3's handle_timeout_termination)
    terminals: jnp.ndarray  # [C]
    pos: jnp.ndarray        # scalar int32, next write slot
    size: jnp.ndarray       # scalar int32, filled slots


def init(capacity: int, obs_dim: int, action_dim: int,
         action_dtype=jnp.float32) -> ReplayState:
    return ReplayState(
        obs=jnp.zeros((capacity, obs_dim), jnp.float32),
        actions=jnp.zeros((capacity, action_dim), action_dtype),
        rewards=jnp.zeros(capacity, jnp.float32),
        next_obs=jnp.zeros((capacity, obs_dim), jnp.float32),
        terminals=jnp.zeros(capacity, jnp.float32),
        pos=jnp.asarray(0, jnp.int32),
        size=jnp.asarray(0, jnp.int32),
    )


def add_batch(rb: ReplayState, obs, actions, rewards, next_obs, dones,
              time_outs=None) -> ReplayState:
    """Write one env-batch of transitions at the ring position."""
    n = obs.shape[0]
    c = rb.obs.shape[0]
    assert c % n == 0, "capacity must be a multiple of the env batch"
    terminals = dones.astype(jnp.float32)
    if time_outs is not None:
        terminals = terminals * (1.0 - time_outs.astype(jnp.float32))
    upd = lambda buf, x: jax.lax.dynamic_update_slice_in_dim(
        buf, x.astype(buf.dtype), rb.pos, axis=0)
    return ReplayState(
        obs=upd(rb.obs, obs),
        actions=upd(rb.actions, actions),
        rewards=upd(rb.rewards, rewards),
        next_obs=upd(rb.next_obs, next_obs),
        terminals=upd(rb.terminals, terminals),
        pos=(rb.pos + n) % c,
        size=jnp.minimum(rb.size + n, c),
    )


class Batch(NamedTuple):
    obs: jnp.ndarray
    actions: jnp.ndarray
    rewards: jnp.ndarray
    next_obs: jnp.ndarray
    terminals: jnp.ndarray


def sample(rb: ReplayState, rng: jax.Array, batch_size: int) -> Batch:
    idx = jax.random.randint(rng, (batch_size,), 0, jnp.maximum(rb.size, 1))
    return Batch(
        obs=rb.obs[idx],
        actions=rb.actions[idx],
        rewards=rb.rewards[idx],
        next_obs=rb.next_obs[idx],
        terminals=rb.terminals[idx],
    )

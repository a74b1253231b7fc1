"""Welford-style running-stats observation normalizer.

Port of the reference's Normalizer / NormObsWithImg pair
(gennbv/callback.py:103-162, update_mean_var_count at :8) — defined there
but not wired on the main training path; provided here as an optional,
jit-compatible component that normalizes only the pose-state slice of the
flat observation (the reference variant normalizes obs[:, :state_dim]).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gennbv_tpu import spec


class NormalizerState(NamedTuple):
    mean: jnp.ndarray   # [D]
    var: jnp.ndarray    # [D]
    count: jnp.ndarray  # scalar


def init(dim: int, epsilon: float = 1e-4) -> NormalizerState:
    return NormalizerState(
        mean=jnp.zeros(dim, jnp.float32),
        var=jnp.ones(dim, jnp.float32),
        count=jnp.asarray(epsilon, jnp.float32),
    )


def update(state: NormalizerState, batch: jnp.ndarray) -> NormalizerState:
    """Chan et al. parallel-update (callback.py:8-22)."""
    batch_mean = batch.mean(axis=0)
    batch_var = batch.var(axis=0)
    batch_count = jnp.asarray(batch.shape[0], jnp.float32)
    delta = batch_mean - state.mean
    tot = state.count + batch_count
    new_mean = state.mean + delta * batch_count / tot
    m_a = state.var * state.count
    m_b = batch_var * batch_count
    m2 = m_a + m_b + delta ** 2 * state.count * batch_count / tot
    return NormalizerState(mean=new_mean, var=m2 / tot, count=tot)


def normalize(state: NormalizerState, x: jnp.ndarray,
              clip: float = 10.0) -> jnp.ndarray:
    return jnp.clip(
        (x - state.mean) / jnp.sqrt(state.var + 1e-8), -clip, clip
    )


def normalize_obs_state_slice(state: NormalizerState, obs: jnp.ndarray,
                              state_dim: int = spec.STATE_DIM) -> jnp.ndarray:
    """NormObsWithImg semantics: normalize only the pose slice, pass the
    grid/state_rgb slices through (callback.py:133-162)."""
    head = normalize(state, obs[..., :state_dim])
    return jnp.concatenate([head, obs[..., state_dim:]], axis=-1)

"""Generalized Advantage Estimation as a reverse lax.scan.

Rewrite of TensorRolloutBuffer_Grid_Obs.compute_returns_and_advantage
(stable_baselines3/common/buffers.py:706-724).  Timeout value-bootstrapping
is already folded into the rewards upstream (rollout.py), matching
``rewards += gamma * V(new_obs) * time_outs``
(on_policy_algorithm_grid_obs.py:205-208).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_gae(
    rewards: jnp.ndarray,      # [T, N]
    values: jnp.ndarray,       # [T, N] V(obs_t)
    dones: jnp.ndarray,        # [T, N] episode ended at step t
    last_values: jnp.ndarray,  # [N] V(obs_T)
    gamma: float,
    gae_lambda: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (advantages [T, N], returns [T, N] = adv + values)."""
    non_terminal = 1.0 - dones.astype(jnp.float32)

    def body(carry, xs):
        gae, next_value = carry
        r, v, nt = xs
        delta = r + gamma * next_value * nt - v
        gae = delta + gamma * gae_lambda * nt * gae
        return (gae, v), gae

    (_, _), adv_rev = jax.lax.scan(
        body,
        (jnp.zeros_like(last_values), last_values),
        (rewards[::-1], values[::-1], non_terminal[::-1]),
    )
    advantages = adv_rev[::-1]
    return advantages, advantages + values

"""Diagonal-Gaussian distribution helpers for the continuous-action family.

Pure functions over (mean, log_std) arrays, mirroring rsl_rl's use of
torch.distributions.Normal (rsl_rl/modules/actor_critic.py:119-133) and
SB3's DiagGaussianDistribution (stable_baselines3/common/distributions.py).
The analytic KL used by the adaptive-LR rule is the exact diagonal-Gaussian
KL from rsl_rl/algorithms/ppo.py:147-155.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG_2PI = jnp.log(2.0 * jnp.pi)


def sample(mean: jnp.ndarray, log_std: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    return mean + jnp.exp(log_std) * jax.random.normal(rng, mean.shape)


def log_prob(mean: jnp.ndarray, log_std: jnp.ndarray, actions: jnp.ndarray) -> jnp.ndarray:
    """Summed per-dim log-density -> [...]."""
    var = jnp.exp(2.0 * log_std)
    ll = -0.5 * ((actions - mean) ** 2 / var + 2.0 * log_std + _LOG_2PI)
    return ll.sum(axis=-1)


def entropy(log_std: jnp.ndarray, num_dims_like: jnp.ndarray) -> jnp.ndarray:
    """[...] entropy, broadcast to the batch shape of `num_dims_like`."""
    ent = jnp.sum(0.5 + 0.5 * _LOG_2PI + log_std)
    return jnp.broadcast_to(ent, num_dims_like.shape[:-1])


def kl(old_mean, old_log_std, new_mean, new_log_std) -> jnp.ndarray:
    """Exact diagonal-Gaussian KL(old || new), summed over dims, mean over
    batch — the adaptive-LR signal (rsl_rl/algorithms/ppo.py:149-154)."""
    old_std = jnp.exp(old_log_std)
    new_std = jnp.exp(new_log_std)
    per_dim = (
        new_log_std - old_log_std
        + (old_std ** 2 + (old_mean - new_mean) ** 2) / (2.0 * new_std ** 2)
        - 0.5
    )
    return per_dim.sum(axis=-1).mean()

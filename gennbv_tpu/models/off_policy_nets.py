"""Networks for the off-policy family: Q-critics, deterministic and
squashed-Gaussian actors.

Counterparts of SB3's policy classes for DQN/SAC/TD3/DDPG (td3/policies.py,
sac/policies.py, dqn/policies.py — SURVEY §2.4 'unused algos' row), as plain
flax modules over flat observations.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0


def _mlp(x, hidden, act=nn.relu, name="mlp"):
    for i, h in enumerate(hidden):
        x = act(nn.Dense(h, name=f"{name}_{i}")(x))
    return x


class QCritic(nn.Module):
    """Twin Q(s, a) -> ([N], [N]) for SAC/TD3 (single head used by DDPG)."""
    hidden: Tuple[int, ...] = (256, 256)
    n_critics: int = 2

    @nn.compact
    def __call__(self, obs, actions):
        x = jnp.concatenate([obs, actions], axis=-1)
        qs = []
        for k in range(self.n_critics):
            h = _mlp(x, self.hidden, name=f"q{k}")
            qs.append(nn.Dense(1, name=f"q{k}_out")(h)[..., 0])
        return tuple(qs)


class DeterministicActor(nn.Module):
    """tanh-bounded deterministic policy (TD3/DDPG), action in [-max_a, max_a]."""
    action_dim: int
    max_action: float = 1.0
    hidden: Tuple[int, ...] = (256, 256)

    @nn.compact
    def __call__(self, obs):
        h = _mlp(obs, self.hidden, name="pi")
        return self.max_action * jnp.tanh(nn.Dense(self.action_dim, name="pi_out")(h))


class SquashedGaussianActor(nn.Module):
    """SAC actor: tanh-squashed diagonal Gaussian with state-dependent std."""
    action_dim: int
    max_action: float = 1.0
    hidden: Tuple[int, ...] = (256, 256)

    @nn.compact
    def __call__(self, obs):
        h = _mlp(obs, self.hidden, name="pi")
        mean = nn.Dense(self.action_dim, name="mean")(h)
        log_std = jnp.clip(nn.Dense(self.action_dim, name="log_std")(h),
                           LOG_STD_MIN, LOG_STD_MAX)
        return mean, log_std


def squashed_sample(mean, log_std, rng, max_action: float = 1.0):
    """Reparameterized sample + log-prob with the tanh correction."""
    std = jnp.exp(log_std)
    pre = mean + std * jax.random.normal(rng, mean.shape)
    a = jnp.tanh(pre)
    logp = (-0.5 * ((pre - mean) / std) ** 2 - log_std
            - 0.5 * jnp.log(2.0 * jnp.pi)).sum(-1)
    # tanh change of variables (numerically stable form)
    logp -= (2.0 * (jnp.log(2.0) - pre - jax.nn.softplus(-2.0 * pre))).sum(-1)
    return max_action * a, logp


class DiscreteQNet(nn.Module):
    """Q(s) -> [N, n_actions] for DQN."""
    n_actions: int
    hidden: Tuple[int, ...] = (256, 256)

    @nn.compact
    def __call__(self, obs):
        h = _mlp(obs, self.hidden, name="q")
        return nn.Dense(self.n_actions, name="q_out")(h)

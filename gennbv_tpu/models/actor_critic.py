"""Generic actor-critic modules: the rsl_rl model family, TPU-native.

Covers the reference's vendored rsl_rl modules (SURVEY §2.3):
- ``GaussianActorCritic``   — MLP actor + MLP critic with a learned,
  state-independent log-std (rsl_rl/modules/actor_critic.py:42-97).
- ``RecurrentActorCritic``  — LSTM/GRU memory in front of the same heads
  (rsl_rl/modules/actor_critic_recurrent.py:101-124).  Hidden state is an
  explicit pytree carried by the caller (functional, scan-friendly) instead
  of module-internal buffers; done-masked resets replace the reference's
  per-step `hidden_states[..., dones] = 0`.

Both emit (mean, log_std, value); the Gaussian distribution helpers live in
``models/gaussian.py``.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_ACTIVATIONS = {
    "elu": nn.elu,
    "relu": nn.relu,
    "tanh": nn.tanh,
    "gelu": nn.gelu,
    "selu": nn.selu,
}


class ACOutput(NamedTuple):
    mean: jnp.ndarray     # [N, A]
    log_std: jnp.ndarray  # [A] (state-independent)
    value: jnp.ndarray    # [N]


def _mlp(hidden: Sequence[int], act, name: str):
    layers = []
    for i, h in enumerate(hidden):
        layers.append(nn.Dense(h, name=f"{name}_{i}"))
        layers.append(act)
    return layers


class GaussianActorCritic(nn.Module):
    """MLP actor-critic with diagonal-Gaussian policy.

    Defaults mirror rsl_rl's ActorCritic: hidden [256,256,256] elu actor and
    critic, init_noise_std=1.0 as a learned parameter
    (rsl_rl/modules/actor_critic.py:49-93).
    """
    num_actions: int
    actor_hidden: Tuple[int, ...] = (256, 256, 256)
    critic_hidden: Tuple[int, ...] = (256, 256, 256)
    activation: str = "elu"
    init_noise_std: float = 1.0

    @nn.compact
    def __call__(self, obs: jnp.ndarray, critic_obs: jnp.ndarray = None) -> ACOutput:
        act = _ACTIVATIONS[self.activation]
        x = obs
        for layer in _mlp(self.actor_hidden, act, "actor"):
            x = layer(x) if isinstance(layer, nn.Module) else layer(x)
        mean = nn.Dense(self.num_actions, name="actor_out")(x)

        c = critic_obs if critic_obs is not None else obs
        for layer in _mlp(self.critic_hidden, act, "critic"):
            c = layer(c) if isinstance(layer, nn.Module) else layer(c)
        value = nn.Dense(1, name="critic_out")(c)[..., 0]

        log_std = self.param(
            "log_std",
            lambda _, shape: jnp.full(shape, jnp.log(self.init_noise_std)),
            (self.num_actions,),
        )
        return ACOutput(mean=mean, log_std=log_std, value=value)


class RNNState(NamedTuple):
    actor: Any   # LSTM: (c, h) tuple; GRU: array
    critic: Any


class RecurrentActorCritic(nn.Module):
    """LSTM/GRU memory + Gaussian MLP heads (actor_critic_recurrent.py).

    Call with ``(obs, rnn_state)`` for one step; hidden state is carried by
    the caller and reset where ``done`` via :func:`reset_hidden`.
    """
    num_actions: int
    rnn_hidden: int = 256
    rnn_type: str = "lstm"   # "lstm" | "gru"
    actor_hidden: Tuple[int, ...] = (256, 256, 256)
    critic_hidden: Tuple[int, ...] = (256, 256, 256)
    activation: str = "elu"
    init_noise_std: float = 1.0

    def _cell(self, name):
        if self.rnn_type == "gru":
            return nn.GRUCell(features=self.rnn_hidden, name=name)
        return nn.OptimizedLSTMCell(features=self.rnn_hidden, name=name)

    @nn.compact
    def __call__(self, obs: jnp.ndarray, state: RNNState):
        act = _ACTIVATIONS[self.activation]
        a_state, a_feat = self._cell("memory_a")(state.actor, obs)
        c_state, c_feat = self._cell("memory_c")(state.critic, obs)

        x = a_feat
        for layer in _mlp(self.actor_hidden, act, "actor"):
            x = layer(x) if isinstance(layer, nn.Module) else layer(x)
        mean = nn.Dense(self.num_actions, name="actor_out")(x)

        c = c_feat
        for layer in _mlp(self.critic_hidden, act, "critic"):
            c = layer(c) if isinstance(layer, nn.Module) else layer(c)
        value = nn.Dense(1, name="critic_out")(c)[..., 0]

        log_std = self.param(
            "log_std",
            lambda _, shape: jnp.full(shape, jnp.log(self.init_noise_std)),
            (self.num_actions,),
        )
        return ACOutput(mean=mean, log_std=log_std, value=value), RNNState(a_state, c_state)

    def initial_state(self, batch: int) -> RNNState:
        if self.rnn_type == "gru":
            zero = jnp.zeros((batch, self.rnn_hidden), jnp.float32)
            return RNNState(zero, zero)
        zeros = (
            jnp.zeros((batch, self.rnn_hidden), jnp.float32),
            jnp.zeros((batch, self.rnn_hidden), jnp.float32),
        )
        return RNNState(zeros, zeros)


def reset_hidden(state: RNNState, done: jnp.ndarray) -> RNNState:
    """Zero the hidden state of terminated envs (the reference's
    `hidden_states[..., dones] = 0`, rsl_rl utils)."""
    keep = (~done).astype(jnp.float32)

    def mask(x):
        return x * keep.reshape((-1,) + (1,) * (x.ndim - 1))

    return jax.tree.map(mask, state)

"""Generic feature extractors — SB3 torch_layers parity
(stable_baselines3/common/torch_layers.py, SURVEY §2.4 'misc common'):

- :class:`NatureCNN` — the Atari DQN conv stack (conv 32x8s4, 64x4s2,
  64x3s1 -> dense features_dim), for image observations [N, H, W, C].
- :class:`MlpTorso` — configurable net_arch MLP (the MlpExtractor
  equivalent; net_arch=[] is the identity passthrough the GenNBV policy
  uses, policies.py:947).
- :class:`CnnPolicy` — NatureCNN torso + MultiCategorical/value heads, so
  an image-observation task gets a ready actor-critic (SB3's CnnPolicy).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class NatureCNN(nn.Module):
    features_dim: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, H, W, C] in [0, 1] (SB3 normalizes uint8 images)."""
        if x.shape[1] < 36 or x.shape[2] < 36:
            raise ValueError(
                f"NatureCNN needs images >= 36x36, got {x.shape[1]}x{x.shape[2]}"
                " (same constraint as SB3's NatureCNN)")
        x = nn.relu(nn.Conv(32, (8, 8), strides=(4, 4), padding="VALID",
                            name="c1")(x))
        x = nn.relu(nn.Conv(64, (4, 4), strides=(2, 2), padding="VALID",
                            name="c2")(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=(1, 1), padding="VALID",
                            name="c3")(x))
        x = x.reshape(x.shape[0], -1)
        return nn.relu(nn.Dense(self.features_dim, name="fc")(x))


class MlpTorso(nn.Module):
    """net_arch MLP; empty net_arch = identity (MlpExtractor semantics)."""
    net_arch: Tuple[int, ...] = ()
    activation: Any = nn.tanh

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, h in enumerate(self.net_arch):
            x = self.activation(nn.Dense(h, name=f"fc{i}")(x))
        return x


class CnnPolicyOutput(NamedTuple):
    logits: jnp.ndarray
    value: jnp.ndarray


class CnnPolicy(nn.Module):
    """NatureCNN torso + action/value heads for discrete image tasks."""
    num_logits: int
    features_dim: int = 512
    net_arch: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> CnnPolicyOutput:
        feat = NatureCNN(self.features_dim, name="cnn")(images)
        feat = MlpTorso(tuple(self.net_arch), name="torso")(feat)
        logits = nn.Dense(self.num_logits,
                          kernel_init=nn.initializers.orthogonal(0.01),
                          name="action_net")(feat)
        value = nn.Dense(1, kernel_init=nn.initializers.orthogonal(1.0),
                         name="value_net")(feat)[..., 0]
        return CnnPolicyOutput(logits=logits, value=value)

"""MultiCategorical action distribution over the 6-component pose action.

Rewrite of SB3's MultiCategoricalDistribution
(stable_baselines3/common/distributions.py:299): logits [N, 240] split by
NVEC = (81, 81, 51, 1, 13, 13); per-component log-probs/entropies sum.
Pure functions over a logits array — no distribution objects.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gennbv_tpu import spec

_SPLITS = tuple(
    (sum(spec.NVEC[:i]), sum(spec.NVEC[: i + 1])) for i in range(len(spec.NVEC))
)


def _components(logits: jnp.ndarray):
    return [logits[..., a:b] for a, b in _SPLITS]


def sample(logits: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """[..., 240] -> [..., 6] int32 action indices."""
    keys = jax.random.split(rng, len(spec.NVEC))
    parts = [
        jax.random.categorical(k, comp, axis=-1)
        for k, comp in zip(keys, _components(logits))
    ]
    return jnp.stack(parts, axis=-1).astype(jnp.int32)


def mode(logits: jnp.ndarray) -> jnp.ndarray:
    parts = [jnp.argmax(c, axis=-1) for c in _components(logits)]
    return jnp.stack(parts, axis=-1).astype(jnp.int32)


def log_prob(logits: jnp.ndarray, actions: jnp.ndarray) -> jnp.ndarray:
    """actions [..., 6] int -> summed log-prob [...]."""
    total = 0.0
    for i, comp in enumerate(_components(logits)):
        logp = jax.nn.log_softmax(comp, axis=-1)
        total = total + jnp.take_along_axis(
            logp, actions[..., i : i + 1].astype(jnp.int32), axis=-1
        )[..., 0]
    return total


def entropy(logits: jnp.ndarray) -> jnp.ndarray:
    total = 0.0
    for comp in _components(logits):
        logp = jax.nn.log_softmax(comp, axis=-1)
        total = total + -jnp.sum(jnp.exp(logp) * logp, axis=-1)
    return total

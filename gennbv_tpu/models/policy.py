"""Actor-critic policy: HybridEncoder trunk + MultiCategorical & value heads.

Mirrors ActorCriticPolicy_Train_Eval (stable_baselines3/common/policies.py:
797-1100) with net_arch=[] (the MlpExtractor is identity, policies.py:947):
the 256-d encoder feature feeds a 240-logit action head and a scalar value
head directly.  Head init is orthogonal with SB3's gains (0.01 action, 1.0
value, policies.py:987-994); the feature extractor keeps framework-default
init, as in the reference (SB3 never re-initializes the features extractor).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gennbv_tpu import spec
from gennbv_tpu.config import ModelConfig
from gennbv_tpu.models import distributions
from gennbv_tpu.models.encoder import HybridEncoder


class PolicyOutput(NamedTuple):
    logits: jnp.ndarray   # [N, 240]
    value: jnp.ndarray    # [N]


class ActorCriticPolicy(nn.Module):
    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: jnp.ndarray, train: bool = False) -> PolicyOutput:
        feat = HybridEncoder(self.cfg, dtype=self.dtype, name="encoder")(obs, train=train)
        logits = nn.Dense(
            spec.NUM_LOGITS,
            kernel_init=nn.initializers.orthogonal(0.01),
            name="action_net",
            dtype=self.dtype,
        )(feat)
        value = nn.Dense(
            1,
            kernel_init=nn.initializers.orthogonal(1.0),
            name="value_net",
            dtype=self.dtype,
        )(feat)
        return PolicyOutput(logits=logits.astype(jnp.float32),
                            value=value[..., 0].astype(jnp.float32))


def init_policy(cfg: ModelConfig, rng: jax.Array, obs_dim: int = spec.OBS_DIM):
    """Returns (model, variables) with params + batch_stats collections."""
    model = ActorCriticPolicy(cfg)
    variables = model.init(rng, jnp.zeros((1, obs_dim), jnp.float32), train=False)
    return model, variables


def act(model, variables, obs, rng, deterministic: bool = False):
    """Rollout-time forward (BN running stats, like SB3's eval-mode collect).
    Returns (actions [N,6], values [N], log_probs [N])."""
    out = model.apply(variables, obs, train=False)
    if deterministic:
        actions = distributions.mode(out.logits)
    else:
        actions = distributions.sample(out.logits, rng)
    logp = distributions.log_prob(out.logits, actions)
    return actions, out.value, logp


def evaluate_actions(model, variables, obs, actions, train: bool = True):
    """Training-time forward with BN batch stats + mutable running stats,
    like policy.evaluate_actions under set_training_mode(True)
    (policies.py:1052-1079).  Returns (values, log_prob, entropy, new_batch_stats)."""
    out, mutated = model.apply(
        variables, obs, train=train, mutable=["batch_stats"] if train else []
    )
    logp = distributions.log_prob(out.logits, actions)
    ent = distributions.entropy(out.logits)
    new_stats = mutated.get("batch_stats") if train else variables.get("batch_stats")
    return out.value, logp, ent, new_stats

"""Continuous-action PPO with adaptive-KL learning rate: the rsl_rl
algorithm family (SURVEY §2.3, rsl_rl/algorithms/ppo.py), TPU-native.

Differences from the SB3-fork learner in ``algo/ppo.py``:
- diagonal-Gaussian policy (``models/gaussian.py``) instead of
  MultiCategorical;
- **adaptive learning rate** from the exact analytic Gaussian KL: per
  minibatch, lr /= 1.5 if kl > 2*desired_kl, lr *= 1.5 if kl < desired_kl/2,
  clamped to [1e-5, 1e-2] (rsl_rl/algorithms/ppo.py:147-163) — the LR lives
  inside the optimizer state via ``optax.inject_hyperparams`` so the whole
  5-epoch update stays one jitted scan;
- advantage normalization over the WHOLE rollout (rollout_storage.py:141-143)
  rather than per-minibatch;
- loss = surrogate + vf_coef * value_loss - ent_coef * entropy (no x10).

The timeout bootstrap (`rew += gamma * V * time_outs`,
rsl_rl/algorithms/ppo.py:109-121) is applied by the caller's rollout, same
as the discrete path (algo/rollout.py).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from gennbv_tpu.models import gaussian


@dataclass(frozen=True)
class ContinuousPPOConfig:
    """Defaults = rsl_rl LeggedRobotCfgPPO.algorithm
    (legged_robot_config.py:241-284)."""
    num_learning_epochs: int = 5
    num_mini_batches: int = 4
    clip_param: float = 0.2
    gamma: float = 0.99
    lam: float = 0.95
    value_loss_coef: float = 1.0
    entropy_coef: float = 0.01
    learning_rate: float = 1e-3
    desired_kl: Optional[float] = 0.01
    max_grad_norm: float = 1.0
    use_clipped_value_loss: bool = True
    min_lr: float = 1e-5
    max_lr: float = 1e-2
    optimizer: str = "adam"   # "adam" | "rmsprop" (A2C uses rmsprop)


def a2c_config(learning_rate: float = 7e-4, **kw) -> "ContinuousPPOConfig":
    """A2C as the degenerate PPO (SB3 docs: 'A2C is a special case of PPO'):
    one pass over the rollout, no ratio clipping (clip -> inf would change
    the value-clip too, so a large finite clip), no KL adaptation, RMSprop
    (stable_baselines3/a2c/a2c.py defaults)."""
    return ContinuousPPOConfig(
        num_learning_epochs=1, num_mini_batches=1, clip_param=100.0,
        desired_kl=None, learning_rate=learning_rate,
        use_clipped_value_loss=False, optimizer="rmsprop", **kw)


class ContinuousTrainState(NamedTuple):
    params: Any
    opt_state: Any


def make_optimizer(cfg: ContinuousPPOConfig) -> optax.GradientTransformation:
    if cfg.optimizer == "rmsprop":
        # TF-style accumulator init (initial_scale=1): optax's zero-init makes
        # the first updates ~ lr*g/(sqrt((1-decay))*|g|) ~ 10x lr * sign(g),
        # which destroys the policy before learning starts (SB3's A2C uses
        # RMSpropTFLike for the same reason, a2c/a2c.py).
        opt = optax.inject_hyperparams(optax.rmsprop)(
            learning_rate=cfg.learning_rate, decay=0.99, eps=1e-5,
            initial_scale=1.0)
    else:
        opt = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.learning_rate)
    return optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), opt)


def current_lr(opt_state) -> jnp.ndarray:
    return opt_state[1].hyperparams["learning_rate"]


def _with_lr(opt_state, lr):
    inj = opt_state[1]
    return (opt_state[0], inj._replace(
        hyperparams={**inj.hyperparams, "learning_rate": lr}
    ))


class ContinuousUpdateMetrics(NamedTuple):
    surrogate_loss: jnp.ndarray
    value_loss: jnp.ndarray
    entropy: jnp.ndarray
    mean_kl: jnp.ndarray
    learning_rate: jnp.ndarray


def update(
    model,
    tx: optax.GradientTransformation,
    cfg: ContinuousPPOConfig,
    ts: ContinuousTrainState,
    obs: jnp.ndarray,            # [M, D] flattened rollout
    critic_obs: Optional[jnp.ndarray],  # [M, Dc] or None (== obs)
    actions: jnp.ndarray,        # [M, A]
    old_log_probs: jnp.ndarray,  # [M]
    old_values: jnp.ndarray,     # [M]
    old_mean: jnp.ndarray,       # [M, A]
    old_log_std: jnp.ndarray,    # [A] (state-independent at collect time)
    advantages: jnp.ndarray,     # [M] (already whole-batch normalized)
    returns: jnp.ndarray,        # [M]
    rng: jax.Array,
) -> tuple[ContinuousTrainState, ContinuousUpdateMetrics]:
    m = obs.shape[0]
    mb_size = m // cfg.num_mini_batches
    assert mb_size * cfg.num_mini_batches == m

    # ONE permutation shared across epochs (rollout_storage.py:160-165)
    perm = jax.random.permutation(rng, m)
    mb_idx = jnp.tile(
        perm.reshape(cfg.num_mini_batches, mb_size), (cfg.num_learning_epochs, 1)
    )

    def loss_fn(params, mb):
        out = model.apply(
            {"params": params}, mb["obs"],
            *(() if critic_obs is None else (mb["critic_obs"],)),
        )
        logp = gaussian.log_prob(out.mean, out.log_std, mb["actions"])
        ent = gaussian.entropy(out.log_std, mb["actions"]).mean()

        ratio = jnp.exp(logp - mb["old_log_probs"])
        surr1 = -mb["advantages"] * ratio
        surr2 = -mb["advantages"] * jnp.clip(
            ratio, 1.0 - cfg.clip_param, 1.0 + cfg.clip_param
        )
        surrogate = jnp.maximum(surr1, surr2).mean()

        if cfg.use_clipped_value_loss:
            v_clipped = mb["old_values"] + jnp.clip(
                out.value - mb["old_values"], -cfg.clip_param, cfg.clip_param
            )
            value_loss = jnp.maximum(
                (out.value - mb["returns"]) ** 2,
                (v_clipped - mb["returns"]) ** 2,
            ).mean()
        else:
            value_loss = jnp.mean((out.value - mb["returns"]) ** 2)

        loss = surrogate + cfg.value_loss_coef * value_loss - cfg.entropy_coef * ent
        kl_val = gaussian.kl(mb["old_mean"], old_log_std, out.mean, out.log_std)
        return loss, (surrogate, value_loss, ent, kl_val)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def mb_step(carry, idx):
        params, opt_state, sums = carry
        mb = {
            "obs": obs[idx],
            "actions": actions[idx],
            "old_log_probs": old_log_probs[idx],
            "old_values": old_values[idx],
            "old_mean": old_mean[idx],
            "advantages": advantages[idx],
            "returns": returns[idx],
        }
        if critic_obs is not None:
            mb["critic_obs"] = critic_obs[idx]
        (loss, (surr, vl, ent, kl_val)), grads = grad_fn(params, mb)

        # adaptive LR BEFORE the step, as in the reference (ppo.py:147-163)
        if cfg.desired_kl is not None:
            lr = current_lr(opt_state)
            lr = jnp.where(
                kl_val > cfg.desired_kl * 2.0,
                jnp.maximum(cfg.min_lr, lr / 1.5),
                jnp.where(
                    (kl_val < cfg.desired_kl / 2.0) & (kl_val > 0.0),
                    jnp.minimum(cfg.max_lr, lr * 1.5),
                    lr,
                ),
            )
            opt_state = _with_lr(opt_state, lr)

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, sums + jnp.stack([surr, vl, ent, kl_val])), None

    sums0 = jnp.zeros(4, jnp.float32)
    (params, opt_state, sums), _ = jax.lax.scan(
        mb_step, (ts.params, ts.opt_state, sums0), mb_idx
    )
    n = mb_idx.shape[0]
    metrics = ContinuousUpdateMetrics(
        surrogate_loss=sums[0] / n,
        value_loss=sums[1] / n,
        entropy=sums[2] / n,
        mean_kl=sums[3] / n,
        learning_rate=current_lr(opt_state),
    )
    return ContinuousTrainState(params, opt_state), metrics

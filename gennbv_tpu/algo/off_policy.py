"""Off-policy continuous-control learners: SAC, TD3, DDPG.

TPU-native counterparts of the reference's shipped SB3 algorithms
(stable_baselines3/{sac,td3,ddpg}/ — SURVEY §2.4 'unused algos': stock in
the reference, first-class here).  One train-iteration =
{collect K env steps -> ring-buffer write -> G gradient steps on sampled
minibatches}, compiled as a single jitted function via lax.scan — the
device never waits on the host between collect and update.

Semantics per SB3:
- SAC: twin Q, min-target, entropy bonus with learned temperature alpha
  (target entropy = -action_dim), polyak target update.
- TD3: twin Q, delayed policy updates, target policy smoothing noise.
- DDPG: TD3 with one critic, no delay, no smoothing.
- timeout transitions bootstrap (terminals exclude time_outs), SB3's
  handle_timeout_termination.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from gennbv_tpu.algo import replay_buffer as rb
from gennbv_tpu.models.off_policy_nets import (DeterministicActor, QCritic,
                                               SquashedGaussianActor,
                                               squashed_sample)
from gennbv_tpu.utils.jitutil import unjitted_step


@dataclass(frozen=True)
class OffPolicyConfig:
    algo: str = "sac"              # "sac" | "td3" | "ddpg"
    gamma: float = 0.99
    tau: float = 0.005             # polyak
    learning_rate: float = 3e-4
    batch_size: int = 256
    buffer_capacity: int = 131072
    train_freq: int = 1            # env steps per gradient step
    learning_starts: int = 1000
    max_action: float = 1.0
    # TD3
    policy_delay: int = 2
    target_noise: float = 0.2
    noise_clip: float = 0.5
    exploration_noise: float = 0.1
    # SAC
    init_alpha: float = 1.0
    autotune_alpha: bool = True


class OffPolicyState(NamedTuple):
    actor_params: Any
    critic_params: Any
    target_actor_params: Any     # unused by SAC (kept for uniform pytree)
    target_critic_params: Any
    actor_opt: Any
    critic_opt: Any
    log_alpha: jnp.ndarray       # scalar (SAC)
    alpha_opt: Any
    step: jnp.ndarray            # gradient-step counter (TD3 delay)


class OffPolicyLearner:
    """Builds networks + pure update functions for one algo flavor."""

    def __init__(self, cfg: OffPolicyConfig, obs_dim: int, action_dim: int,
                 rng: jax.Array):
        if cfg.algo not in ("sac", "td3", "ddpg"):
            raise ValueError(f"unknown algo {cfg.algo!r}; one of sac|td3|ddpg")
        self.cfg = cfg
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        n_critics = 1 if cfg.algo == "ddpg" else 2
        self.critic = QCritic(n_critics=n_critics)
        if cfg.algo == "sac":
            self.actor = SquashedGaussianActor(action_dim, cfg.max_action)
        else:
            self.actor = DeterministicActor(action_dim, cfg.max_action)
        self.target_entropy = -float(action_dim)

        r1, r2 = jax.random.split(rng)
        obs0 = jnp.zeros((1, obs_dim))
        act0 = jnp.zeros((1, action_dim))
        actor_params = self.actor.init(r1, obs0)["params"]
        critic_params = self.critic.init(r2, obs0, act0)["params"]
        self.actor_tx = optax.adam(cfg.learning_rate)
        self.critic_tx = optax.adam(cfg.learning_rate)
        self.alpha_tx = optax.adam(cfg.learning_rate)
        log_alpha = jnp.asarray(jnp.log(cfg.init_alpha), jnp.float32)
        self.state = OffPolicyState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_actor_params=actor_params,
            target_critic_params=critic_params,
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            log_alpha=log_alpha,
            alpha_opt=self.alpha_tx.init(log_alpha),
            step=jnp.asarray(0, jnp.int32),
        )

    # ---------------------------------------------------------------- act
    def explore(self, params, obs, rng):
        cfg = self.cfg
        if cfg.algo == "sac":
            mean, log_std = self.actor.apply({"params": params}, obs)
            a, _ = squashed_sample(mean, log_std, rng, cfg.max_action)
            return a
        a = self.actor.apply({"params": params}, obs)
        noise = cfg.exploration_noise * cfg.max_action * jax.random.normal(rng, a.shape)
        return jnp.clip(a + noise, -cfg.max_action, cfg.max_action)

    def exploit(self, params, obs):
        if self.cfg.algo == "sac":
            mean, _ = self.actor.apply({"params": params}, obs)
            return self.cfg.max_action * jnp.tanh(mean)
        return self.actor.apply({"params": params}, obs)

    # ------------------------------------------------------------- update
    def update(self, st: OffPolicyState, batch: rb.Batch, rng: jax.Array
               ) -> tuple[OffPolicyState, dict]:
        cfg = self.cfg
        r_tgt, r_pi = jax.random.split(rng)
        alpha = jnp.exp(st.log_alpha)

        # ----- targets
        if cfg.algo == "sac":
            mean_n, log_std_n = self.actor.apply(
                {"params": st.actor_params}, batch.next_obs)
            a_next, logp_next = squashed_sample(mean_n, log_std_n, r_tgt,
                                                cfg.max_action)
        else:
            a_next = self.actor.apply(
                {"params": st.target_actor_params}, batch.next_obs)
            if cfg.algo == "td3":
                noise = jnp.clip(
                    cfg.target_noise * jax.random.normal(r_tgt, a_next.shape),
                    -cfg.noise_clip, cfg.noise_clip) * cfg.max_action
                a_next = jnp.clip(a_next + noise, -cfg.max_action, cfg.max_action)
            logp_next = 0.0

        qs_next = self.critic.apply(
            {"params": st.target_critic_params}, batch.next_obs, a_next)
        q_next = qs_next[0] if len(qs_next) == 1 else jnp.minimum(*qs_next)
        if cfg.algo == "sac":
            q_next = q_next - alpha * logp_next
        target = batch.rewards + cfg.gamma * (1.0 - batch.terminals) * q_next
        target = jax.lax.stop_gradient(target)

        # ----- critic step
        def critic_loss(params):
            qs = self.critic.apply({"params": params}, batch.obs, batch.actions)
            return sum(jnp.mean((q - target) ** 2) for q in qs), qs[0].mean()

        (c_loss, q_mean), c_grads = jax.value_and_grad(
            critic_loss, has_aux=True)(st.critic_params)
        c_upd, critic_opt = self.critic_tx.update(c_grads, st.critic_opt)
        critic_params = optax.apply_updates(st.critic_params, c_upd)

        # ----- actor (+alpha) step
        def actor_loss(params):
            if cfg.algo == "sac":
                mean, log_std = self.actor.apply({"params": params}, batch.obs)
                a, logp = squashed_sample(mean, log_std, r_pi, cfg.max_action)
                qs = self.critic.apply({"params": critic_params}, batch.obs, a)
                q = qs[0] if len(qs) == 1 else jnp.minimum(*qs)
                return jnp.mean(alpha * logp - q), logp.mean()
            a = self.actor.apply({"params": params}, batch.obs)
            qs = self.critic.apply({"params": critic_params}, batch.obs, a)
            return -jnp.mean(qs[0]), jnp.asarray(0.0)

        (a_loss, logp_mean), a_grads = jax.value_and_grad(
            actor_loss, has_aux=True)(st.actor_params)

        do_actor = (cfg.algo != "td3") | (st.step % cfg.policy_delay == 0)
        a_upd, actor_opt_new = self.actor_tx.update(a_grads, st.actor_opt)
        actor_params_new = optax.apply_updates(st.actor_params, a_upd)
        sel = lambda new, old: jax.tree.map(
            lambda x, y: jnp.where(do_actor, x, y), new, old)
        actor_params = sel(actor_params_new, st.actor_params)
        actor_opt = sel(actor_opt_new, st.actor_opt)

        # ----- alpha step (SAC autotune)
        log_alpha, alpha_opt = st.log_alpha, st.alpha_opt
        if cfg.algo == "sac" and cfg.autotune_alpha:
            def alpha_loss(la):
                return -la * jax.lax.stop_gradient(logp_mean + self.target_entropy)
            al_grad = jax.grad(alpha_loss)(st.log_alpha)
            al_upd, alpha_opt = self.alpha_tx.update(al_grad, st.alpha_opt)
            log_alpha = optax.apply_updates(st.log_alpha, al_upd)

        # ----- polyak targets (actor target only where delayed-updated)
        tau = cfg.tau
        polyak = lambda tgt, on: jax.tree.map(
            lambda t, o: (1.0 - tau) * t + tau * o, tgt, on)
        target_critic_params = polyak(st.target_critic_params, critic_params)
        target_actor_params = sel(
            polyak(st.target_actor_params, actor_params), st.target_actor_params)

        new_state = OffPolicyState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_actor_params=target_actor_params,
            target_critic_params=target_critic_params,
            actor_opt=actor_opt,
            critic_opt=critic_opt,
            log_alpha=log_alpha,
            alpha_opt=alpha_opt,
            step=st.step + 1,
        )
        metrics = {"critic_loss": c_loss, "actor_loss": a_loss,
                   "q_mean": q_mean, "alpha": jnp.exp(log_alpha)}
        return new_state, metrics


class OffPolicyRunner:
    """collect->store->sample->update loop over a functional env, fully
    jitted per iteration (lax.scan over env steps and gradient steps)."""

    def __init__(self, env, cfg: OffPolicyConfig, num_envs: int, seed: int = 0):
        self.env = env
        self.cfg = cfg
        self.num_envs = num_envs
        self.rng = jax.random.PRNGKey(seed)
        self.rng, r = jax.random.split(self.rng)
        self.learner = OffPolicyLearner(cfg, env.obs_dim, env.num_actions, r)
        self.buffer = rb.init(cfg.buffer_capacity, env.obs_dim, env.num_actions)
        self._iter = jax.jit(self._iteration, static_argnums=(4,))

    def _iteration(self, st, buf, env_state, obs, steps, rng, random_policy):
        cfg = self.cfg

        def env_step(carry, rng_t):
            st_, buf_, env_state, obs = carry
            r_a, r_p, r_e = jax.random.split(rng_t, 3)
            a_rand = jax.random.uniform(
                r_a, (self.num_envs, self.env.num_actions),
                minval=-cfg.max_action, maxval=cfg.max_action)
            a_pol = self.learner.explore(st_.actor_params, obs, r_p)
            actions = jnp.where(random_policy, a_rand, a_pol)
            env_state, out = unjitted_step(self.env)(env_state, actions)
            buf_ = rb.add_batch(buf_, obs, actions, out.reward, out.obs,
                                out.done, out.time_out)
            # gradient step(s)
            def do_update(args):
                st_u, rng_u = args
                r_s, r_u = jax.random.split(rng_u)
                batch = rb.sample(buf_, r_s, cfg.batch_size)
                st_u, _ = self.learner.update(st_u, batch, r_u)
                return st_u
            ready = (buf_.size >= cfg.learning_starts) & ~random_policy
            st_ = jax.lax.cond(ready, do_update, lambda a: a[0], (st_, r_e))
            return (st_, buf_, env_state, out.obs), out.reward.mean()

        rngs = jax.random.split(rng, steps)
        (st, buf, env_state, obs), rews = jax.lax.scan(
            env_step, (st, buf, env_state, obs), rngs)
        return st, buf, env_state, obs, rews.mean()

    def learn(self, total_steps: int, chunk: int = 64):
        self.rng, r = jax.random.split(self.rng)
        env_state, out = self.env.reset(self.num_envs, r)
        obs = out.obs
        st, buf = self.learner.state, self.buffer
        mean_rew = 0.0
        done_steps = 0
        while done_steps < total_steps:
            self.rng, r = jax.random.split(self.rng)
            random_phase = jnp.asarray(
                done_steps * self.num_envs < self.cfg.learning_starts)
            st, buf, env_state, obs, mean_rew = self._iter(
                st, buf, env_state, obs, chunk, r, random_phase)
            done_steps += chunk
        self.learner.state, self.buffer = st, buf
        return float(mean_rew)

    def exploit_policy(self):
        params = self.learner.state.actor_params
        return jax.jit(lambda obs: self.learner.exploit(params, obs))

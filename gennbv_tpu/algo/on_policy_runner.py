"""rsl_rl-style on-policy runner for the continuous/Gaussian family.

The TPU-native counterpart of rsl_rl/runners/on_policy_runner.py (SURVEY
§2.3, §3.5): per-iteration {rollout of num_steps_per_env -> GAE ->
adaptive-KL PPO update}, all inside ONE jitted function; save/load of
{params, opt_state, iter}; `get_inference_policy` returning a jitted
deterministic actor.

Works over any env with the functional contract of env/synthetic.py or a
custom robot env: `reset(num_envs, rng)`, `step(state, actions)` (or
`(state, actions, rng)`), outputs with `.obs/.reward/.done/.time_out`.
"""
from __future__ import annotations

import os
import pickle
import time
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from gennbv_tpu.algo import gae as gae_lib
from gennbv_tpu.algo import ppo_continuous as ppoc
from gennbv_tpu.models import gaussian
from gennbv_tpu.models.actor_critic import GaussianActorCritic
from gennbv_tpu.utils.jitutil import unjitted_step


@dataclass(frozen=True)
class OnPolicyRunnerConfig:
    num_steps_per_env: int = 24     # legged_robot_config.py runner section
    save_interval: int = 50
    log_interval: int = 1


class OnPolicyRunner:
    def __init__(self, env, alg_cfg: ppoc.ContinuousPPOConfig,
                 runner_cfg: OnPolicyRunnerConfig, num_envs: int,
                 log_dir: Optional[str] = None, seed: int = 1,
                 actor_hidden=(256, 256, 256), critic_hidden=(256, 256, 256)):
        self.env = env
        self.alg_cfg = alg_cfg
        self.cfg = runner_cfg
        self.num_envs = num_envs
        self.log_dir = log_dir
        self.rng = jax.random.PRNGKey(seed)

        self.model = GaussianActorCritic(
            num_actions=env.num_actions,
            actor_hidden=tuple(actor_hidden),
            critic_hidden=tuple(critic_hidden),
        )
        self.rng, r = jax.random.split(self.rng)
        params = self.model.init(r, jnp.zeros((1, env.obs_dim)))["params"]
        self.tx = ppoc.make_optimizer(alg_cfg)
        self.train_state = ppoc.ContinuousTrainState(params, self.tx.init(params))
        self.iteration = 0
        self._iter_fn = jax.jit(self._train_iteration)

    # ------------------------------------------------------------------
    def _rollout(self, params, env_state, obs, rng):
        cfg = self.alg_cfg

        def step_fn(carry, rng_t):
            env_state, obs = carry
            out = self.model.apply({"params": params}, obs)
            actions = gaussian.sample(out.mean, out.log_std, rng_t)
            logp = gaussian.log_prob(out.mean, out.log_std, actions)
            env_state, step_out = unjitted_step(self.env)(env_state, actions)
            rec = (obs, actions, step_out.reward, step_out.done, out.value,
                   logp, out.mean, step_out.time_out)
            return (env_state, step_out.obs), rec

        rngs = jax.random.split(rng, self.cfg.num_steps_per_env)
        (env_state, obs_f), (obs_seq, acts, rews, dones, values, logps,
                             means, touts) = jax.lax.scan(
            step_fn, (env_state, obs), rngs)

        last = self.model.apply({"params": params}, obs_f)
        # timeout bootstrap with V(s_t) — rsl_rl semantics (ppo.py:109-121).
        # (The discrete path bootstraps with V(obs_{t+1}) instead, which is
        # valid there because ReconEnv returns the PRE-reset obs at terminal
        # steps; generic envs auto-reset their obs, so V(s_t) is the safe
        # stand-in for the unavailable terminal-state value.)
        rews = rews + cfg.gamma * values * touts.astype(jnp.float32)
        return env_state, obs_f, (obs_seq, acts, rews, dones, values, logps,
                                  means, last)

    def _train_iteration(self, ts, env_state, obs, rng):
        cfg = self.alg_cfg
        r_roll, r_upd, rng = jax.random.split(rng, 3)
        env_state, obs, (obs_seq, acts, rews, dones, values, logps, means,
                         last) = self._rollout(ts.params, env_state, obs, r_roll)

        adv, ret = gae_lib.compute_gae(
            rews, values, dones.astype(jnp.float32), last.value,
            cfg.gamma, cfg.lam)
        # whole-batch advantage normalization (rollout_storage.py:141-143)
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)

        t, n = rews.shape
        m = t * n
        flat = lambda x: x.reshape((m,) + x.shape[2:])
        ts, um = ppoc.update(
            self.model, self.tx, cfg, ts,
            flat(obs_seq), None, flat(acts), flat(logps), flat(values),
            flat(means), last.log_std, flat(adv), flat(ret), r_upd,
        )
        metrics = {
            "mean_reward": rews.mean(),
            "surrogate_loss": um.surrogate_loss,
            "value_loss": um.value_loss,
            "entropy": um.entropy,
            "mean_kl": um.mean_kl,
            "learning_rate": um.learning_rate,
            "mean_episode_length": 1.0 / jnp.maximum(dones.mean(), 1e-6),
        }
        return ts, env_state, obs, rng, metrics

    # ------------------------------------------------------------------
    def learn(self, num_iterations: int, log: bool = False):
        self.rng, r = jax.random.split(self.rng)
        env_state, out = self.env.reset(self.num_envs, r)
        obs = out.obs
        ts = self.train_state
        metrics = {}
        for it in range(num_iterations):
            t0 = time.time()
            ts, env_state, obs, self.rng, metrics = self._iter_fn(
                ts, env_state, obs, self.rng)
            self.iteration += 1
            if log and (self.iteration % self.cfg.log_interval == 0):
                m = {k: float(v) for k, v in metrics.items()}
                fps = self.cfg.num_steps_per_env * self.num_envs / (time.time() - t0)
                print(f"it {self.iteration:5d} | rew {m['mean_reward']:+.4f} | "
                      f"kl {m['mean_kl']:.4f} | lr {m['learning_rate']:.2e} | "
                      f"{fps:,.0f} steps/s", flush=True)
            if self.log_dir and self.cfg.save_interval > 0 and (
                self.iteration % self.cfg.save_interval == 0
            ):
                self.save(os.path.join(self.log_dir, f"model_{self.iteration}.pkl"))
        self.train_state = ts
        return {k: float(v) for k, v in metrics.items()}

    # ------------------------------------------------------------------
    def save(self, path: str):
        """{model, optimizer, iter} like rsl_rl (on_policy_runner.py:228-236)."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = {
            "params": jax.device_get(self.train_state.params),
            "opt_state": jax.device_get(self.train_state.opt_state),
            "iter": self.iteration,
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def load(self, path: str, load_optimizer: bool = True):
        with open(path, "rb") as f:
            payload = pickle.load(f)
        opt_state = payload["opt_state"] if load_optimizer else self.train_state.opt_state
        self.train_state = ppoc.ContinuousTrainState(payload["params"], opt_state)
        self.iteration = payload["iter"]

    def get_inference_policy(self):
        params = self.train_state.params

        @jax.jit
        def policy(obs):
            out = self.model.apply({"params": params}, obs)
            return out.mean

        return policy

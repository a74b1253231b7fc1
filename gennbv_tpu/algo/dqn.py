"""DQN: discrete off-policy Q-learning with target network.

Counterpart of the reference's shipped stable_baselines3/dqn/ (SURVEY §2.4).
Single-discrete action head over the functional env protocol (an env with
``nvec == (n,)``); epsilon-greedy exploration with linear decay; hard target
sync every `target_update_interval` gradient steps; the collect->update loop
is one jitted lax.scan, like the continuous off-policy runner.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from gennbv_tpu.algo import replay_buffer as rb
from gennbv_tpu.models.off_policy_nets import DiscreteQNet
from gennbv_tpu.utils.jitutil import unjitted_step


@dataclass(frozen=True)
class DQNConfig:
    gamma: float = 0.99
    learning_rate: float = 1e-3
    batch_size: int = 128
    buffer_capacity: int = 65536
    learning_starts: int = 500
    target_update_interval: int = 250    # gradient steps between hard syncs
    eps_start: float = 1.0
    eps_end: float = 0.05
    eps_decay_steps: int = 5000          # env steps to reach eps_end
    max_grad_norm: float = 10.0


class DQNState(NamedTuple):
    params: Any
    target_params: Any
    opt_state: Any
    grad_steps: jnp.ndarray
    env_steps: jnp.ndarray


class DQNRunner:
    def __init__(self, env, cfg: DQNConfig, num_envs: int, seed: int = 0):
        nvec = tuple(int(x) for x in env.nvec)
        assert len(nvec) == 1, "DQN supports single-discrete action spaces"
        self.n_actions = nvec[0]
        self.env = env
        self.cfg = cfg
        self.num_envs = num_envs
        self.q = DiscreteQNet(self.n_actions)
        self.rng = jax.random.PRNGKey(seed)
        self.rng, r = jax.random.split(self.rng)
        params = self.q.init(r, jnp.zeros((1, env.obs_dim)))["params"]
        self.tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                              optax.adam(cfg.learning_rate))
        self.state = DQNState(params, params, self.tx.init(params),
                              jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
        self.buffer = rb.init(cfg.buffer_capacity, env.obs_dim, 1, jnp.int32)
        self._iter = jax.jit(self._iteration, static_argnums=(4,))

    def _eps(self, env_steps):
        cfg = self.cfg
        frac = jnp.clip(env_steps / cfg.eps_decay_steps, 0.0, 1.0)
        return cfg.eps_start + frac * (cfg.eps_end - cfg.eps_start)

    def _update(self, st: DQNState, batch: rb.Batch) -> DQNState:
        cfg = self.cfg
        q_next = self.q.apply({"params": st.target_params}, batch.next_obs)
        target = batch.rewards + cfg.gamma * (1.0 - batch.terminals) * q_next.max(-1)
        target = jax.lax.stop_gradient(target)

        def loss_fn(params):
            q = self.q.apply({"params": params}, batch.obs)
            q_a = jnp.take_along_axis(q, batch.actions.astype(jnp.int32), axis=-1)[..., 0]
            # SB3 uses smooth_l1 (huber)
            return optax.huber_loss(q_a, target).mean()

        grads = jax.grad(loss_fn)(st.params)
        upd, opt_state = self.tx.update(grads, st.opt_state)
        params = optax.apply_updates(st.params, upd)
        grad_steps = st.grad_steps + 1
        sync = grad_steps % cfg.target_update_interval == 0
        target_params = jax.tree.map(
            lambda t, o: jnp.where(sync, o, t), st.target_params, params)
        return DQNState(params, target_params, opt_state, grad_steps, st.env_steps)

    def _iteration(self, st, buf, env_state, obs, steps, rng):
        cfg = self.cfg

        def env_step(carry, rng_t):
            st_, buf_, env_state, obs = carry
            r_e, r_a, r_u = jax.random.split(rng_t, 3)
            q = self.q.apply({"params": st_.params}, obs)
            greedy = q.argmax(-1)
            rand = jax.random.randint(r_a, greedy.shape, 0, self.n_actions)
            eps = self._eps(st_.env_steps.astype(jnp.float32))
            take_rand = jax.random.uniform(r_e, greedy.shape) < eps
            actions = jnp.where(take_rand, rand, greedy)[:, None].astype(jnp.int32)
            env_state, out = unjitted_step(self.env)(env_state, actions)
            buf_ = rb.add_batch(buf_, obs, actions, out.reward, out.obs,
                                out.done, out.time_out)
            st_ = st_._replace(env_steps=st_.env_steps + self.num_envs)

            def do_update(args):
                st_u, rng_u = args
                r_s, _ = jax.random.split(rng_u)
                return self._update(st_u, rb.sample(buf_, r_s, cfg.batch_size))
            st_ = jax.lax.cond(buf_.size >= cfg.learning_starts,
                               do_update, lambda a: a[0], (st_, r_u))
            return (st_, buf_, env_state, out.obs), out.reward.mean()

        rngs = jax.random.split(rng, steps)
        (st, buf, env_state, obs), rews = jax.lax.scan(
            env_step, (st, buf, env_state, obs), rngs)
        return st, buf, env_state, obs, rews.mean()

    def learn(self, total_steps: int, chunk: int = 64):
        self.rng, r = jax.random.split(self.rng)
        env_state, out = self.env.reset(self.num_envs, r)
        obs = out.obs
        st, buf = self.state, self.buffer
        mean_rew, done = 0.0, 0
        while done < total_steps:
            self.rng, r = jax.random.split(self.rng)
            st, buf, env_state, obs, mean_rew = self._iter(
                st, buf, env_state, obs, chunk, r)
            done += chunk
        self.state, self.buffer = st, buf
        return float(mean_rew)

    def greedy_policy(self):
        params = self.state.params

        @jax.jit
        def policy(obs):
            return self.q.apply({"params": params}, obs).argmax(-1)[:, None]
        return policy

"""Hindsight Experience Replay over the off-policy learners.

Counterpart of the reference's shipped stable_baselines3/her/ (SURVEY §2.4):
goal-conditioned transitions are relabeled at SAMPLE time with the 'future'
strategy — a fraction of sampled transitions get their desired goal replaced
by an achieved goal from a later step of the same episode, and the reward is
recomputed (her_replay_buffer.py semantics), turning sparse-reward tasks
learnable.

TPU-native design: the buffer stores fixed-shape ROUNDS of T env steps
``[E, T, ...]`` in HBM; episodes inside a round may terminate early
(auto-reset envs), so each slot also stores per-step done flags and a
precomputed segment-end index.  Sampling draws (round, t, future offset)
index triples and relabels with pure gathers — the future goal is clamped
to t's own episode segment, so relabeling never crosses a reset boundary —
and collect->relabel->update stays one jitted program.

Variable-length semantics: envs emit the PRE-reset terminal observation at
a done step (the ReconEnv contract), so ``obs[t+1]`` of a terminal
transition is the true terminal obs.  The transition at the START of a
follow-on segment has a stale obs (the previous episode's terminal) —
sampling shifts such indices forward within the segment.

Goal-conditioned env protocol (SB3's GoalEnv dict obs, flattened):
    obs = concat([observation, achieved_goal, desired_goal])
    env.goal_dim, env.compute_reward(achieved, desired) -> reward
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gennbv_tpu.algo import replay_buffer as rb
from gennbv_tpu.algo.off_policy import OffPolicyConfig, OffPolicyLearner
from gennbv_tpu.utils.jitutil import unjitted_step


class EpisodeBuffer(NamedTuple):
    obs: jnp.ndarray       # [E, T+1, D] (T+1 so next_obs is obs[:, t+1])
    actions: jnp.ndarray   # [E, T, A]
    done: jnp.ndarray      # [E, T] {0,1}: episode ended at this step
    terminal: jnp.ndarray  # [E, T] {0,1}: done AND not timeout (gamma mask)
    seg_end: jnp.ndarray   # [E, T] int32: last transition index of t's episode
    pos: jnp.ndarray       # scalar int32: next round slot
    size: jnp.ndarray      # scalar int32: filled rounds


def init_episode_buffer(capacity_episodes: int, ep_len: int, obs_dim: int,
                        action_dim: int) -> EpisodeBuffer:
    return EpisodeBuffer(
        obs=jnp.zeros((capacity_episodes, ep_len + 1, obs_dim), jnp.float32),
        actions=jnp.zeros((capacity_episodes, ep_len, action_dim), jnp.float32),
        done=jnp.zeros((capacity_episodes, ep_len), jnp.float32),
        terminal=jnp.zeros((capacity_episodes, ep_len), jnp.float32),
        seg_end=jnp.broadcast_to(
            jnp.asarray(ep_len - 1, jnp.int32),
            (capacity_episodes, ep_len)).copy(),
        pos=jnp.asarray(0, jnp.int32),
        size=jnp.asarray(0, jnp.int32),
    )


def segment_ends(done_seq: jnp.ndarray) -> jnp.ndarray:
    """[N, T] {0,1} dones -> [N, T] int32 index of the last transition of the
    episode segment containing each step (reverse scan; a segment truncated
    by the round boundary ends at T-1)."""
    t_len = done_seq.shape[-1]

    def back(carry, x):
        i, d = x
        carry = jnp.where(d > 0.5, i, carry)
        return carry, carry

    init = jnp.full(done_seq.shape[:-1], t_len - 1, jnp.int32)
    idx = jnp.arange(t_len, dtype=jnp.int32)
    _, ends = jax.lax.scan(
        back, init, (idx, done_seq.swapaxes(0, -1)), reverse=True)
    return ends.swapaxes(0, -1).astype(jnp.int32)


def add_episodes(buf: EpisodeBuffer, obs_seq: jnp.ndarray,
                 act_seq: jnp.ndarray, done_seq: jnp.ndarray | None = None,
                 timeout_seq: jnp.ndarray | None = None) -> EpisodeBuffer:
    """obs_seq [N, T+1, D], act_seq [N, T, A]: one T-step round per env.

    done_seq/timeout_seq [N, T] mark in-round episode boundaries; omitted =
    fixed-length episodes (one segment per round, the legacy contract)."""
    n, t_plus1, _ = obs_seq.shape
    t_len = t_plus1 - 1
    e = buf.obs.shape[0]
    assert e % n == 0, "round capacity must be a multiple of num_envs"
    if done_seq is None:
        done_seq = jnp.zeros((n, t_len), jnp.float32)
        done_seq = done_seq.at[:, -1].set(1.0)
        timeout_seq = jnp.ones((n, t_len), jnp.float32) * done_seq
    elif timeout_seq is None:
        timeout_seq = jnp.zeros((n, t_len), jnp.float32)
    done_seq = done_seq.astype(jnp.float32)
    terminal = done_seq * (1.0 - timeout_seq.astype(jnp.float32))
    upd = lambda b, x: jax.lax.dynamic_update_slice_in_dim(
        b, x.astype(b.dtype), buf.pos, axis=0)
    return EpisodeBuffer(
        obs=upd(buf.obs, obs_seq),
        actions=upd(buf.actions, act_seq),
        done=upd(buf.done, done_seq),
        terminal=upd(buf.terminal, terminal),
        seg_end=upd(buf.seg_end, segment_ends(done_seq)),
        pos=(buf.pos + n) % e,
        size=jnp.minimum(buf.size + n, e),
    )


@dataclass(frozen=True)
class HERConfig:
    future_fraction: float = 0.8   # SB3 n_sampled_goal=4 -> 4/5 relabeled
    goal_eps: float = 0.1          # success threshold used by fixtures


def sample_relabeled(buf: EpisodeBuffer, rng: jax.Array, batch_size: int,
                     goal_dim: int, compute_reward,
                     her_cfg: HERConfig) -> rb.Batch:
    """Sample transitions; relabel a fraction with future achieved goals.

    Obs layout per protocol: [..., core | achieved(goal_dim) | desired(goal_dim)].
    """
    e_cap, t_plus1, d = buf.obs.shape
    t_len = t_plus1 - 1
    r_e, r_t, r_f, r_m = jax.random.split(rng, 4)
    ep = jax.random.randint(r_e, (batch_size,), 0, jnp.maximum(buf.size, 1))
    t = jax.random.randint(r_t, (batch_size,), 0, t_len)

    # a transition whose obs index sits right after an in-round done has the
    # PREVIOUS episode's pre-reset terminal obs (stale) — shift forward
    # within the new segment (two hops covers consecutive 1-step episodes);
    # any index still stale (done at T-2 clamps the shift, or 3+ one-step
    # episodes in a row) falls back to t=0, which is always valid
    def stale(tt):
        return (tt > 0) & (buf.done[ep, jnp.maximum(tt - 1, 0)] > 0.5)

    t = jnp.where(stale(t), jnp.minimum(t + 1, t_len - 1), t)
    t = jnp.where(stale(t), jnp.minimum(t + 1, t_len - 1), t)
    t = jnp.where(stale(t), 0, t)

    seg_end = buf.seg_end[ep, t]                     # last transition of t's episode
    # future achieved-goal obs index in (t, seg_end + 1] (obs seg_end+1 is
    # the segment's terminal observation)
    offset = jax.random.randint(r_f, (batch_size,), 1, t_len + 1)
    fut = jnp.minimum(t + offset, seg_end + 1)

    obs = buf.obs[ep, t]
    next_obs = buf.obs[ep, t + 1]
    actions = buf.actions[ep, t]
    achieved_fut = buf.obs[ep, fut, d - 2 * goal_dim: d - goal_dim]

    relabel = jax.random.uniform(r_m, (batch_size,)) < her_cfg.future_fraction
    new_goal = jnp.where(relabel[:, None],
                         achieved_fut, obs[:, d - goal_dim:])
    obs = obs.at[:, d - goal_dim:].set(new_goal)
    next_obs = next_obs.at[:, d - goal_dim:].set(new_goal)

    achieved_next = next_obs[:, d - 2 * goal_dim: d - goal_dim]
    rewards = compute_reward(achieved_next, new_goal)
    # gamma mask: env-flagged true terminals cut the bootstrap; timeouts
    # (and round-truncated segments) bootstrap as usual
    terminals = buf.terminal[ep, t]
    return rb.Batch(obs=obs, actions=actions, rewards=rewards,
                    next_obs=next_obs, terminals=terminals)


class HERRunner:
    """Off-policy training with HER relabeling on a goal-conditioned env.
    Episodes may terminate early inside the fixed-length collection round
    (auto-reset); relabeling stays within episode segments."""

    def __init__(self, env, off_cfg: OffPolicyConfig, her_cfg: HERConfig,
                 num_envs: int, capacity_episodes: int = 1024, seed: int = 0,
                 updates_per_round: int = 0):
        self.env = env
        self.cfg = off_cfg
        self.her = her_cfg
        self.num_envs = num_envs
        # gradient steps per collected episode round; 0 = ep_length (1 per
        # env step, SB3's train_freq=1 analogue)
        self.updates_per_round = updates_per_round or env.ep_length
        self.rng = jax.random.PRNGKey(seed)
        self.rng, r = jax.random.split(self.rng)
        self.learner = OffPolicyLearner(off_cfg, env.obs_dim, env.num_actions, r)
        self.buffer = init_episode_buffer(
            capacity_episodes, env.ep_length, env.obs_dim, env.num_actions)
        self._iter = jax.jit(self._iteration)

    def _iteration(self, st, buf, rng, random_policy):
        cfg, env = self.cfg, self.env
        r_reset, r_scan, rng = jax.random.split(rng, 3)
        env_state, out = env.reset(self.num_envs, r_reset)
        obs0 = out.obs

        def step_fn(carry, rng_t):
            env_state, obs = carry
            r_a, r_r = jax.random.split(rng_t)
            a_rand = jax.random.uniform(
                r_a, (self.num_envs, env.num_actions),
                minval=-cfg.max_action, maxval=cfg.max_action)
            a_pol = self.learner.explore(st.actor_params, obs, r_a)
            actions = jnp.where(random_policy, a_rand, a_pol)
            env_state, out = unjitted_step(env)(env_state, actions)
            return (env_state, out.obs), (obs, actions, out.done, out.time_out)

        rngs = jax.random.split(r_scan, env.ep_length)
        (env_state, obs_last), (obs_seq, act_seq, done_seq, to_seq) = \
            jax.lax.scan(step_fn, (env_state, obs0), rngs)
        # [T, N, ...] -> [N, T(+1), ...]
        obs_full = jnp.concatenate([obs_seq, obs_last[None]], axis=0)
        buf = add_episodes(buf, obs_full.transpose(1, 0, 2),
                           act_seq.transpose(1, 0, 2),
                           done_seq.T, to_seq.T)

        def do_updates(args):
            st_u, rng_u = args
            def one(st_c, r_i):
                r_s, r_g = jax.random.split(r_i)
                batch = sample_relabeled(
                    buf, r_s, cfg.batch_size, self.env.goal_dim,
                    self.env.compute_reward, self.her)
                st_c, _ = self.learner.update(st_c, batch, r_g)
                return st_c, None
            st_u, _ = jax.lax.scan(
                one, st_u, jax.random.split(rng_u, self.updates_per_round))
            return st_u

        rng, r_u = jax.random.split(rng)
        ready = (buf.size * env.ep_length >= cfg.learning_starts) & ~random_policy
        st = jax.lax.cond(ready, do_updates, lambda a: a[0], (st, r_u))
        return st, buf, rng

    def learn(self, num_episrounds: int):
        st, buf = self.learner.state, self.buffer
        for i in range(num_episrounds):
            self.rng, r = jax.random.split(self.rng)
            random_phase = jnp.asarray(
                i * self.num_envs * self.env.ep_length < self.cfg.learning_starts)
            st, buf, self.rng = self._iter(st, buf, r, random_phase)
        self.learner.state, self.buffer = st, buf

    def exploit_policy(self):
        params = self.learner.state.actor_params
        return jax.jit(lambda obs: self.learner.exploit(params, obs))

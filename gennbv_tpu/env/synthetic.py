"""Synthetic fixture environments: the SB3 fake-env pattern, JAX-native.

The reference vendors SB3's test fixtures (stable_baselines3/common/envs/:
IdentityEnv, IdentityEnvBox, IdentityEnvMultiDiscrete, ...) without tests
(SURVEY §4.3).  These are their jit-steppable counterparts, used by the test
suite for PPO learnability smoke tests and by any env-contract check.  Each
follows the same functional contract as ReconEnv:

    state, out = env.reset(num_envs, rng)
    state, out = env.step(state, actions, rng)

with fixed-shape outputs (obs, reward, done, time_out).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SynthState(NamedTuple):
    target: jnp.ndarray       # [N, D]
    episode_len: jnp.ndarray  # [N]
    rng: jnp.ndarray          # [N, 2] per-env keys


class SynthOutput(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    time_out: jnp.ndarray


class IdentityEnvMultiDiscrete:
    """Observation = one-hot of the current target per component; reward 1
    for matching it (SB3 IdentityEnvMultiDiscrete semantics).  Optimal
    policy copies the obs -> reward rate 1.0."""

    def __init__(self, nvec=(4, 4), ep_length: int = 10):
        self.nvec = tuple(nvec)
        self.ep_length = ep_length
        self.num_actions = len(self.nvec)
        self.obs_dim = sum(self.nvec)

    def _obs(self, target):
        parts = [
            jax.nn.one_hot(target[:, i], n)
            for i, n in enumerate(self.nvec)
        ]
        return jnp.concatenate(parts, axis=-1)

    def _sample_target(self, keys):
        cols = []
        for i, n in enumerate(self.nvec):
            sub = jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
            cols.append(jax.vmap(
                lambda k: jax.random.randint(k, (), 0, n))(sub))
        return jnp.stack(cols, axis=-1).astype(jnp.int32)

    def reset(self, num_envs: int, rng: jax.Array):
        keys = jax.random.split(rng, num_envs)
        target = self._sample_target(keys)
        state = SynthState(
            target=target,
            episode_len=jnp.zeros(num_envs, jnp.int32),
            rng=jax.vmap(lambda k: jax.random.fold_in(k, 7))(keys),
        )
        zeros = jnp.zeros(num_envs)
        return state, SynthOutput(self._obs(target), zeros,
                                  jnp.zeros(num_envs, bool), jnp.zeros(num_envs, bool))

    def step(self, state: SynthState, actions: jnp.ndarray):
        match = jnp.all(actions == state.target, axis=-1)
        reward = match.astype(jnp.float32)
        episode_len = state.episode_len + 1
        done = episode_len >= self.ep_length
        keys = jax.vmap(jax.random.split)(state.rng)
        new_target = self._sample_target(keys[:, 0])
        # SB3's IdentityEnv keeps the target fixed within the episode
        target = jnp.where(done[:, None], new_target, state.target)
        state = SynthState(
            target=target,
            episode_len=jnp.where(done, 0, episode_len),
            rng=keys[:, 1],
        )
        return state, SynthOutput(self._obs(target), reward, done, done)


class PointGoalEnv:
    """Continuous-control fixture: a point in R^D, action = displacement,
    reward = -||pos||; learnable by Gaussian PPO in a few iterations
    (optimal deterministic policy: action = -pos, exactly linear).
    The continuous analog of SB3's IdentityEnvBox fixture.

    Actions are NOT clipped: a hard clip makes pushing the mean past the
    boundary free under the executed dynamics, which rewards unbounded
    means and degrades the sampled return — the fixture must stay
    well-posed for the learnability smoke test.
    """

    def __init__(self, dim: int = 2, ep_length: int = 32):
        self.dim = dim
        self.ep_length = ep_length
        self.num_actions = dim
        self.obs_dim = dim

    def reset(self, num_envs: int, rng: jax.Array):
        pos = jax.random.uniform(rng, (num_envs, self.dim), minval=-1.0, maxval=1.0)
        state = SynthState(
            target=pos,
            episode_len=jnp.zeros(num_envs, jnp.int32),
            rng=jax.random.split(rng, num_envs),
        )
        zeros = jnp.zeros(num_envs)
        return state, SynthOutput(pos, zeros, jnp.zeros(num_envs, bool),
                                  jnp.zeros(num_envs, bool))

    def step(self, state: SynthState, actions: jnp.ndarray):
        pos = state.target + actions
        reward = -jnp.linalg.norm(pos, axis=-1)
        episode_len = state.episode_len + 1
        done = episode_len >= self.ep_length
        keys = jax.vmap(jax.random.split)(state.rng)
        new_pos = jax.vmap(
            lambda k: jax.random.uniform(k, (self.dim,), minval=-1.0, maxval=1.0)
        )(keys[:, 0])
        pos = jnp.where(done[:, None], new_pos, pos)
        state = SynthState(
            target=pos,
            episode_len=jnp.where(done, 0, episode_len),
            rng=keys[:, 1],
        )
        return state, SynthOutput(pos, reward, done, done)


class GoalPointEnv:
    """Sparse-reward goal task: point moves by action; reward 0 iff within
    goal_eps of the desired goal, else -1.  obs = [pos | pos | goal]
    (core == achieved here).  Plain off-policy RL gets almost no signal;
    HER relabeling makes it learnable.

    Emits the PRE-reset observation at a done step (the ReconEnv contract);
    with ``terminate_on_success`` episodes end early on goal reach, giving
    variable-length episodes inside a fixed-shape rollout."""

    def __init__(self, dim: int = 2, ep_length: int = 8, goal_eps: float = 0.1,
                 terminate_on_success: bool = False):
        self.dim = dim
        self.ep_length = ep_length
        self.goal_eps = goal_eps
        self.terminate_on_success = terminate_on_success
        self.num_actions = dim
        self.goal_dim = dim
        self.obs_dim = 3 * dim

    def compute_reward(self, achieved, desired):
        d = jnp.linalg.norm(achieved - desired, axis=-1)
        return jnp.where(d < self.goal_eps, 0.0, -1.0)

    def _obs(self, pos, goal):
        return jnp.concatenate([pos, pos, goal], axis=-1)

    def reset(self, num_envs, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        pos = jax.random.uniform(r1, (num_envs, self.dim), minval=-1, maxval=1)
        goal = jax.random.uniform(r2, (num_envs, self.dim), minval=-1, maxval=1)
        state = (pos, goal, jnp.zeros(num_envs, jnp.int32), jax.random.split(r3, num_envs))
        z = jnp.zeros(num_envs)
        return state, SynthOutput(self._obs(pos, goal), z,
                                  jnp.zeros(num_envs, bool), jnp.zeros(num_envs, bool))

    def step(self, state, actions):
        pos, goal, ep_len, keys = state
        pos = pos + 0.25 * jnp.clip(actions, -1, 1)
        reward = self.compute_reward(pos, goal)
        ep_len = ep_len + 1
        time_out = ep_len >= self.ep_length
        success = reward == 0.0
        done = time_out | (success if self.terminate_on_success
                           else jnp.zeros_like(time_out))
        obs = self._obs(pos, goal)  # PRE-reset observation
        ks = jax.vmap(jax.random.split)(keys)
        new_pos = jax.vmap(lambda k: jax.random.uniform(
            k, (self.dim,), minval=-1, maxval=1))(ks[:, 0])
        new_goal = jax.vmap(lambda k: jax.random.uniform(
            jax.random.fold_in(k, 1), (self.dim,), minval=-1, maxval=1))(ks[:, 0])
        pos = jnp.where(done[:, None], new_pos, pos)
        goal = jnp.where(done[:, None], new_goal, goal)
        state = (pos, goal, jnp.where(done, 0, ep_len), ks[:, 1])
        return state, SynthOutput(obs, reward, done, time_out & done)

"""Tests for the recurrent PPO path (BPTT over trajectories)."""
import jax
import jax.numpy as jnp
import numpy as np

from gennbv_tpu.algo import ppo_continuous as ppoc
from gennbv_tpu.algo import ppo_recurrent as ppor
from gennbv_tpu.env.synthetic import PointGoalEnv, SynthOutput, SynthState
from gennbv_tpu.models.actor_critic import RecurrentActorCritic


class CueEnv:
    """Memory fixture: the goal direction is shown ONLY at the first step
    of each episode (obs = cue at t=0, zeros after); reward = action dot cue.
    A feedforward policy sees zeros and cannot beat 0 in expectation;
    a recurrent policy can carry the cue in its hidden state."""

    def __init__(self, dim: int = 2, ep_length: int = 6):
        self.dim = dim
        self.ep_length = ep_length
        self.num_actions = dim
        self.obs_dim = dim

    def _cue(self, keys):
        c = jax.vmap(lambda k: jax.random.normal(k, (self.dim,)))(keys)
        return c / (jnp.linalg.norm(c, axis=-1, keepdims=True) + 1e-8)

    def reset(self, num_envs: int, rng: jax.Array):
        keys = jax.random.split(rng, num_envs)
        cue = self._cue(keys)
        state = SynthState(target=cue,
                           episode_len=jnp.zeros(num_envs, jnp.int32),
                           rng=keys)
        return state, SynthOutput(cue, jnp.zeros(num_envs),
                                  jnp.zeros(num_envs, bool),
                                  jnp.zeros(num_envs, bool))

    def step(self, state: SynthState, actions: jnp.ndarray):
        a = jnp.tanh(actions)
        reward = (a * state.target).sum(-1)
        episode_len = state.episode_len + 1
        done = episode_len >= self.ep_length
        keys = jax.vmap(jax.random.split)(state.rng)
        new_cue = self._cue(keys[:, 0])
        target = jnp.where(done[:, None], new_cue, state.target)
        # obs: the cue ONLY right after reset; zeros mid-episode
        obs = jnp.where(done[:, None], new_cue, jnp.zeros_like(new_cue))
        state = SynthState(target=target,
                           episode_len=jnp.where(done, 0, episode_len),
                           rng=keys[:, 1])
        return state, SynthOutput(obs, reward, done, done)


def test_recurrent_rollout_and_update_shapes():
    env = PointGoalEnv(dim=2, ep_length=8)
    runner = ppor.RecurrentOnPolicyRunner(
        env, ppoc.ContinuousPPOConfig(num_learning_epochs=2, num_mini_batches=2),
        num_steps_per_env=8, num_envs=8, seed=0, rnn_hidden=16,
        actor_hidden=(16,), critic_hidden=(16,))
    m = runner.learn(2)
    assert all(np.isfinite(v) for v in m.values()), m


def test_bptt_gradient_reaches_lstm():
    """The BPTT update must move the LSTM cell weights, not only the heads."""
    env = PointGoalEnv(dim=2, ep_length=8)
    runner = ppor.RecurrentOnPolicyRunner(
        env, ppoc.ContinuousPPOConfig(num_learning_epochs=1, num_mini_batches=1),
        num_steps_per_env=8, num_envs=4, seed=0, rnn_hidden=8,
        actor_hidden=(8,), critic_hidden=(8,))
    before = jax.device_get(runner.train_state.params["memory_a"])
    runner.learn(1)
    after = jax.device_get(runner.train_state.params["memory_a"])
    moved = sum(float(np.abs(a - b).sum())
                for a, b in zip(jax.tree.leaves(after), jax.tree.leaves(before)))
    assert moved > 0.0


def test_recurrent_learns_memory_task():
    """On the cue task the recurrent policy must clearly beat the zero
    baseline (which is the ceiling for any memoryless policy on the
    mid-episode steps)."""
    env = CueEnv(dim=2, ep_length=6)
    runner = ppor.RecurrentOnPolicyRunner(
        env, ppoc.ContinuousPPOConfig(num_learning_epochs=4, num_mini_batches=4,
                                      learning_rate=3e-3, desired_kl=None,
                                      entropy_coef=0.0),
        num_steps_per_env=12, num_envs=64, seed=0, rnn_hidden=32,
        actor_hidden=(32,), critic_hidden=(32,))
    runner.learn(30)

    # deterministic eval: mean reward on mid-episode steps (cue invisible)
    policy = runner.get_inference_policy()
    st, out = env.reset(128, jax.random.PRNGKey(9))
    hidden = runner.model.initial_state(128)
    obs, mid_rews = out.obs, []
    for t in range(6):
        a, hidden = policy(obs, hidden)
        st, out = env.step(st, a)
        obs = out.obs
        if t >= 1:  # steps where obs is zeros -> needs memory
            mid_rews.append(float(out.reward.mean()))
    mean_mid = float(np.mean(mid_rews))
    assert mean_mid > 0.3, mean_mid  # memoryless ceiling is ~0

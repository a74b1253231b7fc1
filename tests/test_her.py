"""HER tests: relabeling semantics + sparse-reward learnability."""
import jax
import jax.numpy as jnp
import numpy as np

from gennbv_tpu.algo import her as her_lib
from gennbv_tpu.algo.off_policy import OffPolicyConfig
from gennbv_tpu.env.synthetic import SynthOutput


class GoalPointEnv:
    """Sparse-reward goal task: point moves by action; reward 0 iff within
    goal_eps of the desired goal, else -1.  obs = [pos | pos | goal]
    (core == achieved here).  Plain off-policy RL gets almost no signal;
    HER relabeling makes it learnable."""

    def __init__(self, dim: int = 2, ep_length: int = 8, goal_eps: float = 0.1):
        self.dim = dim
        self.ep_length = ep_length
        self.goal_eps = goal_eps
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
        done = ep_len >= self.ep_length
        ks = jax.vmap(jax.random.split)(keys)
        new_pos = jax.vmap(lambda k: jax.random.uniform(
            k, (self.dim,), minval=-1, maxval=1))(ks[:, 0])
        new_goal = jax.vmap(lambda k: jax.random.uniform(
            jax.random.fold_in(k, 1), (self.dim,), minval=-1, maxval=1))(ks[:, 0])
        pos = jnp.where(done[:, None], new_pos, pos)
        goal = jnp.where(done[:, None], new_goal, goal)
        state = (pos, goal, jnp.where(done, 0, ep_len), ks[:, 1])
        return state, SynthOutput(self._obs(pos, goal), reward, done, done)


def test_relabel_semantics():
    """Relabeled transitions must use a FUTURE achieved goal of the same
    episode and recompute the reward accordingly."""
    env = GoalPointEnv(dim=1, ep_length=4)
    buf = her_lib.init_episode_buffer(4, 4, env.obs_dim, 1)
    # one synthetic episode: pos goes 0 -> .1 -> .2 -> .3 -> .4; goal fixed 9
    pos = jnp.array([0.0, 0.1, 0.2, 0.3, 0.4])[:, None]
    goal = jnp.full((5, 1), 9.0)
    obs_seq = jnp.concatenate([pos, pos, goal], axis=-1)[None]  # [1, 5, 3]
    acts = jnp.ones((1, 4, 1))
    buf = her_lib.add_episodes(buf, jnp.tile(obs_seq, (4, 1, 1)),
                               jnp.tile(acts, (4, 1, 1)))

    batch = her_lib.sample_relabeled(
        buf, jax.random.PRNGKey(0), 256, env.goal_dim, env.compute_reward,
        her_lib.HERConfig(future_fraction=1.0, goal_eps=0.1))
    g = np.asarray(batch.obs[:, -1])
    achieved_next = np.asarray(batch.next_obs[:, 1])
    # every relabeled goal must be one of the achieved positions, and >= next
    assert np.isin(np.round(g.astype(np.float64), 5),
                   [0.1, 0.2, 0.3, 0.4]).all()
    assert (g >= achieved_next - 1e-6).all()
    # rewards recomputed: 0 where the next achieved equals the goal
    rew = np.asarray(batch.rewards)
    hit = np.abs(achieved_next - g) < 0.1
    np.testing.assert_array_equal(rew == 0.0, hit)


def test_her_learns_sparse_goal():
    env = GoalPointEnv(dim=2, ep_length=8)
    runner = her_lib.HERRunner(
        env,
        OffPolicyConfig(algo="sac", batch_size=256, learning_starts=2048,
                        learning_rate=1e-3),
        her_lib.HERConfig(future_fraction=0.8),
        num_envs=32, capacity_episodes=2048, seed=0, updates_per_round=32)
    runner.learn(160)

    pol = runner.exploit_policy()
    st, out = env.reset(256, jax.random.PRNGKey(7))
    obs = out.obs
    success = jnp.zeros(256, bool)
    for _ in range(8):
        st, out = env.step(st, pol(obs))
        obs = out.obs
        success = success | (out.reward == 0.0)
    rate = float(success.mean())
    # random policy success rate is ~2-5%; HER-trained should be far higher
    assert rate > 0.4, rate

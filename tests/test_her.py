"""HER tests: relabeling semantics + sparse-reward learnability."""
import jax
import jax.numpy as jnp
import numpy as np

from gennbv_tpu.algo import her as her_lib
from gennbv_tpu.algo.off_policy import OffPolicyConfig
from gennbv_tpu.env.synthetic import GoalPointEnv


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
    runner.learn(120)

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
    assert rate > 0.3, rate

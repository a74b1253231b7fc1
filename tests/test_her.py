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


def test_relabel_respects_segment_boundaries():
    """With in-round episode boundaries (auto-reset envs), relabeled future
    goals must come from the SAME episode segment, never across a reset."""
    env = GoalPointEnv(dim=1, ep_length=6)
    buf = her_lib.init_episode_buffer(4, 6, env.obs_dim, 1)
    # round: episode A = steps 0..2 (done at 2, pos .1/.2/.3),
    #        episode B = steps 3..5 (pos 7.1/7.2/7.3); obs[3] is A's
    #        terminal (pre-reset contract) -> transition 3 is stale
    pos = jnp.array([0.0, 0.1, 0.2, 0.3, 7.1, 7.2, 7.3])[:, None]
    goal = jnp.full((7, 1), 9.0)
    obs_seq = jnp.concatenate([pos, pos, goal], axis=-1)[None]
    acts = jnp.ones((1, 6, 1))
    done = jnp.asarray([[0.0, 0.0, 1.0, 0.0, 0.0, 1.0]])
    timeout = jnp.asarray([[0.0, 0.0, 0.0, 0.0, 0.0, 1.0]])
    buf = her_lib.add_episodes(buf, jnp.tile(obs_seq, (4, 1, 1)),
                               jnp.tile(acts, (4, 1, 1)),
                               jnp.tile(done, (4, 1)),
                               jnp.tile(timeout, (4, 1)))
    np.testing.assert_array_equal(np.asarray(buf.seg_end[0]),
                                  [2, 2, 2, 5, 5, 5])

    batch = her_lib.sample_relabeled(
        buf, jax.random.PRNGKey(0), 512, env.goal_dim, env.compute_reward,
        her_lib.HERConfig(future_fraction=1.0))
    obs_pos = np.asarray(batch.obs[:, 0])
    g = np.asarray(batch.obs[:, -1])
    ep_a = obs_pos < 1.0   # transitions of episode A
    # A's goals only from A's achieved {.1,.2,.3}; B's only from {7.2,7.3}
    assert np.isin(np.round(g[ep_a].astype(np.float64), 5),
                   [0.1, 0.2, 0.3]).all(), g[ep_a]
    assert np.isin(np.round(g[~ep_a].astype(np.float64), 5),
                   [7.2, 7.3]).all(), g[~ep_a]
    # stale transition 3 (obs = A's terminal 0.3 feeding into B) is shifted:
    # no sampled transition may pair obs 0.3 with next_obs 7.2
    stale = (np.abs(obs_pos - 0.3) < 1e-6) & \
        (np.abs(np.asarray(batch.next_obs[:, 0]) - 7.2) < 1e-6)
    assert not stale.any()
    # gamma mask: A's terminal transition (t=2) is a true terminal
    term_t2 = (np.abs(obs_pos - 0.2) < 1e-6)
    np.testing.assert_array_equal(np.asarray(batch.terminals)[term_t2], 1.0)


def test_her_learns_variable_length_episodes():
    """terminate_on_success gives variable-length episodes; HER must still
    learn (boundary-safe relabeling)."""
    env = GoalPointEnv(dim=2, ep_length=8, terminate_on_success=True)
    runner = her_lib.HERRunner(
        env,
        OffPolicyConfig(algo="sac", batch_size=256, learning_starts=2048,
                        learning_rate=1e-3),
        her_lib.HERConfig(future_fraction=0.8),
        num_envs=32, capacity_episodes=2048, seed=0, updates_per_round=32)
    runner.learn(90)

    pol = runner.exploit_policy()
    st, out = env.reset(256, jax.random.PRNGKey(7))
    obs = out.obs
    success = jnp.zeros(256, bool)
    for _ in range(8):
        st, out = env.step(st, pol(obs))
        obs = out.obs
        success = success | (out.reward == 0.0)
    rate = float(success.mean())
    assert rate > 0.3, rate

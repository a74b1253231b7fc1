"""Tests for the off-policy family: replay buffer, SAC/TD3/DDPG, DQN."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gennbv_tpu.algo import replay_buffer as rb
from gennbv_tpu.algo.dqn import DQNConfig, DQNRunner
from gennbv_tpu.algo.off_policy import (OffPolicyConfig, OffPolicyLearner,
                                        OffPolicyRunner)
from gennbv_tpu.env.synthetic import IdentityEnvMultiDiscrete, PointGoalEnv


def test_replay_buffer_ring_semantics():
    buf = rb.init(8, obs_dim=2, action_dim=1)
    mk = lambda v, n=4: (jnp.full((n, 2), v), jnp.full((n, 1), v),
                         jnp.full(n, v), jnp.full((n, 2), v + 0.5),
                         jnp.zeros(n, bool))
    buf = rb.add_batch(buf, *mk(1.0))
    assert int(buf.size) == 4 and int(buf.pos) == 4
    buf = rb.add_batch(buf, *mk(2.0))
    buf = rb.add_batch(buf, *mk(3.0))   # wraps, overwrites the 1.0 batch
    assert int(buf.size) == 8 and int(buf.pos) == 4
    obs = np.asarray(buf.obs)
    assert set(np.unique(obs)) == {2.0, 3.0}
    # timeout transitions are not terminal
    n = 4
    buf = rb.add_batch(buf, jnp.zeros((n, 2)), jnp.zeros((n, 1)), jnp.zeros(n),
                       jnp.zeros((n, 2)), jnp.ones(n, bool), jnp.ones(n, bool))
    assert float(np.asarray(buf.terminals)[0:4].sum()) == 0.0
    batch = rb.sample(buf, jax.random.PRNGKey(0), 16)
    assert batch.obs.shape == (16, 2)


@pytest.mark.parametrize("algo", ["sac", "td3", "ddpg"])
def test_off_policy_update_is_finite(algo):
    cfg = OffPolicyConfig(algo=algo, batch_size=32)
    learner = OffPolicyLearner(cfg, obs_dim=3, action_dim=2,
                               rng=jax.random.PRNGKey(0))
    r = jax.random.PRNGKey(1)
    batch = rb.Batch(
        obs=jax.random.normal(r, (32, 3)),
        actions=jax.random.uniform(r, (32, 2), minval=-1, maxval=1),
        rewards=jax.random.normal(r, (32,)),
        next_obs=jax.random.normal(r, (32, 3)),
        terminals=jnp.zeros(32),
    )
    st, metrics = jax.jit(learner.update)(learner.state, batch, r)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    # params actually moved
    diff = jax.tree.reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree.map(lambda a, b: a - b, st.critic_params,
                     learner.state.critic_params), 0.0)
    assert diff > 0.0


def test_td3_policy_delay():
    cfg = OffPolicyConfig(algo="td3", policy_delay=2, batch_size=16)
    learner = OffPolicyLearner(cfg, 3, 2, jax.random.PRNGKey(0))
    r = jax.random.PRNGKey(1)
    batch = rb.Batch(jax.random.normal(r, (16, 3)),
                     jax.random.uniform(r, (16, 2), minval=-1, maxval=1),
                     jnp.ones(16), jax.random.normal(r, (16, 3)), jnp.zeros(16))
    st0 = learner.state
    # step counter 0 -> actor UPDATES (0 % 2 == 0)
    st1, _ = learner.update(st0, batch, r)
    moved1 = jax.tree.reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree.map(lambda a, b: a - b, st1.actor_params, st0.actor_params), 0.0)
    # step counter 1 -> actor FROZEN
    st2, _ = learner.update(st1, batch, r)
    moved2 = jax.tree.reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree.map(lambda a, b: a - b, st2.actor_params, st1.actor_params), 0.0)
    assert moved1 > 0.0 and moved2 == 0.0


@pytest.mark.parametrize("algo", ["sac", "td3"])
def test_off_policy_learns_point_goal(algo):
    env = PointGoalEnv(dim=2, ep_length=16)
    runner = OffPolicyRunner(
        env,
        OffPolicyConfig(algo=algo, batch_size=128, buffer_capacity=16384,
                        learning_starts=512, learning_rate=1e-3),
        num_envs=16, seed=0)
    runner.learn(800, chunk=100)
    pol = runner.exploit_policy()
    st, out = env.reset(64, jax.random.PRNGKey(5))
    obs, tot = out.obs, 0.0
    for _ in range(16):
        st, out = env.step(st, pol(obs))
        obs = out.obs
        tot += float(out.reward.mean())
    mean_rew = tot / 16
    # random policy scores ~ -1.3; learned should be clearly better
    assert mean_rew > -0.75, (algo, mean_rew)


def test_dqn_learns_identity():
    env = IdentityEnvMultiDiscrete(nvec=(4,), ep_length=8)
    runner = DQNRunner(env, DQNConfig(batch_size=64, buffer_capacity=8192,
                                      learning_starts=256,
                                      eps_decay_steps=2000,
                                      target_update_interval=50),
                       num_envs=16, seed=0)
    runner.learn(1500, chunk=150)
    pol = runner.greedy_policy()
    st, out = env.reset(64, jax.random.PRNGKey(3))
    _, out2 = env.step(st, pol(out.obs))
    acc = float(np.asarray(out2.reward).mean())
    assert acc > 0.9, acc   # matches the target from the one-hot obs

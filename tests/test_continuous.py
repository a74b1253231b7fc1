"""Tests for the rsl_rl-equivalent continuous family: Gaussian actor-critic,
adaptive-KL PPO, OnPolicyRunner, recurrent modules, synthetic fixtures."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gennbv_tpu.algo import ppo_continuous as ppoc
from gennbv_tpu.algo.on_policy_runner import OnPolicyRunner, OnPolicyRunnerConfig
from gennbv_tpu.env.synthetic import IdentityEnvMultiDiscrete, PointGoalEnv
from gennbv_tpu.models import gaussian
from gennbv_tpu.models.actor_critic import (GaussianActorCritic, RNNState,
                                            RecurrentActorCritic, reset_hidden)


def test_gaussian_logprob_entropy_kl():
    rng = jax.random.PRNGKey(0)
    mean = jax.random.normal(rng, (32, 4))
    log_std = jnp.full((4,), -0.5)
    acts = gaussian.sample(mean, log_std, jax.random.PRNGKey(1))
    lp = gaussian.log_prob(mean, log_std, acts)
    assert lp.shape == (32,)
    # analytic check against scipy-style formula
    var = np.exp(-1.0)
    expected = -0.5 * (((np.asarray(acts) - np.asarray(mean)) ** 2) / var
                       + 2 * (-0.5) + np.log(2 * np.pi)).sum(-1)
    np.testing.assert_allclose(np.asarray(lp), expected, rtol=1e-5)
    # KL(p||p) == 0; KL grows with mean shift
    assert float(gaussian.kl(mean, log_std, mean, log_std)) == pytest.approx(0.0, abs=1e-6)
    assert float(gaussian.kl(mean, log_std, mean + 1.0, log_std)) > 0.1


def test_gaussian_actor_critic_shapes():
    model = GaussianActorCritic(num_actions=3, actor_hidden=(32, 32),
                                critic_hidden=(32, 32))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)))["params"]
    out = model.apply({"params": params}, jnp.ones((5, 8)))
    assert out.mean.shape == (5, 3)
    assert out.log_std.shape == (3,)
    assert out.value.shape == (5,)
    # learned std initialised at init_noise_std=1 -> log_std == 0
    np.testing.assert_allclose(np.asarray(out.log_std), 0.0, atol=1e-6)


def test_recurrent_actor_critic_step_and_reset():
    model = RecurrentActorCritic(num_actions=2, rnn_hidden=16,
                                 actor_hidden=(16,), critic_hidden=(16,))
    h0 = model.initial_state(4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 6)), h0)["params"]
    (out, h1) = model.apply({"params": params}, jnp.ones((4, 6)), h0)
    assert out.mean.shape == (4, 2)
    # hidden state actually changes and carries information
    (out2, h2) = model.apply({"params": params}, jnp.ones((4, 6)), h1)
    assert not np.allclose(np.asarray(out.mean), np.asarray(out2.mean))
    # done-masked reset zeroes only the flagged env
    done = jnp.array([True, False, False, False])
    h_masked = reset_hidden(h1, done)
    c = np.asarray(h_masked.actor[0])
    assert np.allclose(c[0], 0.0) and not np.allclose(c[1], 0.0)


def test_gru_variant():
    model = RecurrentActorCritic(num_actions=2, rnn_hidden=8, rnn_type="gru",
                                 actor_hidden=(8,), critic_hidden=(8,))
    h0 = model.initial_state(3)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((3, 5)), h0)["params"]
    (out, h1) = model.apply({"params": params}, jnp.ones((3, 5)), h0)
    assert out.value.shape == (3,)
    assert h1.actor.shape == (3, 8)


def test_identity_env_contract():
    env = IdentityEnvMultiDiscrete(nvec=(3, 4), ep_length=5)
    state, out = env.reset(6, jax.random.PRNGKey(0))
    assert out.obs.shape == (6, 7)
    # matching action gives reward 1
    state2, out2 = env.step(state, state.target)
    np.testing.assert_allclose(np.asarray(out2.reward), 1.0)
    # wrong action gives 0
    wrong = (state.target + 1) % jnp.array([3, 4])
    _, out3 = env.step(state, wrong)
    np.testing.assert_allclose(np.asarray(out3.reward), 0.0)
    # episode terminates at ep_length
    s = state
    for _ in range(5):
        s, o = env.step(s, s.target)
    assert bool(o.done.all())


def test_adaptive_lr_moves():
    """LR must drop when KL explodes and rise when KL is tiny."""
    cfg = ppoc.ContinuousPPOConfig(num_learning_epochs=1, num_mini_batches=1,
                                   desired_kl=0.01, learning_rate=1e-3)
    model = GaussianActorCritic(num_actions=2, actor_hidden=(16,), critic_hidden=(16,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))["params"]
    tx = ppoc.make_optimizer(cfg)
    ts = ppoc.ContinuousTrainState(params, tx.init(params))

    m = 64
    obs = jax.random.normal(jax.random.PRNGKey(1), (m, 4))
    out = model.apply({"params": params}, obs)
    acts = gaussian.sample(out.mean, out.log_std, jax.random.PRNGKey(2))
    logp = gaussian.log_prob(out.mean, out.log_std, acts)
    adv = jax.random.normal(jax.random.PRNGKey(3), (m,))
    ret = jnp.zeros(m)

    # old_mean shifted far from the model's mean -> huge KL -> lr / 1.5
    ts2, um = ppoc.update(model, tx, cfg, ts, obs, None, acts, logp,
                          out.value, out.mean + 10.0, out.log_std, adv, ret,
                          jax.random.PRNGKey(4))
    assert float(um.learning_rate) == pytest.approx(1e-3 / 1.5, rel=1e-5)

    # old_mean == current mean -> KL ~ 0 -> no *1.5 (kl>0 guard) or *1.5 if tiny positive
    ts3, um2 = ppoc.update(model, tx, cfg, ts, obs, None, acts, logp,
                           out.value, out.mean, out.log_std, adv, ret,
                           jax.random.PRNGKey(5))
    assert float(um2.learning_rate) >= 1e-3  # never decreases at tiny KL


def _det_eval(runner, env, n=128, steps=24):
    """Mean per-step reward of the deterministic (mean-action) policy."""
    st, out = env.reset(n, jax.random.PRNGKey(99))
    obs = out.obs
    params = runner.train_state.params
    tot = 0.0
    for _ in range(steps):
        o = runner.model.apply({"params": params}, obs)
        st, out = env.step(st, o.mean)
        obs = out.obs
        tot += float(out.reward.mean())
    return tot / steps


def test_ppo_continuous_learns_point_goal():
    """Gaussian PPO must learn to drive the point toward the origin:
    the deterministic policy's reward improves to near-optimal (the sampled
    rollout reward stays noise-dominated by the exploration std, so the
    assertion is on a deterministic eval, as in rsl_rl's play path)."""
    env = PointGoalEnv(dim=2, ep_length=16)
    runner = OnPolicyRunner(
        env,
        ppoc.ContinuousPPOConfig(num_learning_epochs=4, num_mini_batches=4,
                                 learning_rate=1e-3, desired_kl=0.01,
                                 entropy_coef=0.01),
        OnPolicyRunnerConfig(num_steps_per_env=16),
        num_envs=64, seed=0,
        actor_hidden=(32, 32), critic_hidden=(32, 32),
    )
    runner.learn(1)
    r0 = _det_eval(runner, env)
    runner.learn(30)
    r1 = _det_eval(runner, env)
    assert r1 > r0 + 0.1, (r0, r1)
    assert r1 > -0.5, r1  # near-optimal: |reward| ~ residual noise only
    # inference policy moves the point toward the origin from a known state
    policy = runner.get_inference_policy()
    a = policy(jnp.array([[0.8, -0.6]]))
    assert float(a[0, 0]) < 0.0 and float(a[0, 1]) > 0.0


def test_runner_save_load(tmp_path):
    env = PointGoalEnv(dim=2, ep_length=8)
    runner = OnPolicyRunner(
        env, ppoc.ContinuousPPOConfig(), OnPolicyRunnerConfig(num_steps_per_env=8),
        num_envs=8, seed=0, actor_hidden=(16,), critic_hidden=(16,))
    runner.learn(2)
    p = str(tmp_path / "ck.pkl")
    runner.save(p)
    runner2 = OnPolicyRunner(
        env, ppoc.ContinuousPPOConfig(), OnPolicyRunnerConfig(num_steps_per_env=8),
        num_envs=8, seed=1, actor_hidden=(16,), critic_hidden=(16,))
    runner2.load(p)
    assert runner2.iteration == 2
    x = jnp.ones((1, 2))
    np.testing.assert_allclose(
        np.asarray(runner.get_inference_policy()(x)),
        np.asarray(runner2.get_inference_policy()(x)), rtol=1e-6)


def test_a2c_variant_learns():
    """A2C (degenerate PPO: 1 epoch, no clip, TF-style RMSprop) learns
    PointGoal in its natural regime: tiny rollouts (SB3 default n_steps=5),
    many cheap updates — one gradient step per rollout makes A2C far more
    update-hungry than PPO."""
    env = PointGoalEnv(dim=2, ep_length=16)
    runner = OnPolicyRunner(
        env, ppoc.a2c_config(learning_rate=7e-4),
        OnPolicyRunnerConfig(num_steps_per_env=5),
        num_envs=64, seed=0, actor_hidden=(32, 32), critic_hidden=(32, 32))
    runner.learn(1)
    r0 = _det_eval(runner, env)
    runner.learn(1500)
    r1 = _det_eval(runner, env)
    assert r1 > r0 + 0.4, (r0, r1)

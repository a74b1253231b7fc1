"""Tests for the pluggable depth sources (replay bank + host callback)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gennbv_tpu import spec
from gennbv_tpu.config import CameraConfig, EnvConfig, RendererConfig, SceneConfig
from gennbv_tpu.env import ReconEnv, make_scenes
from gennbv_tpu.env.depth_sources import (CallbackDepthSource,
                                          ReplayDepthSource,
                                          record_replay_bank)


def _cfg(mode):
    return EnvConfig(
        num_envs=4,
        camera=CameraConfig(height=16, width=16),
        renderer=RendererConfig(resolution=16, mode=mode),
        scene=SceneConfig(num_scenes=2, seed=0),
        max_episode_length=5,
    )


def _action_poses(env, actions):
    return actions.astype(jnp.float32) * env.action_unit + env.pose_low


def test_replay_source_reproduces_dda():
    """An env fed from a replay bank recorded at the visited poses must
    produce the SAME observations as the live DDA env."""
    cfg_dda = _cfg("dda")
    scenes = make_scenes(cfg_dda.scene, cfg_dda.renderer.resolution)
    env_dda = ReconEnv(cfg_dda, scenes)

    # actions the test will take (incl. the forced init action)
    acts = [
        jnp.broadcast_to(env_dda.init_action, (4, 6)).astype(jnp.int32),
        (jnp.broadcast_to(env_dda.init_action, (4, 6)) +
         jnp.array([5, -5, -10, 0, -3, 4])).astype(jnp.int32) % env_dda.nvec,
    ]
    pose_list = np.concatenate(
        [np.asarray(_action_poses(env_dda, a))[:1] for a in acts], axis=0)
    bank = record_replay_bank(scenes, cfg_dda.camera, pose_list)

    env_rep = ReconEnv(_cfg("replay"), scenes, ReplayDepthSource(bank))

    def assert_obs_match(a, b):
        """Pose/rgb slices exact; grid cells may flip on voxel boundaries:
        the recorded f32 frame and the live render differ by last-ulp
        (different XLA fusion contexts), which flips points sitting exactly
        on voxel faces.  Allow <0.1% of grid cells to differ."""
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a[:, :600], b[:, :600], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(a[:, 8600:], b[:, 8600:], rtol=1e-4, atol=1e-3)
        grid_mismatch = np.mean(np.abs(a[:, 600:8600] - b[:, 600:8600]) > 0.5)
        assert grid_mismatch < 1e-3, grid_mismatch

    s1, o1 = env_dda.reset(4)
    s2, o2 = env_rep.reset(4)
    assert_obs_match(o1.obs, o2.obs)
    s1, o1 = env_dda.step(s1, acts[1])
    s2, o2 = env_rep.step(s2, acts[1])
    assert_obs_match(o1.obs, o2.obs)
    # hit points lie ON render-voxel faces; every 4th face coincides exactly
    # with a GT-cell plane (16- vs 20-cell grids over one box), so last-ulp
    # frame differences flip those cells -> small coverage deltas at tiny
    # grid scale.  Cross-implementation tolerance, not a correctness bound.
    np.testing.assert_allclose(np.asarray(o1.coverage), np.asarray(o2.coverage),
                               rtol=0, atol=0.03)


def test_replay_nearest_pose_lookup():
    """Off-bank poses snap to the nearest recorded pose, not garbage."""
    cfg = _cfg("dda")
    scenes = make_scenes(cfg.scene, cfg.renderer.resolution)
    poses = np.array([[0, 0, 5, 0, np.pi / 2, 0],
                      [3, 3, 4, 0, 0.5, 1.0]], np.float32)
    bank = record_replay_bank(scenes, cfg.camera, poses)
    src = ReplayDepthSource(bank)
    probe = jnp.asarray([[0.1, -0.1, 5.05, 0, np.pi / 2, 0]], jnp.float32)
    d, fg = src.render_batch(jnp.zeros(1, jnp.int32), probe)
    np.testing.assert_array_equal(np.asarray(d[0]),
                                  np.asarray(bank.frames[0, 0]))


def test_callback_source_under_jit():
    """The host-callback source must work inside the jitted env step and
    reproduce the frames the callback returns."""
    cfg_dda = _cfg("dda")
    scenes = make_scenes(cfg_dda.scene, cfg_dda.renderer.resolution)
    env_dda = ReconEnv(cfg_dda, scenes)

    # external "simulator": replays DDA frames computed on the host
    from gennbv_tpu.ops import camera as cam_lib
    from gennbv_tpu.ops import render as render_lib
    cam = cfg_dda.camera
    rays = jnp.asarray(cam_lib.camera_rays(cam.height, cam.width,
                                           cam.horizontal_fov_deg))

    def host_render(sids, poses):
        out = []
        for sid, pose in zip(sids, poses):
            r, t = cam_lib.pose_to_c2w(jnp.asarray(pose), cam.z_offset)
            d, _ = render_lib.render_depth(
                scenes.render_occ[int(sid)], scenes.box_lo[int(sid)],
                scenes.box_hi[int(sid)], rays, r, t,
                scenes.grid_res, 3 * scenes.grid_res, cam.depth_max)
            out.append(np.asarray(d))
        return np.stack(out)

    src = CallbackDepthSource(host_render, cam.height, cam.width, cam.depth_max)
    env_cb = ReconEnv(_cfg("callback"), scenes, src)

    s1, o1 = env_dda.reset(4)
    s2, o2 = env_cb.reset(4)
    np.testing.assert_allclose(np.asarray(o1.obs), np.asarray(o2.obs),
                               rtol=1e-4, atol=1e-5)


def test_missing_depth_source_raises():
    cfg = _cfg("replay")
    scenes = make_scenes(cfg.scene, cfg.renderer.resolution)
    try:
        ReconEnv(cfg, scenes)
        assert False, "expected assertion"
    except AssertionError as e:
        assert "depth_source" in str(e)

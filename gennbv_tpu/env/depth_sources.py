"""Pluggable depth sources — the Isaac Gym camera replacement contract.

The reference's depth frames come from Isaac Gym's rasterizer (SURVEY §2.6
N2).  This framework's built-in sources are the surface-splat and voxel-DDA
renderers (ops/splat.py, ops/render.py); this module adds the two external
feeds the TPU-native design calls for:

- :class:`ReplayDepthSource` — a recorded (pose -> depth frame) bank per
  scene with nearest-pose lookup, fully on-device.  This is the fixture
  backend for tests (SB3 FakeImageEnv analogue) and the path for training
  against frames captured from any external renderer.
- :class:`CallbackDepthSource` — a live bridge to an external simulator
  process through ``jax.pure_callback``: the host function receives
  (scene_ids [N], poses [N, 6]) and returns depth [N, H*W].  The only
  host<->device crossing on the training path (SURVEY §5.8).

Both plug into ReconEnv via ``renderer.mode = "replay" | "callback"`` and
feed the same back-projection/mapping pipeline as the DDA renderer.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ReplayBank(NamedTuple):
    poses: jnp.ndarray    # [S, M, 6] recorded camera poses per scene
    frames: jnp.ndarray   # [S, M, H*W] float32 depth frames
    fg: jnp.ndarray       # [S, M, H*W] bool foreground masks


# pose-distance weights: position in meters, pitch/yaw in radians scaled to
# comparable magnitude (a 15-degree step ~ one 0.2 m position step)
_POSE_W = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.76, 0.76], jnp.float32)


class ReplayDepthSource:
    def __init__(self, bank: ReplayBank):
        self.bank = bank

    def render_batch(self, scene_id: jnp.ndarray, poses: jnp.ndarray):
        """(depth [N, H*W], fg [N, H*W]) from the nearest recorded pose."""
        ref = self.bank.poses[scene_id]                      # [N, M, 6]
        d2 = (((poses[:, None, :] - ref) * _POSE_W[None, None, :]) ** 2).sum(-1)
        nearest = jnp.argmin(d2, axis=-1)                    # [N]
        n = poses.shape[0]
        depth = self.bank.frames[scene_id, nearest]
        fg = self.bank.fg[scene_id, nearest]
        return depth, fg


class CallbackDepthSource:
    """Host-callback bridge to an external renderer/simulator.

    ``fn(scene_ids np[N], poses np[N, 6]) -> np.float32 [N, H*W]`` runs on
    the host every env step; foreground is derived as depth < depth_max.
    """

    def __init__(self, fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
                 height: int, width: int, depth_max: float):
        self.fn = fn
        self.height = height
        self.width = width
        self.depth_max = depth_max

    def render_batch(self, scene_id: jnp.ndarray, poses: jnp.ndarray):
        n = poses.shape[0]
        out_shape = jax.ShapeDtypeStruct((n, self.height * self.width),
                                         jnp.float32)
        depth = jax.pure_callback(
            lambda sid, p: np.asarray(
                self.fn(np.asarray(sid), np.asarray(p)), np.float32
            ).reshape(n, -1),
            out_shape, scene_id, poses, vmap_method="broadcast_all",
        )
        fg = depth < self.depth_max * (1.0 - 1e-4)
        return depth, fg


def record_replay_bank(scenes, camera_cfg, pose_sets: np.ndarray,
                       grid_res: int = None) -> ReplayBank:
    """Render a replay bank with the built-in DDA renderer.

    pose_sets: [S, M, 6] poses to record per scene (or [M, 6] shared).
    """
    from gennbv_tpu.ops import camera as camera_lib
    from gennbv_tpu.ops import render as render_lib

    if pose_sets.ndim == 2:
        pose_sets = np.tile(pose_sets[None], (scenes.num_scenes, 1, 1))
    s, m, _ = pose_sets.shape
    h, w = camera_cfg.height, camera_cfg.width
    r = grid_res or scenes.grid_res
    cam_rays = jnp.asarray(
        camera_lib.camera_rays(h, w, camera_cfg.horizontal_fov_deg))

    def render_one(sid, pose):
        r_c2w, t_c2w = camera_lib.pose_to_c2w(pose, camera_cfg.z_offset)
        return render_lib.render_depth(
            scenes.render_occ[sid], scenes.box_lo[sid], scenes.box_hi[sid],
            cam_rays, r_c2w, t_c2w, r, 3 * r, camera_cfg.depth_max)

    render = jax.jit(jax.vmap(render_one))
    frames = np.zeros((s, m, h * w), np.float32)
    fgs = np.zeros((s, m, h * w), bool)
    poses_j = jnp.asarray(pose_sets, jnp.float32)
    for j in range(m):
        d, f = render(jnp.arange(s, dtype=jnp.int32), poses_j[:, j])
        frames[:, j] = np.asarray(d)
        fgs[:, j] = np.asarray(f)
    return ReplayBank(poses=poses_j, frames=jnp.asarray(frames),
                      fg=jnp.asarray(fgs))

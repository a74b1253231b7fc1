"""Pinhole camera model.

Reproduces the reference camera: intrinsics from horizontal FOV
(env_train_base.py:787-803), pixel grid at integer coordinates
(env_train_gennbv.py:172-181), and the camera-to-world transform that the
reference assembles from Isaac Gym's view matrix via
``inv(view.T) @ blender2opencv`` (env_train_gennbv.py:512-514).

Here the c2w is constructed directly from the drone pose.  The camera is
rigidly mounted on the body (offset +0.1 m in z, env_train_base.py:366) and
the body orientation is ``quat_from_euler_xyz(roll=0, pitch, yaw)``
(env_train_base.py:713), i.e. R = Rz(yaw) @ Ry(pitch).  The optical axis is
the body +x axis; in OpenCV camera convention (x right, y down, z forward):

    z_cam = R @ [1, 0, 0]     (forward)
    x_cam = R @ [0, -1, 0]    (image right  = body -y)
    y_cam = R @ [0, 0, -1]    (image down   = body -z)

pitch = +pi/2 therefore looks straight down (the reference init pose).
"""
from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np


def intrinsics(height: int, width: int, horizontal_fov_deg: float) -> np.ndarray:
    """3x3 K matrix; vertical FOV derived from the aspect ratio
    (env_train_base.py:787-803)."""
    fov_x = math.radians(horizontal_fov_deg)
    fov_y = fov_x * height / width
    focal_x = 0.5 * width / math.tan(0.5 * fov_x)
    focal_y = 0.5 * height / math.tan(0.5 * fov_y)
    cx, cy = width / 2.0, height / 2.0
    return np.array(
        [[focal_x, 0.0, cx], [0.0, focal_y, cy], [0.0, 0.0, 1.0]], dtype=np.float32
    )


def pixel_grid(height: int, width: int) -> np.ndarray:
    """[H*W, 3] homogeneous pixel coords (u, v, 1) at integer positions,
    row-major over (v, u) like the reference meshgrid (env_train_gennbv.py:174-181)."""
    xs = np.arange(width, dtype=np.float32)
    ys = np.arange(height, dtype=np.float32)
    vv, uu = np.meshgrid(ys, xs, indexing="ij")
    ones = np.ones_like(uu)
    return np.stack([uu, vv, ones], axis=-1).reshape(-1, 3)


def camera_rays(height: int, width: int, horizontal_fov_deg: float) -> np.ndarray:
    """[H*W, 3] camera-frame ray directions K^-1 (u, v, 1).

    The z component is 1, so the ray parameter equals z-depth — matching the
    reference back-projection ``K^-1 (u,v,1) * depth`` (env_train_gennbv.py:519-522).
    """
    k = intrinsics(height, width, horizontal_fov_deg)
    inv_k = np.linalg.inv(k).astype(np.float32)
    return pixel_grid(height, width) @ inv_k.T


def pose_to_c2w(pose: jnp.ndarray, cam_z_offset: float = 0.1) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pose [..., 6] (x, y, z, roll=0, pitch, yaw) -> (R_c2w [..., 3, 3], t [..., 3]).

    Columns of R are the OpenCV camera axes expressed in world frame.
    """
    pitch = pose[..., 4]
    yaw = pose[..., 5]
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    # R_body = Rz(yaw) @ Ry(pitch)
    # body axes in world frame:
    bx = jnp.stack([cy * cp, sy * cp, -sp], axis=-1)     # body +x (optical axis)
    by = jnp.stack([-sy, cy, jnp.zeros_like(sy)], axis=-1)  # body +y
    bz = jnp.stack([cy * sp, sy * sp, cp], axis=-1)      # body +z
    # OpenCV cam axes: x_cam=-by, y_cam=-bz, z_cam=bx
    r = jnp.stack([-by, -bz, bx], axis=-1)               # columns
    t = pose[..., 0:3] + jnp.array([0.0, 0.0, cam_z_offset], dtype=pose.dtype)
    return r, t


def depth_to_grayscale(depth: jnp.ndarray, depth_max: float, rgb_h: int, rgb_w: int) -> jnp.ndarray:
    """Stand-in for the reference RGB->64x64 grayscale chain
    (env_train_base.py:513-519).  The TPU renderer produces no RGB, so the
    grayscale history frame is a shaded depth image; the policy encoder never
    reads this slice (hybrid_encoder.py:83 stops at 8600), it exists for
    observation-layout parity.

    depth: [..., H, W] -> [..., rgb_h, rgb_w] in [0, 255].
    """
    gray = (1.0 - jnp.clip(depth / depth_max, 0.0, 1.0)) * 255.0
    batch = gray.shape[:-2]
    out = jax.image.resize(gray, batch + (rgb_h, rgb_w), method="linear")
    return out


def polar_to_cartesian(rtp: jnp.ndarray) -> jnp.ndarray:
    """(r, theta, phi) -> (x, y, z): the reference's
    position_use_polar_coordinates decode (env_train_base.py:688-693).
    theta is azimuth in the xy plane, phi is elevation."""
    r, theta, phi = rtp[..., 0], rtp[..., 1], rtp[..., 2]
    cp = jnp.cos(phi)
    return jnp.stack(
        [r * cp * jnp.cos(theta), r * cp * jnp.sin(theta), r * jnp.sin(phi)],
        axis=-1)


def direction_to_rpy(d: jnp.ndarray) -> jnp.ndarray:
    """Direction vector (dx, dy, dz) -> (roll=0, pitch, yaw): the
    reference's direction_use_vector decode (env_train_base.py:696-706).
    pitch = -asin(dz/|d|); yaw in [0, 2pi) with the reference's
    dy-sign branch."""
    length = jnp.linalg.norm(d, axis=-1, keepdims=True)
    phi = -jnp.arcsin(d[..., 2:3] / length)
    proj = jnp.cos(phi) * length
    base = jnp.arccos(jnp.clip(d[..., 0:1] / proj, -1.0, 1.0))
    theta = jnp.where(d[..., 1:2] > 0, base, 2.0 * jnp.pi - base)
    return jnp.concatenate([jnp.zeros_like(phi), phi, theta], axis=-1)

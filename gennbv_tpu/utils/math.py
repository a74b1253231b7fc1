"""Math utilities — counterpart of legged_gym/utils/math.py (SURVEY §2.2):
quaternion helpers and angle wrapping, as pure jnp functions.

Quaternion convention: (x, y, z, w), matching Isaac Gym's torch_utils that
the reference builds on.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, (x,y,z,w) convention; broadcasts over leading dims."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], axis=-1)


def quat_apply(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v [..., 3] by quaternions q [..., 4]."""
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([-q[..., :3], q[..., 3:]], axis=-1)


def quat_from_euler_zyx(roll: jnp.ndarray, pitch: jnp.ndarray,
                        yaw: jnp.ndarray) -> jnp.ndarray:
    """Intrinsic ZYX (yaw-pitch-roll) Euler angles -> (x,y,z,w) quaternion."""
    cr, sr = jnp.cos(roll / 2), jnp.sin(roll / 2)
    cp, sp = jnp.cos(pitch / 2), jnp.sin(pitch / 2)
    cy, sy = jnp.cos(yaw / 2), jnp.sin(yaw / 2)
    return jnp.stack([
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
        cr * cp * cy + sr * sp * sy,
    ], axis=-1)


def quat_apply_yaw(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by only the yaw component of q
    (legged_gym/utils/math.py:39-45)."""
    yaw_q = jnp.concatenate(
        [jnp.zeros_like(q[..., :2]), q[..., 2:3], q[..., 3:4]], axis=-1)
    yaw_q = yaw_q / jnp.linalg.norm(yaw_q, axis=-1, keepdims=True)
    return quat_apply(yaw_q, v)


def wrap_to_pi(angles: jnp.ndarray) -> jnp.ndarray:
    """Wrap to (-pi, pi] (legged_gym/utils/math.py:47-51)."""
    a = jnp.mod(angles, 2.0 * jnp.pi)
    return jnp.where(a > jnp.pi, a - 2.0 * jnp.pi, a)


def rand_sqrt_float(rng: jax.Array, lower: float, upper: float,
                    shape) -> jnp.ndarray:
    """sqrt-distributed random floats in [lower, upper] — the reference's
    velocity-jitter sampler (legged_gym/utils/math.py:54-59): signed sqrt of
    uniform[-1,1], rescaled."""
    r = 2.0 * jax.random.uniform(rng, shape) - 1.0
    r = jnp.where(r < 0, -jnp.sqrt(-r), jnp.sqrt(r))
    return (r + 1.0) / 2.0 * (upper - lower) + lower

"""Depth-map back-projection to world points.

Rewrite of ``back_projection_fg`` (env_train_gennbv.py:494-533).  The
reference builds ragged per-env point lists via a boolean index; here the
output keeps the fixed [P = H*W] axis plus a validity mask, so the op is
batchable and jit-stable.

The einsum chain  K^-1 (u,v,1) * depth  ->  c2w  is identical; the c2w comes
straight from the drone pose (see ops/camera.py) instead of inverting Isaac
Gym's view matrix on host (the reference's one host<->device round trip per
step, env_train_gennbv.py:512).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def backproject(
    depth: jnp.ndarray,      # [..., P] z-depth per pixel (post-processed, >= 0)
    fg: jnp.ndarray,         # [..., P] bool foreground mask (seg > 50 equivalent)
    cam_rays: jnp.ndarray,   # [P, 3] K^-1 (u, v, 1)
    r_c2w: jnp.ndarray,      # [..., 3, 3]
    t_c2w: jnp.ndarray,      # [..., 3]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (pts [..., P, 3] world points, valid [..., P]).

    Background pixels have depth zeroed before projection, exactly like
    ``depth_maps[~depth_maps_fg] = 0`` (env_train_gennbv.py:509); their
    output points collapse to the camera center and are masked invalid.
    """
    d = jnp.where(fg, depth, 0.0)
    # camera-frame points: rays scale linearly with z-depth
    pts_cam = d[..., None] * cam_rays            # [..., P, 3]
    pts_world = jnp.einsum("...ij,...pj->...pi", r_c2w, pts_cam) + t_c2w[..., None, :]
    valid = fg & (depth > 0.0)
    return pts_world, valid

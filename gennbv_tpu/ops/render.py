"""TPU depth renderer: batched voxel-DDA ray marching.

This replaces the external Isaac Gym rasterizer (SURVEY §2.6 N2) as the
built-in depth source so the entire env step stays on-device and jittable.
Scenes are dense occupancy grids [R, R, R] over a world box; each camera ray
is traversed voxel-by-voxel (Amanatides-Woo DDA) with a fixed step bound of
3R, giving exact first-hit depths (no thin-wall leakage, unlike uniform
sampling).

The ray parameter t equals *z-depth* (rays are R_c2w @ K^-1 (u,v,1), whose
camera-frame z component is 1), matching Isaac Gym's depth image convention
after the reference's nan/clamp/abs post-processing
(env_train_base.py:513-534) and feeding ops/backproject.py unchanged.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def raymarch(
    occ_flat: jnp.ndarray,    # [R^3] occupancy (uint8/bool/float), flattened C-order
    box_lo: jnp.ndarray,      # [3] world min corner of the grid box
    box_hi: jnp.ndarray,      # [3] world max corner
    origin: jnp.ndarray,      # [3] ray origin (camera center)
    dirs: jnp.ndarray,        # [P, 3] world ray directions (t == z-depth param)
    grid_res: int,
    max_steps: int,
    depth_max: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (depth [P], hit [P] bool). depth = depth_max where no hit."""
    r = grid_res
    vsize = (box_hi - box_lo) / r

    eps = 1e-9
    safe_dirs = jnp.where(jnp.abs(dirs) < eps, eps, dirs)
    inv_d = 1.0 / safe_dirs

    # slab test for [box_lo, box_hi]
    t0 = (box_lo[None, :] - origin[None, :]) * inv_d
    t1 = (box_hi[None, :] - origin[None, :]) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_enter = jnp.maximum(t_near, 1e-3)
    alive0 = t_far > t_enter

    # entry voxel (nudged inside)
    p_enter = origin[None, :] + safe_dirs * (t_enter[:, None] + 1e-5)
    voxel0 = jnp.clip(
        jnp.floor((p_enter - box_lo[None, :]) / vsize[None, :]).astype(jnp.int32),
        0,
        r - 1,
    )
    step = jnp.where(dirs >= 0, 1, -1).astype(jnp.int32)      # [P, 3]
    t_delta = jnp.abs(vsize[None, :] * inv_d)                  # [P, 3]
    next_bound = box_lo[None, :] + (voxel0 + (step > 0)) * vsize[None, :]
    t_max0 = (next_bound - origin[None, :]) * inv_d            # [P, 3]

    def body(i, state):
        voxel, t_max, t_cur, hit, t_hit, alive = state
        flat = (voxel[:, 0] * r + voxel[:, 1]) * r + voxel[:, 2]
        occ = occ_flat[flat] > 0
        new_hit = alive & occ & ~hit
        t_hit = jnp.where(new_hit, t_cur, t_hit)
        hit = hit | new_hit
        # advance along the axis with the smallest t_max
        axis = jnp.argmin(t_max, axis=-1)
        t_next = jnp.min(t_max, axis=-1)
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        voxel = voxel + onehot * step
        t_max = t_max + onehot * t_delta
        t_cur = t_next
        in_grid = jnp.all((voxel >= 0) & (voxel < r), axis=-1)
        alive = alive & in_grid & ~hit
        return voxel, t_max, t_cur, hit, t_hit, alive

    hit0 = jnp.zeros(dirs.shape[0], dtype=bool)
    t_hit0 = jnp.full(dirs.shape[0], depth_max, dtype=jnp.float32)
    state = (voxel0, t_max0, t_enter, hit0, t_hit0, alive0)
    _, _, _, hit, t_hit, _ = jax.lax.fori_loop(0, max_steps, body, state)

    depth = jnp.where(hit, jnp.minimum(t_hit, depth_max), depth_max)
    return depth, hit


def render_depth(
    occ_flat: jnp.ndarray,     # [R^3] scene occupancy
    box_lo: jnp.ndarray,
    box_hi: jnp.ndarray,
    cam_rays: jnp.ndarray,     # [P, 3] camera-frame rays (ops.camera.camera_rays)
    r_c2w: jnp.ndarray,        # [3, 3]
    t_c2w: jnp.ndarray,        # [3]
    grid_res: int,
    max_steps: int,
    depth_max: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One camera: (depth [P], fg [P]).  fg == hit-the-object, the stand-in
    for segmentation id > 50 (the ground plane / sky never enter the grid)."""
    dirs = cam_rays @ r_c2w.T
    return raymarch(
        occ_flat, box_lo, box_hi, t_c2w, dirs, grid_res, max_steps, depth_max
    )


def check_collision(
    occ_flat: jnp.ndarray,    # [R^3]
    box_lo: jnp.ndarray,
    box_hi: jnp.ndarray,
    pos: jnp.ndarray,         # [3] drone position
    radius: float,
    grid_res: int,
) -> jnp.ndarray:
    """Voxel-grid replacement of the PhysX contact-force termination test
    (env_train_gennbv.py:446): collision iff any occupied render voxel
    intersects the cube of half-width `radius` around the pose."""
    r = grid_res
    vsize = (box_hi - box_lo) / r
    offs = jnp.array([-radius, 0.0, radius], dtype=jnp.float32)
    ox, oy, oz = jnp.meshgrid(offs, offs, offs, indexing="ij")
    probes = pos[None, :] + jnp.stack([ox, oy, oz], axis=-1).reshape(-1, 3)
    idx = jnp.floor((probes - box_lo[None, :]) / vsize[None, :]).astype(jnp.int32)
    in_grid = jnp.all((idx >= 0) & (idx < r), axis=-1)
    idx = jnp.clip(idx, 0, r - 1)
    flat = (idx[:, 0] * r + idx[:, 1]) * r + idx[:, 2]
    occ = (occ_flat[flat] > 0) & in_grid
    return jnp.any(occ)


def check_collision_batch(
    occ_all: jnp.ndarray,     # [S, R^3] all scenes (stays in place)
    box_lo: jnp.ndarray,      # [S, 3]
    box_hi: jnp.ndarray,      # [S, 3]
    scene_id: jnp.ndarray,    # [N] int32
    pos: jnp.ndarray,         # [N, 3]
    radius: float,
    grid_res: int,
) -> jnp.ndarray:
    """Batched collision over envs with ONE flat gather into the scene
    stack.  The vmapped per-env form (`occ_all[sid]` then 27 probes)
    materializes every env's [R^3] grid first — 6.5 ms at 256 envs; this
    indexes `scene_id * R^3 + probe` directly (~0.1 ms)."""
    r = grid_res
    n = pos.shape[0]
    vsize = (box_hi[scene_id] - box_lo[scene_id]) / r       # [N, 3]
    offs = jnp.array([-radius, 0.0, radius], dtype=jnp.float32)
    ox, oy, oz = jnp.meshgrid(offs, offs, offs, indexing="ij")
    cube = jnp.stack([ox, oy, oz], axis=-1).reshape(-1, 3)  # [27, 3]
    probes = pos[:, None, :] + cube[None, :, :]             # [N, 27, 3]
    idx = jnp.floor(
        (probes - box_lo[scene_id][:, None, :]) / vsize[:, None, :]
    ).astype(jnp.int32)
    in_grid = jnp.all((idx >= 0) & (idx < r), axis=-1)      # [N, 27]
    idx = jnp.clip(idx, 0, r - 1)
    flat = (idx[..., 0] * r + idx[..., 1]) * r + idx[..., 2]
    gflat = scene_id[:, None].astype(jnp.int32) * (r ** 3) + flat
    occ = jnp.take(occ_all.reshape(-1), gflat.reshape(-1)).reshape(n, -1)
    return jnp.any((occ > 0) & in_grid, axis=-1)

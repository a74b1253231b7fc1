"""Free-space carving + probabilistic grid update.

The reference updates each env's probability grid with a per-env Python loop
that launches a JIT-compiled CUDA Bresenham kernel per env per step
(env_train_gennbv.py:295-314, gennbv/utils.py:24-227).  The net per-step
semantics (advanced indexing does NOT accumulate duplicates) are:

    traversed = union of voxels on Bresenham rays from the camera voxel to
                every unique in-bounds hit voxel
    prob[traversed] -= 0.05          (once per step, not per ray)
    prob[hits]       = 1.0           (overwrite wins)

Two batched fixed-shape implementations:

- ``carve_bresenham``: exact reference path semantics.  Rays target all G^3
  voxel centers, masked by the hit grid; integer Bresenham is evaluated for
  all rays in parallel with a lax.scan of 3*G steps (the reference's
  max_pts_per_ray bound, utils.py:37).
- ``carve_ztest`` (default): projective z-test — a voxel is observed-free
  iff its center projects into the image onto a foreground pixel and lies
  strictly in front of the measured surface.  Pure gather, no scatter; the
  TPU-native formulation (SURVEY §7 hard part #1).

Both return a {0,1} "traversed" mask so the fused update is

    prob' = where(hit, 1.0, prob - 0.05 * traversed)
"""
from __future__ import annotations



import jax
import jax.numpy as jnp

from gennbv_tpu import spec


# ---------------------------------------------------------------------------
# Exact Bresenham (reference parity)
# ---------------------------------------------------------------------------
def bresenham_traversed(
    src: jnp.ndarray,        # [3] int32 camera voxel (may be out of bounds)
    targets: jnp.ndarray,    # [R, 3] int32 target voxels (in bounds)
    target_valid: jnp.ndarray,  # [R] bool
    grid_size: int,
) -> jnp.ndarray:
    """[G, G, G] {0,1} mask of voxels traversed by any valid ray.

    Vectorized 3D Bresenham: the per-ray dominant axis selects which error
    terms drive the two secondary axes, matching the CUDA kernel's three
    branches (utils.py:69-164) including its tie-breaking order (x, then y,
    then z).
    """
    g = grid_size
    delta = targets - src[None, :]                       # [R, 3]
    d = jnp.abs(delta)
    s = jnp.sign(delta).astype(jnp.int32)
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    # dominant axis with the kernel's tie-break order
    c = jnp.where((dx >= dy) & (dx >= dz), 0, jnp.where(dy >= dz, 1, 2))
    # one-hot selectors for (dominant, other1, other2)
    eye = jnp.eye(3, dtype=jnp.int32)
    e_c = eye[c]                                          # [R, 3]
    o1 = jnp.where(c == 0, 1, 0)
    o2 = jnp.where(c == 2, 1, 2)
    e1 = eye[o1]
    e2 = eye[o2]
    dm = jnp.max(d, axis=-1)                              # [R]
    d_c = jnp.sum(e_c * d, axis=-1)
    d_1 = jnp.sum(e1 * d, axis=-1)
    d_2 = jnp.sum(e2 * d, axis=-1)

    max_steps = spec.BRESENHAM_MAX_PTS_FACTOR * g

    def body(state, i):
        pos, p1, p2 = state
        emit = target_valid & (i <= dm)
        in_b = jnp.all((pos >= 0) & (pos < g), axis=-1)
        flat = (pos[:, 0] * g + pos[:, 1]) * g + pos[:, 2]
        flat = jnp.where(emit & in_b, flat, g ** 3)       # overflow slot
        # advance (the emitted point is the *current* position, like the
        # kernel which records before stepping)
        step1 = (p1 >= 0).astype(jnp.int32)
        step2 = (p2 >= 0).astype(jnp.int32)
        pos = pos + e1 * (s * e1).sum(-1, keepdims=True) * step1[:, None]
        pos = pos + e2 * (s * e2).sum(-1, keepdims=True) * step2[:, None]
        pos = pos + e_c * (s * e_c).sum(-1, keepdims=True)
        p1 = p1 - 2 * d_c * step1 + 2 * d_1
        p2 = p2 - 2 * d_c * step2 + 2 * d_2
        return (pos, p1, p2), flat

    pos0 = jnp.broadcast_to(src[None, :], targets.shape).astype(jnp.int32)
    p1_0 = 2 * d_1 - d_c
    p2_0 = 2 * d_2 - d_c
    (_, _, _), flats = jax.lax.scan(
        body, (pos0, p1_0, p2_0), jnp.arange(max_steps, dtype=jnp.int32)
    )
    mask = jnp.zeros((g ** 3 + 1,), dtype=jnp.float32)
    mask = mask.at[flats.reshape(-1)].max(1.0)
    return mask[: g ** 3].reshape(g, g, g)


def carve_bresenham(
    hit_grid: jnp.ndarray,   # [G, G, G] {0,1} hit voxels this step
    cam_voxel: jnp.ndarray,  # [3] int32
    grid_size: int,
) -> jnp.ndarray:
    """Traversed mask via exact Bresenham rays to every hit voxel."""
    g = grid_size
    ii, jj, kk = jnp.meshgrid(
        jnp.arange(g, dtype=jnp.int32),
        jnp.arange(g, dtype=jnp.int32),
        jnp.arange(g, dtype=jnp.int32),
        indexing="ij",
    )
    targets = jnp.stack([ii, jj, kk], axis=-1).reshape(-1, 3)
    valid = hit_grid.reshape(-1) > 0.5
    return bresenham_traversed(cam_voxel, targets, valid, g)


# ---------------------------------------------------------------------------
# Projective z-test carve (TPU-native default)
# ---------------------------------------------------------------------------
def project_centers_px(
    voxel_centers: jnp.ndarray,  # [P, 3] world coords
    k: jnp.ndarray,              # [3, 3] intrinsics
    r_c2w: jnp.ndarray,          # [3, 3]
    t_c2w: jnp.ndarray,          # [3]
    height: int, width: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The gather-free half of carve_ztest: project voxel centers into the
    camera.  Returns (vi, ui, z, in_img) with vi/ui clipped — EXACTLY the
    same math as carve_ztest (incl. the z > 1e-6 near-plane threshold,
    which differs from splat.project_px's 1e-3), so the merged-gather path
    (splat.splat_vis_carve) stays bit-identical with the split form."""
    p_cam = jnp.einsum("ij,pj->pi", r_c2w.T, voxel_centers - t_c2w[None, :])
    z = p_cam[:, 2]
    safe_z = jnp.where(z > 1e-6, z, 1.0)
    u = k[0, 0] * p_cam[:, 0] / safe_z + k[0, 2]
    v = k[1, 1] * p_cam[:, 1] / safe_z + k[1, 2]
    ui = jnp.floor(u).astype(jnp.int32)
    vi = jnp.floor(v).astype(jnp.int32)
    in_img = (z > 1e-6) & (ui >= 0) & (ui < width) & (vi >= 0) & (vi < height)
    ui = jnp.clip(ui, 0, width - 1)
    vi = jnp.clip(vi, 0, height - 1)
    return vi, ui, z, in_img


def carve_ztest(
    voxel_centers: jnp.ndarray,  # [G^3, 3] world coords of voxel centers
    depth: jnp.ndarray,          # [H, W] z-depth (depth_max where no surface)
    fg: jnp.ndarray | None,      # [H, W] bool, or None to derive from depth
    k: jnp.ndarray,              # [3, 3] intrinsics
    r_c2w: jnp.ndarray,          # [3, 3]
    t_c2w: jnp.ndarray,          # [3]
    margin: jnp.ndarray,         # scalar: carve only if z < depth - margin
    depth_max: float | None = None,
    gather_impl: str = "mxu",    # "mxu" | "pallas" (ops/pallas_gather.py)
) -> jnp.ndarray:
    """[G^3] {0,1} mask of voxels observed free by this depth frame.

    A pure-gather space carve: project each voxel center into the camera and
    compare its z-depth against the measured surface depth at that pixel.
    Carving happens only toward foreground (object-hit) pixels, matching the
    reference's rays-to-hit-voxels semantics.  Pass fg=None with depth_max to
    derive the fg mask from the gathered depth itself (one gather instead of
    two — the hot-path variant).
    """
    h, w = depth.shape
    vi, ui, z, in_img = project_centers_px(voxel_centers, k, r_c2w, t_c2w, h, w)
    # one-hot MXU gather instead of depth[vi, ui]: the XLA gather is
    # latency-bound, ~4.6x slower at 256 envs (tools/bench_scatter.py).
    # Single-plane bf16: both consumers are slack comparisons (margin is a
    # half mapping voxel ~0.25 m; the fg threshold sits at depth_max where
    # empty pixels hold exactly depth_max, bf16-representable) and bf16's
    # absolute error at scene depths is an order below both slacks.
    from gennbv_tpu.ops import mxu
    if gather_impl == "pallas":
        from gennbv_tpu.ops import pallas_gather
        gather = pallas_gather.gather_image
    else:
        gather = lambda img, v, u: mxu.gather_image(img, v, u, exact=False)
    d_px = gather(depth, vi, ui)
    if fg is None:
        assert depth_max is not None
        fg_px = d_px < depth_max * (1.0 - 1e-4)
    else:
        fg_px = gather(fg.astype(jnp.float32), vi, ui) > 0.5
    free = in_img & fg_px & (z < d_px - margin)
    return free.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Fused prob-grid update
# ---------------------------------------------------------------------------
def update_prob_grid(
    prob_grid: jnp.ndarray,   # [G, G, G]
    hit_grid: jnp.ndarray,    # [G, G, G] {0,1}
    traversed: jnp.ndarray,   # [G, G, G] {0,1}
) -> jnp.ndarray:
    """prob' = where(hit, 1.0, prob - 0.05 * traversed)
    (env_train_gennbv.py:311-314: the occupied overwrite wins)."""
    return jnp.where(
        hit_grid > 0.5,
        spec.OCCUPIED_VALUE,
        prob_grid - spec.CARVE_DELTA * traversed,
    )

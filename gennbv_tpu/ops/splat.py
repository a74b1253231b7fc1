"""Surface-splatting depth renderer — the TPU-native hot path.

The DDA ray-marcher (ops/render.py) is memory-op bound on TPU: H*W rays x
3R sequential gather steps.  This renderer inverts the problem: the scene's
surface voxels (a fixed [Q, 3] point set per scene) are *projected* into the
camera — one batched matmul — and scatter-min'ed into a z-buffer.  Visibility,
mapping hits and free-space carving all derive from that z-buffer:

  - z-buffer:    scatter-min of projected voxel depths (with a small pixel
                 footprint so slanted surfaces don't leave holes)
  - fg mask:     z-buffer < depth_max (only the object ever enters the grid)
  - hits:        a surface voxel is VISIBLE iff its depth matches the
                 z-buffer at its pixel (<= + eps) -> its center is the world
                 hit point, exactly what the mapping update voxelizes
  - carving:     the existing projective z-test (ops/carve.py) against the
                 z-buffer

Per env per step this is ~O(Q) memory ops instead of O(H*W*3R): measured
~100x less gather/scatter traffic than the DDA at the training config.
Occlusion is exact (min wins); depth is quantized to voxel centers, i.e. the
same half-voxel uncertainty as the DDA's first-hit estimate.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def splat_depth(
    surf_pts: jnp.ndarray,    # [Q, 3] surface voxel centers (world)
    surf_mask: jnp.ndarray,   # [Q] bool (padding)
    k: jnp.ndarray,           # [3, 3] intrinsics
    r_c2w: jnp.ndarray,       # [3, 3]
    t_c2w: jnp.ndarray,       # [3]
    height: int,
    width: int,
    depth_max: float,
    voxel_eps: jnp.ndarray,   # scalar: visibility slack (~ render voxel size)
    footprint: int = 1,       # splat radius in pixels (1 -> 3x3)
    zbuf_impl: str = "mxu",   # "mxu" (radix-min matmuls) | "pallas" (fused
                              # kernel, ops/pallas_splat.py) | "scatter" (exact)
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (zbuf [H*W], fg [H*W] bool, visible [Q] bool)."""
    from gennbv_tpu.ops import mxu

    # project: p_cam = R^T (p - t); z-depth = p_cam.z
    p_cam = (surf_pts - t_c2w[None, :]) @ r_c2w  # == einsum('ij,pj->pi', R^T, .)
    z = p_cam[:, 2]
    in_front = (z > 1e-3) & surf_mask
    safe_z = jnp.where(in_front, z, 1.0)
    u = k[0, 0] * p_cam[:, 0] / safe_z + k[0, 2]
    v = k[1, 1] * p_cam[:, 1] / safe_z + k[1, 2]
    ui = jnp.floor(u).astype(jnp.int32)
    vi = jnp.floor(v).astype(jnp.int32)

    big = jnp.asarray(depth_max, jnp.float32)
    ok = in_front & (ui >= 0) & (ui < width) & (vi >= 0) & (vi < height)
    vic = jnp.clip(vi, 0, height - 1)
    uic = jnp.clip(ui, 0, width - 1)

    if zbuf_impl == "pallas":
        # the whole radix-min + pool + visibility sequence fused in VMEM
        # (ops/pallas_splat.py) — numerically identical to the mxu path.
        # Valid points are COMPACTED to the front first: the kernel skips
        # all-invalid 128-point chunks (pl.when), so its matmul count
        # scales with the valid fraction (typically ~20% — points behind
        # the camera or out of frame) instead of the surf capacity.  The
        # dense-GEMM mxu path below cannot exploit this sparsity.
        from gennbv_tpu.ops import pallas_splat
        # stable partition via cumsums + one scatter (NOT argsort — TPU
        # sorts are lane-serial and cost ~10x the kernel itself)
        okf = ok.astype(jnp.int32)
        nvalid = jnp.sum(okf)
        pos = jnp.where(ok, jnp.cumsum(okf) - 1,
                        nvalid + jnp.cumsum(1 - okf) - 1)   # target slot
        vic_c = jnp.zeros_like(vic).at[pos].set(vic)
        uic_c = jnp.zeros_like(uic).at[pos].set(uic)
        z_c = jnp.zeros_like(z).at[pos].set(z)
        ok_c = jnp.zeros_like(ok).at[pos].set(ok)
        zbuf2d, vis_c = pallas_splat.zbuf_visible(
            vic_c, uic_c, z_c, ok_c, voxel_eps,
            height, width, depth_max, footprint)
        visible = vis_c[pos]                                # gather back
        zbuf = zbuf2d.reshape(-1)
        fg = zbuf < depth_max - 1e-6
        return zbuf, fg, visible

    if zbuf_impl == "mxu":
        # radix-min via MXU matmuls (ops/mxu.py): ~6x faster than XLA's
        # scatter-min lowering at training scale; zbuf quantized to 100
        # levels of the per-frame z range; the quantization step widens the
        # visibility slack below.  One-hots are rebuilt inline inside every
        # GEMM (never materialized to HBM) — see scatter_min_image's note.
        zbuf0, quant = mxu.scatter_min_image(
            vic, uic, z, ok, height, width, depth_max)
        voxel_eps = voxel_eps + quant
    else:
        flat = vic * width + uic
        zbuf0 = jnp.full((height * width,), depth_max, jnp.float32)
        zbuf0 = zbuf0.at[flat].min(jnp.where(ok, z, big))

    # ... then the pixel footprint as a (2f+1)^2 min-pool: identical to
    # splatting every point into its footprint, but vectorized min-pools
    # instead of (2f+1)^2 serialized scatter passes (the scatter is the
    # expensive op on TPU: ~10 cycles/update).  Min is separable, so two
    # 1-D reduce_windows instead of one 2-D (measured 2.7 -> ~1 ms at 256
    # envs x 128^2: the 2-D window lowers to a 9-tap loop).
    if footprint > 0:
        k2 = 2 * footprint + 1
        z2d = zbuf0.reshape(height, width)
        z2d = jax.lax.reduce_window(z2d, big, jax.lax.min, (k2, 1), (1, 1), "SAME")
        z2d = jax.lax.reduce_window(z2d, big, jax.lax.min, (1, k2), (1, 1), "SAME")
        zbuf = z2d.reshape(-1)
    else:
        zbuf = zbuf0

    fg = zbuf < depth_max - 1e-6

    # visibility: the voxel's own pixel shows (approximately) its depth.
    # The per-point image gather is the splat's hot op on TPU (30 ms at
    # 256 envs x 11k points as an XLA gather); use the one-hot MXU matmul
    # (ops/mxu.py, ~5x faster).  Single-plane bf16 suffices: the gathered
    # depth enters a slack comparison (voxel_eps >= render voxel ~0.16 m)
    # and bf16's absolute error at scene depths (<= 16 m) is <= 0.0625 m —
    # the hi/lo exact split costs a second matmul (5.3 -> 2.8 ms measured).
    center_ok = in_front & (ui >= 0) & (ui < width) & (vi >= 0) & (vi < height)
    z_at_px = mxu.gather_image(
        zbuf.reshape(height, width), vic, uic, exact=False)
    visible = center_ok & (z <= z_at_px + voxel_eps)
    return zbuf, fg, visible

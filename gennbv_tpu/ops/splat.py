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

from gennbv_tpu.ops import mxu


def project_px(surf_pts, surf_mask, k, r_c2w, t_c2w, height: int, width: int):
    """Project world points into the camera: returns (vic, uic, z, ok) —
    clipped integer pixel coordinates, z-depth, and validity
    (in-front & in-image & not padding)."""
    # p_cam = R^T (p - t); z-depth = p_cam.z
    p_cam = (surf_pts - t_c2w[None, :]) @ r_c2w  # == einsum('ij,pj->pi', R^T, .)
    z = p_cam[:, 2]
    in_front = (z > 1e-3) & surf_mask
    safe_z = jnp.where(in_front, z, 1.0)
    u = k[0, 0] * p_cam[:, 0] / safe_z + k[0, 2]
    v = k[1, 1] * p_cam[:, 1] / safe_z + k[1, 2]
    ui = jnp.floor(u).astype(jnp.int32)
    vi = jnp.floor(v).astype(jnp.int32)
    ok = in_front & (ui >= 0) & (ui < width) & (vi >= 0) & (vi < height)
    vic = jnp.clip(vi, 0, height - 1)
    uic = jnp.clip(ui, 0, width - 1)
    return vic, uic, z, ok


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
    gather_impl: str = "mxu",  # per-point image gathers: "mxu" | "pallas"
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (zbuf [H*W], fg [H*W] bool, visible [Q] bool)."""
    vic, uic, z, ok = project_px(surf_pts, surf_mask, k, r_c2w, t_c2w,
                                 height, width)

    if zbuf_impl == "pallas":
        # the whole radix-min + pool + visibility sequence fused in VMEM
        # (ops/pallas_splat.py) — numerically identical to the mxu path.
        # Valid points are COMPACTED to the front first: the kernel skips
        # all-invalid 128-point chunks (pl.when), so its matmul count
        # scales with the valid fraction (typically ~20% — points behind
        # the camera or out of frame) instead of the surf capacity.  The
        # dense-GEMM mxu path below cannot exploit this sparsity.
        from gennbv_tpu.ops import pallas_splat
        # front-pack valid points with ONE 3-operand lax.sort (~1.5 ms at
        # 256 envs x 11k points).  The previous cumsum + permutation-
        # scatter partition cost ~100 ms at the same scale — XLA lowers
        # the 1-D scatters to latency-bound loops (tools/bench_ragged.py)
        # — and dominated the whole pallas path.
        q = vic.shape[0]
        if q < (1 << 14) and max(height, width) <= 512:
            key = (~ok).astype(jnp.uint32)
            payload = ((vic.astype(jnp.uint32) << 23)
                       | (uic.astype(jnp.uint32) << 14)
                       | jnp.arange(q, dtype=jnp.uint32))
            key_s, pay_s, z_c = jax.lax.sort((key, payload, z), num_keys=1,
                                             is_stable=True)
            vic_c = (pay_s >> 23).astype(jnp.int32)
            uic_c = ((pay_s >> 14) & 0x1FF).astype(jnp.int32)
            idx_c = (pay_s & 0x3FFF).astype(jnp.int32)
            ok_c = key_s == 0
            zbuf2d, vis_c = pallas_splat.zbuf_visible(
                vic_c, uic_c, z_c, ok_c, voxel_eps,
                height, width, depth_max, footprint,
                nvalid=jnp.sum(ok_c))
            # scatter visibility back through the sort permutation with a
            # one-hot matmul (exact; the XLA 1-D scatter is latency-bound)
            a = (vis_c & ok_c)[None, :].astype(jnp.bfloat16)
            c = (idx_c[:, None] == jnp.arange(q, dtype=jnp.int32)[None, :]
                 ).astype(jnp.bfloat16)
            visible = jnp.dot(a, c, preferred_element_type=jnp.float32)[0] > 0.5
        else:  # packing bounds exceeded: run the kernel uncompacted
            zbuf2d, vis_c = pallas_splat.zbuf_visible(
                vic, uic, z, ok, voxel_eps,
                height, width, depth_max, footprint)
            visible = vis_c
        zbuf = zbuf2d.reshape(-1)
        fg = zbuf < depth_max - 1e-6
        return zbuf, fg, visible

    zbuf, visible = zbuf_vis_px(vic, uic, z, ok, height, width, depth_max,
                                voxel_eps, footprint, zbuf_impl,
                                gather_impl=gather_impl)
    fg = zbuf < depth_max - 1e-6
    return zbuf, fg, visible


def _zbuf_px(
    vic: jnp.ndarray, uic: jnp.ndarray, z: jnp.ndarray, ok: jnp.ndarray,
    height: int, width: int, depth_max: float,
    voxel_eps: jnp.ndarray, footprint: int = 1, zbuf_impl: str = "mxu",
    zminmax: tuple | None = None, gather_impl: str = "mxu",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pooled z-buffer from projected pixel coordinates (one env).
    Returns (zbuf [H*W], effective visibility slack — widened by the
    radix quantization step on the mxu path)."""
    big = jnp.asarray(depth_max, jnp.float32)

    if zbuf_impl == "mxu":
        # radix-min via MXU matmuls (ops/mxu.py): ~6x faster than XLA's
        # scatter-min lowering at training scale; zbuf quantized to 100
        # levels of the per-frame z range; the quantization step widens the
        # visibility slack below.  One-hots are rebuilt inline inside every
        # GEMM (never materialized to HBM) — see scatter_min_image's note.
        zbuf0, quant = mxu.scatter_min_image(
            vic, uic, z, ok, height, width, depth_max, zminmax=zminmax,
            gather_impl=gather_impl)
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
    return zbuf, voxel_eps


def zbuf_vis_px(
    vic: jnp.ndarray,         # [Q] int32 clipped pixel rows
    uic: jnp.ndarray,         # [Q] int32 clipped pixel cols
    z: jnp.ndarray,           # [Q] f32 camera-space depth
    ok: jnp.ndarray,          # [Q] bool valid (in-front & in-image)
    height: int, width: int, depth_max: float,
    voxel_eps: jnp.ndarray, footprint: int = 1, zbuf_impl: str = "mxu",
    zminmax: tuple | None = None, gather_impl: str = "mxu",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pooled z-buffer + per-point visibility from projected pixel
    coordinates (one env).  The tail of splat_depth, shared with the
    compacted batch path (splat_depth_batch), which must quantize the
    survivor subset against the ORIGINAL valid set's z range (`zminmax`)
    to stay bit-identical with the dense path."""
    zbuf, voxel_eps = _zbuf_px(vic, uic, z, ok, height, width, depth_max,
                               voxel_eps, footprint, zbuf_impl, zminmax,
                               gather_impl)
    # visibility: the voxel's own pixel shows (approximately) its depth.
    # The per-point image gather is the splat's hot op on TPU (30 ms at
    # 256 envs x 11k points as an XLA gather); use the one-hot MXU matmul
    # (ops/mxu.py, ~5x faster) or the VMEM-resident Pallas kernel
    # (ops/pallas_gather.py — no HBM intermediate).  Single-plane bf16
    # suffices: the gathered depth enters a slack comparison (voxel_eps >=
    # render voxel ~0.16 m) and bf16's absolute error at scene depths
    # (<= 16 m) is <= 0.0625 m — the hi/lo exact split costs a second
    # matmul (5.3 -> 2.8 ms measured).
    zbuf2d = zbuf.reshape(height, width)
    if gather_impl == "pallas":
        from gennbv_tpu.ops import pallas_gather
        z_at_px = pallas_gather.gather_image(zbuf2d, vic, uic)
    else:
        z_at_px = mxu.gather_image(zbuf2d, vic, uic, exact=False)
    visible = ok & (z <= z_at_px + voxel_eps)
    return zbuf, visible


def splat_vis_carve(
    surf_pts: jnp.ndarray,    # [Q, 3] surface voxel centers (world)
    surf_mask: jnp.ndarray,   # [Q] bool (padding)
    centers: jnp.ndarray,     # [P, 3] mapping-grid voxel centers (world)
    k: jnp.ndarray,           # [3, 3] intrinsics
    r_c2w: jnp.ndarray,       # [3, 3]
    t_c2w: jnp.ndarray,       # [3]
    height: int, width: int, depth_max: float,
    voxel_eps: jnp.ndarray,   # scalar: visibility slack
    carve_margin: jnp.ndarray,  # scalar: carve z-test margin
    footprint: int = 1,
    gather_impl: str = "mxu",  # merged + radix gathers: "mxu" | "pallas*"
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Splat z-buffer + visibility + z-test carve in ONE merged image
    gather (mxu z-buffer path only).  Returns (zbuf [H*W], visible [Q],
    free [P]).

    The splat's visibility test and the carve's z-test (ops/carve.py,
    carve_ztest) both gather the SAME pooled z-buffer — at the Q surface
    points' pixels and the P=G^3 mapping voxel centers' pixels
    respectively.  Gathering both point sets in one [Q+P, H] x [H, W]
    one-hot GEMM removes a whole image pass (dispatch + image re-stream)
    and feeds the MXU a taller M dimension.  Bit-identical to the split
    form: gather_image rows are independent (each output element is its
    own H-length dot), and every downstream comparison is unchanged.
    """
    from gennbv_tpu.ops import carve as carve_lib

    vic, uic, z, ok = project_px(surf_pts, surf_mask, k, r_c2w, t_c2w,
                                 height, width)
    zbuf, eps_eff = _zbuf_px(vic, uic, z, ok, height, width, depth_max,
                             voxel_eps, footprint, "mxu",
                             gather_impl=gather_impl)

    # project the mapping voxel centers — carve_ztest's exact projection
    # (its near-plane threshold differs from project_px's)
    cvi, cui, cz, cin = carve_lib.project_centers_px(
        centers, k, r_c2w, t_c2w, height, width)

    q = vic.shape[0]
    cat_vi = jnp.concatenate([vic, cvi])
    cat_ui = jnp.concatenate([uic, cui])
    if gather_impl == "pallas":
        from gennbv_tpu.ops import pallas_gather
        z_at = pallas_gather.gather_image(
            zbuf.reshape(height, width), cat_vi, cat_ui)
    else:
        z_at = mxu.gather_image(
            zbuf.reshape(height, width), cat_vi, cat_ui, exact=False)
    visible = ok & (z <= z_at[:q] + eps_eff)
    d_px = z_at[q:]
    fg_px = d_px < depth_max * (1.0 - 1e-4)
    free = (cin & fg_px & (cz < d_px - carve_margin)).astype(jnp.float32)
    return zbuf, visible, free


# ---------------------------------------------------------------------------
# Row-banded batch path: per-band GEMMs (exact, B-fold FLOP cut)
# ---------------------------------------------------------------------------

# radix parameters of the fine pass — must match scatter_min_image's
# defaults (levels=10, spacing_bits=12) for bit-identity with the dense path
_FINE_LEVELS = 10
_FINE_SPACING = 12


def _slice_bands(arr: jnp.ndarray, starts: jnp.ndarray, cap: int) -> jnp.ndarray:
    """[B] contiguous length-`cap` slices from a 1-D array (padded so
    starts+cap never clamps).  Batched dynamic_slice lowers to a
    contiguous-block gather on TPU."""
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice(arr, (s,), (cap,)))(starts)


def _zbuf_vis_banded_one(vic, uic, z, ok, height: int, width: int,
                         depth_max: float, voxel_eps, footprint: int,
                         bands: int, cap: int, zminmax):
    """Row-banded z-buffer + visibility for ONE env — identical radix
    digits to zbuf_vis_px(zbuf_impl="mxu") while per-(pixel,digit) point
    counts stay comfortably below 2**spacing_bits (the same overflow
    caveat as encoded_min_image: near saturation the dense Q-length and
    banded cap-length f32 accumulation orders could decode a digit one
    apart).

    The dense mxu path's four GEMMs each contract every point against the
    FULL image height (2*Q*H*W FLOPs).  A point only ever touches its own
    pixel row (the footprint is applied afterwards by pooling the
    assembled image), so partitioning points by row band and running each
    band's GEMMs against its own H/B rows cuts the FLOPs to 2*(B*cap)*
    (H/B)*W = (cap/Q)-fraction of dense — with identical per-pixel point
    sets, hence identical radix sums (order-independent exact powers of
    two) and identical quantization (digits bucketed against the env-
    global z range passed in as `zminmax`).

    Caller guarantees no band holds more than `cap` valid points (the
    batch wrapper lax.cond's to the dense path otherwise).
    """
    q = vic.shape[0]
    rpb = height // bands
    zmin, zrange = zminmax
    big = jnp.asarray(depth_max, jnp.float32)

    # ---- sort by band (invalid -> sentinel band B), front-packing each
    # band's points into a contiguous segment; one 3-operand sort, the
    # same machinery as the compacted path (see splat_depth's note on why
    # sort beats cumsum+scatter partitioning on TPU)
    band = jnp.where(ok, vic // rpb, bands).astype(jnp.uint32)
    payload = ((vic.astype(jnp.uint32) << 23)
               | (uic.astype(jnp.uint32) << 14)
               | jnp.arange(q, dtype=jnp.uint32))
    _, pay_s, z_s = jax.lax.sort((band, payload, z), num_keys=1,
                                 is_stable=True)
    counts = jnp.sum(band[None, :] == jnp.arange(bands, dtype=jnp.uint32)[:, None],
                     axis=1).astype(jnp.int32)                      # [B]
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts)[:-1]])             # [B]

    # pad by cap so dynamic_slice never clamps (clamped starts would
    # silently misalign a band's slots)
    pad_u = jnp.zeros(cap, jnp.uint32)
    pay_p = jnp.concatenate([pay_s, pad_u])
    z_p = jnp.concatenate([z_s, jnp.full(cap, big)])

    pay_b = _slice_bands(pay_p, starts, cap)                        # [B, C]
    z_b = _slice_bands(z_p, starts, cap)
    ok_b = jnp.arange(cap, dtype=jnp.int32)[None, :] < counts[:, None]
    vic_b = (pay_b >> 23).astype(jnp.int32)
    uic_b = ((pay_b >> 14) & 0x1FF).astype(jnp.int32)
    # band-local rows; masked slots hold neighbor-band points whose local
    # row may be out of range — clip (their mask zeroes every use)
    vic_l = jnp.clip(vic_b - jnp.arange(bands, dtype=jnp.int32)[:, None] * rpb,
                     0, rpb - 1)

    # digits are a pure function of (z, global zminmax): recompute after
    # the sort instead of carrying two more sort operands
    d1, d2, _, _ = mxu.depth_digits(z_b, ok_b, _FINE_LEVELS,
                                    zminmax=(zmin, zrange))

    # ---- per-band fine radix-min over the band's own rows
    def fine_band(vic1, uic1, d11, d21, ok1):
        okf = ok1.astype(jnp.float32)
        m1, have1 = mxu.encoded_min_image(vic1, uic1, d11, okf, rpb, width,
                                          _FINE_SPACING, _FINE_LEVELS)
        m1_at = mxu.gather_image_int8(m1, vic1, uic1)
        in_min = okf * (jnp.abs(d11 - m1_at) < 0.5)
        m2, have2 = mxu.encoded_min_image(vic1, uic1, d21, in_min, rpb, width,
                                          _FINE_SPACING, _FINE_LEVELS)
        sub = jnp.where(have2, m2 + 0.5, 0.5 * _FINE_LEVELS)
        frac = (m1 + sub / _FINE_LEVELS) / _FINE_LEVELS
        zq = zmin + frac * zrange
        return jnp.where(have1, zq, big)                            # [rpb, W]

    zbuf0 = jax.vmap(fine_band)(vic_l, uic_b, d1, d2, ok_b
                                ).reshape(height, width)

    # ---- footprint pool on the ASSEMBLED image (crosses band edges, same
    # as dense); separable min (see zbuf_vis_px)
    if footprint > 0:
        k2 = 2 * footprint + 1
        z2d = jax.lax.reduce_window(zbuf0, big, jax.lax.min, (k2, 1), (1, 1), "SAME")
        z2d = jax.lax.reduce_window(z2d, big, jax.lax.min, (1, k2), (1, 1), "SAME")
    else:
        z2d = zbuf0

    # ---- band-local visibility gather from the pooled image's band rows
    veps = voxel_eps + zrange / (_FINE_LEVELS * _FINE_LEVELS)
    zb_rows = z2d.reshape(bands, rpb, width)

    def vis_band(zimg, vic1, uic1, z1, ok1):
        z_at = mxu.gather_image(zimg, vic1, uic1, exact=False)
        return ok1 & (z1 <= z_at + veps)

    vis_b = jax.vmap(vis_band)(zb_rows, vic_l, uic_b, z_b, ok_b)    # [B, C]

    # ---- scatter back to original point order: ordered per-band window
    # writes into the packed layout (band b+1's window starts inside band
    # b's masked tail, so ascending writes leave every packed slot holding
    # its own band's value), then one 2-operand sort inverts the pack
    vis_packed = jnp.zeros(q + cap, jnp.int32)
    for b in range(bands):      # static trip count
        vis_packed = jax.lax.dynamic_update_slice(
            vis_packed, vis_b[b].astype(jnp.int32), (starts[b],))
    idx_all = (pay_s & 0x3FFF).astype(jnp.int32)
    _, vis_sorted = jax.lax.sort((idx_all, vis_packed[:q]), num_keys=1)
    visible = vis_sorted > 0

    return z2d.reshape(-1), visible


# ---------------------------------------------------------------------------
# Compacted batch path: coarse-cull + survivor compaction (exact)
# ---------------------------------------------------------------------------

# Coarse radix parameters.  spacing 14 makes BOTH coarse passes exact for
# any per-(cell, bucket) point count < 2^14 = 16384 — i.e. unconditionally
# for surf capacities Q < 16384 — so the cull bound is a TRUE upper bound
# of the cell minimum (the fine pass's 12-bit spacing can only degrade its
# min LOW, which is conservative for visibility but would be UNSAFE for a
# cull bound).  9 * 10 = 90 combined buckets; f32 exponent budget
# 14 * 9 = 126 stays inside normals.
_COARSE_L1 = 9
_COARSE_L2 = 10
_COARSE_SPACING = 14
_COARSE_CELL = 2          # cell size in pixels


def splat_depth_batch(
    surf_pts: jnp.ndarray,    # [N, Q, 3] surface voxel centers (world)
    surf_mask: jnp.ndarray,   # [N, Q] bool (padding)
    k: jnp.ndarray,           # [3, 3] intrinsics (shared)
    r_c2w: jnp.ndarray,       # [N, 3, 3]
    t_c2w: jnp.ndarray,       # [N, 3]
    height: int,
    width: int,
    depth_max: float,
    voxel_eps: jnp.ndarray,   # [N] visibility slack per env
    footprint: int = 1,
    zbuf_impl: str = "mxu",
    compact_cap: int | None = None,
    skip_env: jnp.ndarray | None = None,   # [N] bool: envs whose outputs
                                           # the caller will substitute (the
                                           # forced-init render cache) — all
                                           # their points are masked out, so
                                           # adaptive paths skip their work
    band_split: int | None = None,         # row bands B for the banded path
    band_cap: int | None = None,           # per-band point cap C
    gather_impl: str = "mxu",              # per-point image gathers (see
                                           # splat_depth); threaded into the
                                           # dense fallback and the compact
                                           # fine pass — the banded kernel's
                                           # band-local gathers stay mxu
                                           # (its per-band GEMMs are the
                                           # point of that path)
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched splat over N envs: (zbuf [N, H*W], fg [N, H*W], vis [N, Q]).

    With ``compact_cap=None`` this is vmap(splat_depth).  With a cap C it
    runs the FLOP-cut fast path — output bit-identical to the dense path:

    1. **coarse cull**: an exact radix-min z-image over 2x2-pixel cells
       (two overflow-free passes, see _COARSE_SPACING) gives each cell an
       upper bound of its min depth; a point strictly beyond the 3x3-cell
       max-pooled bound + slack can neither survive its own visibility
       test (its pixel's pooled z-buffer is <= its cell neighborhood's
       min) nor change any pooled z-buffer value (the winning point stays).
    2. **compaction**: survivors are front-packed per env by one 3-operand
       lax.sort and truncated to C — the 4 fine-pass GEMMs then contract
       over C instead of Q.
    3. **exact fine pass** on the survivors, quantized against the
       ORIGINAL valid set's z range (zminmax) so values match the dense
       path bit-for-bit; visibility is scattered back through the sort
       permutation by a one-hot matmul.

    If ANY env has more than C survivors the whole batch falls back to the
    dense path inside one lax.cond (correctness never depends on the cap).
    Requires Q < 16384 and height/width <= 512 (packing/overflow bounds) —
    violations fall back to dense statically.
    """
    n, q = surf_mask.shape
    if skip_env is not None:
        surf_mask = surf_mask & ~skip_env[:, None]
    use_banded = (band_split is not None and zbuf_impl == "mxu"
                  and q < (1 << 14) and max(height, width) <= 512
                  and height % band_split == 0
                  and band_cap is not None and band_cap < q)
    use_compact = (not use_banded
                   and compact_cap is not None and zbuf_impl == "mxu"
                   and q < (1 << 14) and max(height, width) <= 512
                   and compact_cap < q)

    if use_banded:
        vic, uic, z, ok = jax.vmap(
            lambda sp, sm, r, t: project_px(sp, sm, k, r, t, height, width)
        )(surf_pts, surf_mask, r_c2w, t_c2w)
        # env-global z range of the ORIGINAL valid set — same derivation as
        # scatter_min_image's internal one, so quantization is bit-identical
        zmin = jnp.min(jnp.where(ok, z, jnp.inf), axis=1)
        zmax = jnp.max(jnp.where(ok, z, -jnp.inf), axis=1)
        zrange = jnp.maximum(zmax - zmin, 1e-3)

        # overflow predicate from band counts alone — the sort and the
        # fine pass run only inside the fast branch
        rpb = height // band_split
        band = jnp.where(ok, vic // rpb, band_split)
        counts = jnp.sum(
            band[:, None, :] == jnp.arange(band_split, dtype=jnp.int32)[None, :, None],
            axis=2)                                                  # [N, B]
        overflow = jnp.any(counts > band_cap)

        def banded_all(_):
            return jax.vmap(
                lambda v, u, zz, o, zm, zr, ve: _zbuf_vis_banded_one(
                    v, u, zz, o, height, width, depth_max, ve, footprint,
                    band_split, band_cap, (zm, zr))
            )(vic, uic, z, ok, zmin, zrange, voxel_eps)

        def dense_all(_):
            def one(vic1, uic1, z1, ok1, zm, zr, ve):
                return zbuf_vis_px(vic1, uic1, z1, ok1, height, width,
                                   depth_max, ve, footprint, "mxu",
                                   zminmax=(zm, zr), gather_impl=gather_impl)
            return jax.vmap(one)(vic, uic, z, ok, zmin, zrange, voxel_eps)

        zbuf, vis = jax.lax.cond(overflow, dense_all, banded_all, ())
        return zbuf, zbuf < depth_max - 1e-6, vis

    if not use_compact:
        return jax.vmap(
            lambda sp, sm, r, t, ve: splat_depth(
                sp, sm, k, r, t, height, width, depth_max, ve,
                footprint, zbuf_impl, gather_impl=gather_impl)
        )(surf_pts, surf_mask, r_c2w, t_c2w, voxel_eps)

    # shared projection
    vic, uic, z, ok = jax.vmap(
        lambda sp, sm, r, t: project_px(sp, sm, k, r, t, height, width)
    )(surf_pts, surf_mask, r_c2w, t_c2w)

    # per-env z range of the ORIGINAL valid set (min/max are rounding-free,
    # so this matches scatter_min_image's internal derivation exactly)
    zmin = jnp.min(jnp.where(ok, z, jnp.inf), axis=1)
    zmax = jnp.max(jnp.where(ok, z, -jnp.inf), axis=1)
    zrange = jnp.maximum(zmax - zmin, 1e-3)

    def dense(vic, uic, z, ok, zmin, zrange):
        def one(vic1, uic1, z1, ok1, zm, zr, ve):
            return zbuf_vis_px(vic1, uic1, z1, ok1, height, width,
                               depth_max, ve, footprint, "mxu",
                               zminmax=(zm, zr), gather_impl=gather_impl)
        return jax.vmap(one)(vic, uic, z, ok, zmin, zrange, voxel_eps)

    cap = int(compact_cap)
    ch = -(-height // _COARSE_CELL)
    cw = -(-width // _COARSE_CELL)
    cl = _COARSE_L1 * _COARSE_L2

    # ---- 1. coarse cull bound --------------------------------------------
    # combined coarse digit tc in [0, 90) against the same (zmin, zrange)
    tc = jnp.clip((z - zmin[:, None]) / zrange[:, None] * cl, 0.0, cl - 1e-3)
    dc1 = jnp.floor(tc / _COARSE_L2)
    dc2 = jnp.floor(tc - dc1 * _COARSE_L2)
    cv = vic // _COARSE_CELL
    cu = uic // _COARSE_CELL

    def coarse_one(cv1, cu1, dc11, dc21, ok1):
        okf = ok1.astype(jnp.float32)
        m1, have = mxu.encoded_min_image(cv1, cu1, dc11, okf, ch, cw,
                                         _COARSE_SPACING, _COARSE_L1)
        m1_at = mxu.gather_image_int8(m1, cv1, cu1)
        in_min = okf * (jnp.abs(dc11 - m1_at) < 0.5)
        m2, _ = mxu.encoded_min_image(cv1, cu1, dc21, in_min, ch, cw,
                                      _COARSE_SPACING, _COARSE_L2)
        # combined cell-min digit; empty cells get a huge digit (never the
        # binding constraint after max-pool unless ALL 3x3 cells are empty,
        # in which case no point maps there anyway)
        d = jnp.where(have, m1 * _COARSE_L2 + m2, jnp.float32(4 * cl))
        # 3x3 cell max-pool: a point's footprint touches pixels whose own
        # cells lie within the 3x3 cell neighborhood
        d = jax.lax.reduce_window(d, -jnp.inf, jax.lax.max,
                                  (3, 3), (1, 1), "SAME")
        return mxu.gather_image(d, cv1, cu1, exact=False)

    bound_d = jax.vmap(coarse_one)(cv, cu, dc1, dc2, ok)     # [N, Q]

    # keep iff t_p <= bound_digit + 2 + eps_digits: +1 for the bound
    # bucket's own width, +1 absorbing every f32 rounding concern (one
    # digit = ~1.1% of the z range >> ulp); eps covers the visibility
    # slack incl. the fine pass's quantization step (zrange/100)
    eps_total = voxel_eps + zrange / 100.0
    eps_digits = eps_total / (zrange / cl)
    keep = ok & (tc <= bound_d + 2.0 + eps_digits[:, None])

    counts = jnp.sum(keep, axis=1)
    overflow = jnp.any(counts > cap)

    # ---- 2. compaction (front-pack survivors, one sort) -------------------
    def compact_one(keep1, vic1, uic1, z1):
        key = (~keep1).astype(jnp.uint32)
        payload = ((vic1.astype(jnp.uint32) << 23)
                   | (uic1.astype(jnp.uint32) << 14)
                   | jnp.arange(q, dtype=jnp.uint32))
        _, pay_s, z_s = jax.lax.sort((key, payload, z1), num_keys=1,
                                     is_stable=True)
        pay_c = pay_s[:cap]
        return ((pay_c >> 23).astype(jnp.int32),
                ((pay_c >> 14) & 0x1FF).astype(jnp.int32),
                (pay_c & 0x3FFF).astype(jnp.int32),
                z_s[:cap])

    vic_c, uic_c, idx_c, z_c = jax.vmap(compact_one)(keep, vic, uic, z)
    ok_c = jnp.arange(cap)[None, :] < counts[:, None]

    # ---- 3. exact fine pass on survivors + scatter-back -------------------
    def fast(operands):
        vic_c, uic_c, idx_c, z_c, ok_c, zmin, zrange = operands

        def fine_one(vic1, uic1, z1, ok1, zm, zr, ve):
            return zbuf_vis_px(vic1, uic1, z1, ok1, height, width,
                               depth_max, ve, footprint, "mxu",
                               zminmax=(zm, zr), gather_impl=gather_impl)

        zbuf, vis_c = jax.vmap(fine_one)(vic_c, uic_c, z_c, ok_c,
                                         zmin, zrange, voxel_eps)

        def scatter_back(idx1, vis1, ok1):
            a = (vis1 & ok1)[None, :].astype(jnp.bfloat16)       # [1, C]
            c = (idx1[:, None] == jnp.arange(q, dtype=jnp.int32)[None, :]
                 ).astype(jnp.bfloat16)                          # [C, Q]
            return jnp.dot(a, c, preferred_element_type=jnp.float32)[0] > 0.5

        vis = jax.vmap(scatter_back)(idx_c, vis_c, ok_c)
        return zbuf, vis

    def slow(operands):
        del operands
        return dense(vic, uic, z, ok, zmin, zrange)

    zbuf, vis = jax.lax.cond(
        overflow, slow, fast,
        (vic_c, uic_c, idx_c, z_c, ok_c, zmin, zrange))
    return zbuf, zbuf < depth_max - 1e-6, vis

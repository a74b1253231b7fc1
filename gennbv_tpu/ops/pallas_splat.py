"""Fused Pallas TPU kernel for the splat z-buffer + visibility pass.

The mxu.py formulation (radix-min via exponent-encoded one-hot matmuls,
ops/mxu.py) is dense: its GEMMs contract over the full surf capacity Q
regardless of how many points are actually valid (in front + in frame) —
at the training pose distribution that is ~10%.  This kernel processes
points in groups and skips groups with no valid points (`pl.when`), so
its matmul count scales with the VALID count; splat.py front-packs valid
points first (one 3-operand lax.sort) to make the skippable tail
contiguous.

Mosaic layout discipline (learned from first-light): per-point data NEVER
changes layout between lanes and sublanes (`tpu.reshape (1x2x128) ->
(256x1)` is an unsupported cast, and so is lane-concatenating sublane
slices).  Points therefore live as [1, CHUNK] LANE rows where CHUNK is
512 — the per-point refs are reshaped to (Q/512, 512) OUTSIDE the
kernel, so one row load IS the whole group and every tensor in the
kernel keeps a [*, 512]-lane layout end to end.  Each radix pass issues
one [dim, 512]-contraction dot_general per 512 points; the original
128-lane version ran the MXU at ~5% utilization on [400, 128]-shaped
products issued serially.

Numerics are kept IDENTICAL to the mxu path: same digit/decode formulas,
same bf16 one-hot products with f32 accumulation, same bf16 single-plane
z-buffer gather for the slack comparison, so ops/splat.py can switch
implementations without re-deriving goldens (summation order differs only
within the f32 accumulator, which the ceil-decode absorbs by design).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gennbv_tpu.ops.mxu import exact_exp2_neg, exact_min_digit

CHUNK = 512            # points per lane row (one GEMM per row)
LEVELS = 10            # radix digits per pass (10 -> 100 depth levels)
SPACING = 12           # bits between digit weights: counts < 2^12 exact


def _shift_fill(x: jnp.ndarray, shift: int, axis: int, fill) -> jnp.ndarray:
    """x shifted by `shift` along `axis`, vacated slots set to `fill`.
    result[i] = x[i - shift].  Static concat+slice (portable between
    Mosaic and interpret mode, unlike pltpu.roll)."""
    if shift == 0:
        return x
    pad_shape = list(x.shape)
    pad_shape[axis] = abs(shift)
    pad = jnp.full(pad_shape, fill, x.dtype)
    n = x.shape[axis]
    if shift > 0:
        kept = jax.lax.slice_in_dim(x, 0, n - shift, axis=axis)
        return jax.lax.concatenate([pad, kept], axis)
    kept = jax.lax.slice_in_dim(x, -shift, n, axis=axis)
    return jax.lax.concatenate([kept, pad], axis)


def _minpool_same(z: jnp.ndarray, footprint: int, big) -> jnp.ndarray:
    """Separable (2f+1)^2 min-pool with SAME edges (init = big), matching
    ops/splat.py's two 1-D reduce_windows."""
    for axis in (0, 1):
        acc = z
        for s in range(1, footprint + 1):
            acc = jnp.minimum(acc, _shift_fill(z, s, axis, big))
            acc = jnp.minimum(acc, _shift_fill(z, -s, axis, big))
        z = acc
    return z


def _decode_digit(m: jnp.ndarray) -> jnp.ndarray:
    """Min digit from the exponent-encoded sum, bit-exact (ops/mxu.py::
    exact_min_digit); LEVELS where the pixel saw no point (m == 0)."""
    return exact_min_digit(m, SPACING, LEVELS)


def _splat_kernel(vi_ref, ui_ref, z_ref, ok_ref, scal_ref,
                  zbuf_ref, vis_ref, m1_ref, m2_ref,
                  *, height: int, width: int,
                  footprint: int, groups: int):
    f32 = jnp.float32
    depth_max = scal_ref[0, 1]
    # dynamic trip count: valid points are front-packed by the caller, so
    # only the first ceil(nvalid / CHUNK) rows carry work — the loops run
    # exactly those (the fixed per-iteration row loads + digit math over
    # all-invalid groups dominated the kernel at ~10% valid)
    nvalid = scal_ref[0, 2]
    gdyn = jnp.clip(((nvalid + (CHUNK - 1)) // CHUNK).astype(jnp.int32),
                    0, groups)
    # sublane iotas: row h of iota_v is h; row w of iota_u is w
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (height, CHUNK), 0)
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (width, CHUNK), 0)

    ok_all = ok_ref[...]
    z_all = z_ref[...]
    # per-env depth range (ops/mxu.py)
    zmin = jnp.min(jnp.where(ok_all > 0, z_all, jnp.inf))
    zmax = jnp.max(jnp.where(ok_all > 0, z_all, -jnp.inf))
    zrange = jnp.maximum(zmax - zmin, 1e-3)

    def group_rows(gi):
        """Per-point data for group gi as [1, CHUNK] lane rows."""
        sl = pl.ds(gi, 1)
        vv = vi_ref[sl, :]
        uu = ui_ref[sl, :]
        zc = z_ref[sl, :].astype(f32)
        okc = ok_ref[sl, :].astype(f32)
        t = jnp.clip((zc - zmin) / zrange * LEVELS, 0.0, LEVELS - 1e-3)
        d1 = jnp.floor(t)
        d2 = jnp.floor((t - d1) * LEVELS)
        return vv, uu, zc, okc, d1, d2

    def onehot(idx_row, iota, w_row):
        # [dim, CHUNK] bf16: w at the point's pixel row, 0 elsewhere.
        # Built in VMEM from the [1, CHUNK] index row — never touches HBM.
        return jnp.where(idx_row == iota, w_row, 0.0).astype(jnp.bfloat16)

    def accum(a, c):
        # m[h, w] += sum_p a[h, p] * c[w, p]: contract the lane dim of
        # both one-hot tiles (a . c^T on the MXU)
        return jax.lax.dot_general(
            a, c, (((1,), (1,)), ((), ())), preferred_element_type=f32)

    def gather_row(img_bf16, a, uu, okc):
        """img[vi_p, ui_p] per point as a [1, CHUNK] f32 row:
        G = img . C_u ([H, W] x [W, CHUNK]), then an elementwise mask by a
        and a sublane reduction back to [1, CHUNK]."""
        cu = onehot(uu, iota_u, jnp.float32(1.0))
        g = jax.lax.dot_general(
            img_bf16, cu, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                  # [H, CHUNK]
        return jnp.sum(a.astype(f32) * g, axis=0, keepdims=True)

    # ---- pass A: encoded min of the coarse digit ----------------------
    m1_ref[...] = jnp.zeros((height, width), f32)

    def pass_a(gi, _):
        vv, uu, _, okc, d1, _ = group_rows(gi)

        @pl.when(jnp.sum(okc) > 0)
        def _():
            a = onehot(vv, iota_v, jnp.float32(1.0))
            c = onehot(uu, iota_u, exact_exp2_neg(d1, SPACING) * okc)
            m1_ref[...] += accum(a, c)
        return 0

    jax.lax.fori_loop(0, gdyn, pass_a, 0, unroll=False)
    m1d = _decode_digit(m1_ref[...])
    m1_ref[...] = m1d                       # reuse the plane for the digits

    # ---- pass B: encoded min of the fine digit among min-bucket points
    m2_ref[...] = jnp.zeros((height, width), f32)
    m1d_bf16 = m1d.astype(jnp.bfloat16)     # digits <= 10: exact in bf16

    def pass_b(gi, _):
        vv, uu, _, okc, d1, d2 = group_rows(gi)

        @pl.when(jnp.sum(okc) > 0)
        def _():
            a = onehot(vv, iota_v, jnp.float32(1.0))
            m1q = gather_row(m1d_bf16, a, uu, okc)
            in_min = okc * (jnp.abs(d1 - m1q) < 0.5).astype(f32)
            c = onehot(uu, iota_u, exact_exp2_neg(d2, SPACING) * in_min)
            m2_ref[...] += accum(a, c)
        return 0

    jax.lax.fori_loop(0, gdyn, pass_b, 0, unroll=False)

    # ---- decode + footprint pool --------------------------------------
    m1d = m1_ref[...]
    m2d = _decode_digit(m2_ref[...])
    # overflow fallback: no in-bucket point -> the bucket midpoint
    sub = jnp.where(m2d < LEVELS, m2d + 0.5, 0.5 * LEVELS)
    frac = (m1d + sub / LEVELS) / LEVELS
    zq = zmin + frac * zrange
    zbuf0 = jnp.where(m1d < LEVELS, zq, depth_max)
    zbuf = _minpool_same(zbuf0, footprint, depth_max) \
        if footprint > 0 else zbuf0
    zbuf_ref[...] = zbuf

    # ---- pass C: per-point visibility against the pooled z-buffer -----
    zb16 = zbuf.astype(jnp.bfloat16)
    eps_total = scal_ref[0, 0] + zrange / (LEVELS * LEVELS)
    vis_ref[...] = jnp.zeros((groups, CHUNK), f32)   # rows beyond gdyn

    def pass_c(gi, _):
        vv, uu, zc, okc, _, _ = group_rows(gi)
        sl = pl.ds(gi, 1)

        @pl.when(jnp.sum(okc) > 0)
        def _():
            a = onehot(vv, iota_v, jnp.float32(1.0))
            zpx = gather_row(zb16, a, uu, okc)
            vis_ref[sl, :] = okc * (zc <= zpx + eps_total).astype(f32)
        return 0

    jax.lax.fori_loop(0, gdyn, pass_c, 0, unroll=False)


def zbuf_visible(
    vi: jnp.ndarray,        # [Q] int32 clipped pixel rows
    ui: jnp.ndarray,        # [Q] int32 clipped pixel cols
    z: jnp.ndarray,         # [Q] f32 camera-space depth
    ok: jnp.ndarray,        # [Q] bool: in-front & in-image & not padding
    voxel_eps: jnp.ndarray, # scalar f32 visibility slack (pre-quantization)
    height: int, width: int, depth_max=50.0, footprint: int = 1,
    interpret: bool | None = None,
    nvalid: jnp.ndarray | None = None,  # count of FRONT-PACKED valid points
                                        # (None: scan all rows)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused z-buffer + visibility for one env.  Returns
    (zbuf [H, W] f32, visible [Q] bool).  vmap-compatible (the batch axis
    becomes a pallas grid dimension).  Pass `nvalid` when valid points are
    packed to the front: the kernel's loops then run only the occupied
    rows."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    q = vi.shape[0]
    qp = -(-q // CHUNK) * CHUNK
    pad = qp - q
    if pad:
        vi = jnp.pad(vi, (0, pad))
        ui = jnp.pad(ui, (0, pad))
        z = jnp.pad(z, (0, pad), constant_values=1.0)
        ok = jnp.pad(ok, (0, pad))
    qr = qp // CHUNK
    kernel = functools.partial(
        _splat_kernel, height=height, width=width, footprint=footprint,
        groups=qr)
    if nvalid is None:
        nvalid = jnp.asarray(qp, jnp.float32)
    scal = jnp.stack([jnp.asarray(voxel_eps, jnp.float32).reshape(()),
                      jnp.asarray(depth_max, jnp.float32).reshape(()),
                      jnp.asarray(nvalid, jnp.float32).reshape(())]
                     ).reshape(1, 3)
    zbuf, vis = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((height, width), jnp.float32),
                   jax.ShapeDtypeStruct((qr, CHUNK), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((height, width), jnp.float32),
                        pltpu.VMEM((height, width), jnp.float32)],
        interpret=interpret,
    )(vi.reshape(qr, CHUNK), ui.reshape(qr, CHUNK),
      z.reshape(qr, CHUNK), ok.astype(jnp.float32).reshape(qr, CHUNK),
      scal)
    return zbuf, vis.reshape(-1)[:q] > 0.5

"""MXU reformulations of the env-step's gather/scatter hot ops.

XLA lowers random gathers/scatters on TPU to latency-bound loops
(~10-20 ns/element); at 256 envs x ~10k elements these dominated the env
step (tools/bench_scatter.py: image gather 30.7 ms, G^3 scatter-max
20.5 ms).  Both are expressible as *separable one-hot matmuls* that ride
the MXU instead:

- gather img[vi, ui] per point:   (onehot_v @ img) . onehot_u
  one [P, H] x [H, W] matmul + a masked row-sum (4-6x faster, exact via a
  hi/lo bf16 split of the f32 image).
- scatter-max of {0,1} into G^3:  onehot_x @ (onehot_{yz} * valid) > 0
  one [G, P] x [P, G^2] matmul (8x faster, exact: counts accumulate in f32).

The one-hots are built on the fly as comparison broadcasts (bf16), so the
transient footprint per env is a few MB; callers vmap and XLA batches the
GEMMs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _split_bf16(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f32 -> (hi, lo) bf16 pair with hi + lo ~= x to ~1e-5 relative."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def exact_exp2_neg(d: jnp.ndarray, s: int) -> jnp.ndarray:
    """2^(-s*d) for integer-valued d in [0, ~10]: BIT-EXACT power of two,
    assembled directly in the f32 exponent field.  jnp.exp2 is a VPU
    polynomial on TPU (and in Mosaic kernels) whose result can be one ulp
    off an exact power of two — which shifts the radix-min encoding by a
    whole bucket at decode boundaries (observed: 5.7% of 400^2 z-buffer
    pixels one coarse level off between backends)."""
    e = (127 - s * d.astype(jnp.int32)) << 23
    return jax.lax.bitcast_convert_type(e, jnp.float32)


def exact_min_digit(m: jnp.ndarray, s: int, levels: int) -> jnp.ndarray:
    """ceil(-log2(m)/s) for m a sum of exact powers 2^(-s*k): reads the
    f32 exponent field instead of a transcendental log2.  Returns `levels`
    where m == 0 (pixel saw no point)."""
    bits = jax.lax.bitcast_convert_type(m, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127          # floor(log2 m) for normal m
    digit = jnp.clip((-e + (s - 1)) // s, 0, levels - 1)
    return jnp.where(m > 0.0, digit.astype(jnp.float32),
                     jnp.float32(levels))


def gather_image(img: jnp.ndarray, vi: jnp.ndarray, ui: jnp.ndarray,
                 exact: bool = True) -> jnp.ndarray:
    """img[vi, ui] for one image — [H, W] f32, vi/ui [P] int32 (in range).

    MXU path: tmp = onehot_v @ img  ([P, W]), result = sum(tmp * onehot_u).
    `exact=True` splits the image into two bf16 planes (absolute error
    ~1e-3 of the value scale instead of bf16's ~0.4%).

    On the exact=False path tmp is stored bf16: each tmp row is ONE
    nonzero product (1.0 * bf16 image value, f32-accumulated then rounded
    back to the same bf16 value), so the bf16 store is bit-identical to
    the f32 one — and the [P, W] intermediate is the gather's dominant
    HBM round-trip (written by the dot, re-read by the masked row-sum).
    """
    h, w = img.shape
    p = vi.shape[0]
    ohv = (vi[:, None] == jnp.arange(h, dtype=jnp.int32)[None, :]).astype(
        jnp.bfloat16)
    if exact:
        hi, lo = _split_bf16(img)
        tmp = (jnp.dot(ohv, hi, preferred_element_type=jnp.float32)
               + jnp.dot(ohv, lo, preferred_element_type=jnp.float32))
    else:
        tmp = jnp.dot(ohv, img.astype(jnp.bfloat16),
                      preferred_element_type=jnp.bfloat16)
    ohu = ui[:, None] == jnp.arange(w, dtype=jnp.int32)[None, :]
    return jnp.where(ohu, tmp, 0.0).sum(-1).astype(jnp.float32)


def encoded_min_image(vi: jnp.ndarray, ui: jnp.ndarray, d_digit: jnp.ndarray,
                      mask: jnp.ndarray, height: int, width: int,
                      spacing_bits: int, levels: int):
    """One radix pass: per-pixel min of the integer digit `d_digit` over
    the points with mask != 0, as a single MXU matmul.

    w is 0 or an exact power of two (2^-s*digit, s*digit <= ~120, inside
    bf16's exponent range), so single-plane bf16 is EXACT — a hi/lo
    split's lo plane would be identically zero.  Encode and decode via
    exponent-field bit ops (exact_exp2_neg / exact_min_digit):
    transcendental exp2/log2 are backend-dependent at exactly-power-of-two
    inputs.  The weighted one-hot is built directly (fold of *w into the
    compare) — one fused producer per GEMM, never materialized to HBM.

    Returns (digit image [height, width] f32 in [0, levels-1] — `levels`
    where no masked point — and the `have` boolean image).  Exact while
    per-(pixel, digit) counts < 2^spacing_bits; beyond that the digit
    degrades one LOW.
    """
    iv = jnp.arange(height, dtype=jnp.int32)
    iu = jnp.arange(width, dtype=jnp.int32)
    w = exact_exp2_neg(d_digit, spacing_bits) * mask             # [Q] f32
    a = jnp.where(vi[:, None] == iv[None, :], w[:, None],
                  0.0).astype(jnp.bfloat16)                      # [Q, V]
    c = (ui[:, None] == iu[None, :]).astype(jnp.bfloat16)        # [Q, U]
    m = jax.lax.dot_general(a, c, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [V, U]
    have = m > 0.0
    digit = exact_min_digit(m, spacing_bits, levels)
    return jnp.where(have, jnp.clip(digit, 0, levels - 1),
                     jnp.float32(levels)), have


def depth_digits(z: jnp.ndarray, valid: jnp.ndarray, levels: int,
                 zminmax: tuple | None = None):
    """Two-digit radix bucketing of depths over the per-call z range.
    Returns (d1, d2, zmin, zrange).  Pass `zminmax` to bucket against an
    externally fixed range (the compacted splat path must quantize
    survivors on the ORIGINAL valid set's range to stay bit-identical)."""
    if zminmax is None:
        zmin = jnp.min(jnp.where(valid, z, jnp.inf))
        zmax = jnp.max(jnp.where(valid, z, -jnp.inf))
        zrange = jnp.maximum(zmax - zmin, 1e-3)
    else:
        zmin, zrange = zminmax
    t = jnp.clip((z - zmin) / zrange * levels, 0.0, levels - 1e-3)
    d1 = jnp.floor(t)
    d2 = jnp.floor((t - d1) * levels)
    return d1, d2, zmin, zrange


def gather_image_int8(img_int: jnp.ndarray, vi: jnp.ndarray,
                      ui: jnp.ndarray) -> jnp.ndarray:
    """img[vi, ui] for a SMALL-INTEGER image (values in [0, 255]) via
    one-hot matmuls — exact.  Returns f32 (the radix digit comparisons are
    float).

    The GEMM runs bf16 with a bf16 [Q, W] intermediate: small integers are
    bf16-exact, each tmp row is one nonzero product, and halving the
    intermediate's dtype halves the gather's dominant HBM round-trip
    (round 3; previously int8 operands with an int32 intermediate — the
    int8 MXU rate never mattered here, the [Q, W] traffic did)."""
    h, w = img_int.shape
    ohv = (vi[:, None] == jnp.arange(h, dtype=jnp.int32)[None, :]).astype(
        jnp.bfloat16)
    tmp = jax.lax.dot_general(ohv, img_int.astype(jnp.bfloat16),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.bfloat16)  # [Q, W]
    ohu = ui[:, None] == jnp.arange(w, dtype=jnp.int32)[None, :]
    return jnp.where(ohu, tmp, 0).sum(-1).astype(jnp.float32)


def scatter_min_image(vi: jnp.ndarray, ui: jnp.ndarray, z: jnp.ndarray,
                      valid: jnp.ndarray, height: int, width: int,
                      z_default: float, levels: int = 10,
                      spacing_bits: int = 12,
                      zminmax: tuple | None = None,
                      gather_impl: str = "mxu") -> jnp.ndarray:
    """Per-pixel min of z over points — WITHOUT a scatter.

    XLA's scatter-min lowering costs ~30 ms at 256 envs x 11k points
    (tools/bench_scatter.py); this computes the same z-buffer (quantized to
    ``levels**2`` depth bins of the per-call z range) with three MXU
    matmuls via an exponent encoding of min:

        M[v,u] = sum_q onehot_v onehot_u 2^(-s * bucket_q)
        min bucket = ceil(-log2(M) / s)        (exact while per-(pixel,
                                                bucket) counts < 2^s)

    applied twice (coarse bucket, then sub-bucket among points in the
    pixel's min coarse bucket, selected via a gather-matmul) — a radix-
    `levels` min in two digits.  Overflow beyond 2^spacing_bits points per
    (pixel, bucket) degrades gracefully to one bucket too low (more
    conservative visibility).

    One-hot operands are REBUILT INLINE at every consumer rather than built
    once and shared: XLA fuses the broadcast-compare into each dot's operand
    stream, so the [Q, V]/[Q, U] bf16 planes never hit HBM.  Sharing them
    (the former ``pixel_onehots``) materialized ~4.6 GB per 256-env step at
    400^2 and re-streamed it per GEMM — serial-chained timing showed the
    splat bandwidth-bound at 13x the inline form's cost, while the rebuilt
    compares are VPU-cheap next to the MXU GEMMs they feed
    (tools/bench_splat_forms.py; values are bit-identical, the radix sums
    being order-independent exact powers of two).

    Returns (zbuf [height*width] f32 with `z_default` where no valid point,
    quantization step scalar).
    """
    s = spacing_bits
    d_levels = levels
    d1, d2, zmin, zrange = depth_digits(z, valid, d_levels, zminmax)
    vf = valid.astype(jnp.float32)

    def encoded_min(d_digit, mask):
        return encoded_min_image(vi, ui, d_digit, mask, height, width,
                                 s, d_levels)

    m1, have1 = encoded_min(d1, vf)

    # per-point gather of the pixel's min coarse bucket (bucket ids are
    # small integers, exact in bf16 either way)
    if gather_impl == "pallas":
        from gennbv_tpu.ops import pallas_gather
        m1_at_q = pallas_gather.gather_image(m1, vi, ui)         # [Q]
    else:
        m1_at_q = gather_image_int8(m1, vi, ui)                  # [Q]
    in_min_bucket = vf * (jnp.abs(d1 - m1_at_q) < 0.5)

    m2, have2 = encoded_min(d2, in_min_bucket)
    # overflow fallback: no in-bucket point found -> use the bucket midpoint
    sub = jnp.where(have2, m2 + 0.5, 0.5 * d_levels)

    frac = (m1 + sub / d_levels) / d_levels
    zq = zmin + frac * zrange
    zbuf = jnp.where(have1, zq, jnp.float32(z_default)).reshape(-1)
    # quantization step, for callers widening comparison slacks
    return zbuf, zrange / (d_levels * d_levels)


def scatter_cells_any(cell_idx: jnp.ndarray, valid: jnp.ndarray,
                      grid_size: int) -> jnp.ndarray:
    """{0,1}^[G,G,G]: cells containing at least one valid point.

    cell_idx [P, 3] int32 in [0, G); valid [P] bool.  Replaces
    ``zeros.at[flat].max(valid)`` with one [G, P] x [P, G^2] matmul.
    """
    g = grid_size
    yz = cell_idx[:, 1] * g + cell_idx[:, 2]
    ohx = (cell_idx[:, 0][None, :] == jnp.arange(g, dtype=jnp.int32)[:, None])
    ohx = (ohx & valid[None, :]).astype(jnp.bfloat16)
    ohyz = (yz[:, None] == jnp.arange(g * g, dtype=jnp.int32)[None, :]).astype(
        jnp.bfloat16)
    counts = jnp.dot(ohx, ohyz, preferred_element_type=jnp.float32)
    return (counts > 0.5).astype(jnp.float32).reshape(g, g, g)

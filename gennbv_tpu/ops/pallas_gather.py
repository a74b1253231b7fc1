"""Pallas TPU kernel: batched image gather with a VMEM-resident image.

`mxu.gather_image(exact=False)` computes img[vi, ui] per point as
tmp = onehot_v @ img ([P, W]) followed by a masked row-sum.  XLA
materializes the [P, W] intermediate in HBM (round-3 cost analysis:
env.step at 256 envs x 128^2 reads/writes 5.1 GB/step, dominated by the
three gather intermediates — hbm_util 0.62, the step's roofline wall).
The information content is P values; the round-trip is pure waste.

This kernel runs the SAME one-hot dot per 512-point chunk with the image
held in VMEM across the whole grid row (its block index is constant), so
the [W, CHUNK] product lives and dies on-chip: HBM traffic is the image
once per env + the indices + the [Q] result.

Layout discipline (see ops/pallas_splat.py): per-point data stays on
LANES end-to-end — vi/ui arrive as [Q/512, 512] rows, the one-hot is
[H, CHUNK] (points on lanes), the dot contracts the image's H dim
(img [H, W] x ohv [H, CHUNK] -> [W, CHUNK]), and the masked reduce runs
over sublanes, yielding the [1, CHUNK] result row.  No layout casts.

Numerics are IDENTICAL to mxu.gather_image(exact=False): the one-hot row
for point k has exactly one nonzero (vi/ui are pre-clipped in range), so
the f32-accumulated product IS the bf16 image value — bit-equal however
the contraction is ordered (tests/test_ops.py parity test).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 512
ROWS = 8  # index rows per grid step — TPU sublane tiling needs blocks of 8


def _kernel(img_ref, vi_ref, ui_ref, out_ref):
    img = img_ref[...].astype(jnp.bfloat16)              # [H, W] (VMEM-resident)
    h, w = img.shape
    for r in range(ROWS):                                # static unroll
        vi = vi_ref[r:r + 1, :]                          # [1, CHUNK]
        ui = ui_ref[r:r + 1, :]
        # one-hot over rows, points on lanes: ohv[h, k] = (vi[k] == h)
        ioh = jax.lax.broadcasted_iota(jnp.int32, (h, CHUNK), 0)
        ohv = (ioh == vi).astype(jnp.bfloat16)           # [H, CHUNK]
        # contract H: tmp[w, k] = img[vi[k], w] for the selected row
        tmp = jax.lax.dot_general(
            img, ohv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [W, CHUNK]
        iow = jax.lax.broadcasted_iota(jnp.int32, (w, CHUNK), 0)
        sel = jnp.where(iow == ui, tmp, 0.0)
        out_ref[r:r + 1, :] = jnp.sum(sel, axis=0, keepdims=True)


def gather_image(img: jnp.ndarray, vi: jnp.ndarray, ui: jnp.ndarray,
                 interpret: bool | None = None) -> jnp.ndarray:
    """img[vi, ui] — [H, W] f32 image, [Q] int32 in-range indices, [Q] f32
    out.  Bit-identical to mxu.gather_image(img, vi, ui, exact=False).
    vmap-compatible (the env axis becomes a leading grid dimension; each
    env's image is DMA'd to VMEM once).

    NOT jit-wrapped: every production call site is already inside the
    jitted env step (a nested jit adds a call boundary that blocks fusion
    with the callers' index prep — the round-2 nested-jit finding), and a
    pallas_call has no GSPMD partitioning rule, so the sharding story is
    the caller's: RendererConfig.gather_impl_for only routes here on a
    single-device mesh (on >1 devices GSPMD would all-gather the per-env
    image operands every step — round-3 verdict weak #1)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    q = vi.shape[0]
    qc = -(-q // (CHUNK * ROWS)) * ROWS                  # rows, multiple of 8
    pad = qc * CHUNK - q
    # pad with index 0 (in range; results discarded by the caller's masks)
    vi_p = jnp.pad(vi, (0, pad)).reshape(qc, CHUNK)
    ui_p = jnp.pad(ui, (0, pad)).reshape(qc, CHUNK)

    # NOTE a "fused" 3-D-dot kernel variant (all ROWS x CHUNK points in one
    # H x (ROWS*CHUNK) contraction) was built and measured in round 5:
    # 18,667 vs 27,171 steps/s end-to-end at 128^2 — a 0.687x REGRESSION
    # (reports/r5_ab_gather_pallas_vs_fused_128.log), so it was removed;
    # the per-row serial dots below are the measured-fastest form.
    out = pl.pallas_call(
        _kernel,
        grid=(qc // ROWS,),
        in_specs=[
            pl.BlockSpec(img.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),       # constant: resident
            pl.BlockSpec((ROWS, CHUNK), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, CHUNK), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, CHUNK), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qc, CHUNK), jnp.float32),
        interpret=interpret,
    )(img, vi_p, ui_p)
    return out.reshape(-1)[:q]

"""Pallas TPU kernel: voxel-cell "any-hit" scatter with VMEM-resident
one-hots.

``mxu.scatter_cells_any`` computes the [G, G, G] hit grid as one
[G, Q] x [Q, G^2] one-hot GEMM.  The [Q, G^2] yz one-hot feeds a dot, so
XLA materializes it in HBM: at 256 envs x Q=11264 x G^2=400 that is a
2.3 GB bf16 write + read per env step — the single largest buffer in the
round-3 compiled env.step (HLO cost analysis; env.step reads ~7.1 GB/step
at 128^2, hbm_util ~1.0: the step runs AT the bandwidth wall and this
buffer is most of it).  The information content is Q indices (90 KB/env).

This kernel runs the same contraction in CHUNK-point blocks with both
one-hots built in VMEM, so they live and die on-chip: HBM traffic is the
index vectors once plus the [G_pad, G^2_pad] f32 count grid.  Counts
accumulate across grid steps into the (block-constant) output ref.

Layout discipline (see ops/pallas_gather.py): points stay on LANES in
both one-hots — ohx [G_pad, CHUNK], ohyz [M_pad, CHUNK] — and the dot
contracts the shared lane dim, yielding [G_pad, M_pad] with cells on
lanes.  No layout casts.

Numerics are IDENTICAL to mxu.scatter_cells_any: counts are sums of
exact 0/1 products accumulated in f32 (max Q < 2^24), thresholded at
0.5 — contraction order cannot change the 0/1 result.
(tests/test_ops.py parity test.)

Replaces: the reference's per-env ``torch.unique`` + index assign
(gennbv/env/env_train_gennbv.py:301-304) — see ops/voxel.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 512
ROWS = 8  # index rows per grid step — TPU sublane tiling needs blocks of 8


def _pad_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _kernel(x_ref, yz_ref, out_ref, *, g_pad: int, m_pad: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    acc = jnp.zeros((g_pad, m_pad), jnp.float32)
    for r in range(ROWS):                                # static unroll
        x = x_ref[r:r + 1, :]                            # [1, CHUNK]
        yz = yz_ref[r:r + 1, :]
        # one-hots with points on lanes; invalid points carry x = -1,
        # which no iota row matches -> all-zero column
        iog = jax.lax.broadcasted_iota(jnp.int32, (g_pad, CHUNK), 0)
        ohx = (iog == x).astype(jnp.bfloat16)            # [G_pad, CHUNK]
        iom = jax.lax.broadcasted_iota(jnp.int32, (m_pad, CHUNK), 0)
        ohm = (iom == yz).astype(jnp.bfloat16)           # [M_pad, CHUNK]
        acc = acc + jax.lax.dot_general(
            ohx, ohm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [G_pad, M_pad]
    out_ref[...] += acc


def scatter_cells_any(cell_idx: jnp.ndarray, valid: jnp.ndarray,
                      grid_size: int,
                      interpret: bool | None = None) -> jnp.ndarray:
    """{0,1}^[G,G,G]: cells containing at least one valid point.

    cell_idx [Q, 3] int32 in [0, G); valid [Q] bool.  Bit-identical to
    mxu.scatter_cells_any.  vmap-compatible (the env axis becomes a
    leading grid dimension).

    NOT jit-wrapped — same rationale as pallas_gather.gather_image: the
    production call site is inside the jitted env step, and a pallas_call
    has no GSPMD partitioning rule, so RendererConfig.scatter_impl_for
    only routes here on a single-device mesh."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    g = grid_size
    q = cell_idx.shape[0]
    g_pad = _pad_up(max(g, 8), 8)
    m_pad = _pad_up(max(g * g, 128), 128)

    x = jnp.where(valid, cell_idx[:, 0], -1).astype(jnp.int32)
    yz = (cell_idx[:, 1] * g + cell_idx[:, 2]).astype(jnp.int32)

    qc = _pad_up(-(-q // CHUNK), ROWS)                   # rows, multiple of 8
    pad = qc * CHUNK - q
    x_p = jnp.pad(x, (0, pad), constant_values=-1).reshape(qc, CHUNK)
    yz_p = jnp.pad(yz, (0, pad)).reshape(qc, CHUNK)

    counts = pl.pallas_call(
        functools.partial(_kernel, g_pad=g_pad, m_pad=m_pad),
        grid=(qc // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, CHUNK), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, CHUNK), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g_pad, m_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),  # constant: resident
        out_shape=jax.ShapeDtypeStruct((g_pad, m_pad), jnp.float32),
        interpret=interpret,
    )(x_p, yz_p)
    return (counts[:g, :g * g] > 0.5).astype(jnp.float32).reshape(g, g, g)

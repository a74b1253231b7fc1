"""Chamfer distance in JAX (replaces PyTorch3D, SURVEY §2.6 N3).

The reference computes reconstruction accuracy as
``chamfer_distance(unique(round(pts, 2)), pc_gt) * 100`` at episode end
(env_eval_gennbv.py:252-264).  PyTorch3D's chamfer_distance returns the
*sum* of the two mean squared nearest-neighbour distances.

Point counts are ~1e4-1e5, so a chunked brute-force [P, Q] pairwise min is
fine (eval only, never in the training hot loop).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _directed_sq_nn(a: jnp.ndarray, a_mask: jnp.ndarray, b: jnp.ndarray,
                    b_mask: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """mean over valid a of min over valid b of squared distance."""
    big = jnp.asarray(1e10, dtype=a.dtype)

    def chunk_min(a_chunk):
        d = jnp.sum((a_chunk[:, None, :] - b[None, :, :]) ** 2, axis=-1)
        d = jnp.where(b_mask[None, :], d, big)
        return jnp.min(d, axis=-1)

    n = a.shape[0]
    pad = (-n) % chunk
    a_p = jnp.pad(a, ((0, pad), (0, 0)))
    mins = jax.lax.map(chunk_min, a_p.reshape(-1, chunk, 3)).reshape(-1)[:n]
    w = a_mask.astype(a.dtype)
    return jnp.sum(mins * w) / jnp.maximum(jnp.sum(w), 1.0)


@partial(jax.jit, static_argnames=("chunk",))
def chamfer_distance(
    pts_a: jnp.ndarray,    # [P, 3]
    mask_a: jnp.ndarray,   # [P] bool
    pts_b: jnp.ndarray,    # [Q, 3]
    mask_b: jnp.ndarray,   # [Q] bool
    chunk: int = 1024,
) -> jnp.ndarray:
    """Symmetric chamfer: mean_a min_b d^2 + mean_b min_a d^2 (PyTorch3D
    convention with default point_reduction='mean', batch sum)."""
    return _directed_sq_nn(pts_a, mask_a, pts_b, mask_b, chunk) + _directed_sq_nn(
        pts_b, mask_b, pts_a, mask_a, chunk
    )


@partial(jax.jit, static_argnames=("chunk",))
def chamfer_directed(
    pts_a: jnp.ndarray,    # [P, 3]
    mask_a: jnp.ndarray,   # [P] bool
    pts_b: jnp.ndarray,    # [Q, 3]
    mask_b: jnp.ndarray,   # [Q] bool
    chunk: int = 1024,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The two directed terms of chamfer_distance, separately:
    (mean_a min_b d^2, mean_b min_a d^2).  The split makes the accuracy
    metric representation-honest: a->b is bounded below by b's sampling
    density; b->a additionally pays for parts of b that a never observed."""
    return (_directed_sq_nn(pts_a, mask_a, pts_b, mask_b, chunk),
            _directed_sq_nn(pts_b, mask_b, pts_a, mask_a, chunk))


@partial(jax.jit, static_argnames=("chunk",))
def nn_sq_dists(
    pts_a: jnp.ndarray,    # [P, 3]
    mask_a: jnp.ndarray,   # [P] bool
    pts_b: jnp.ndarray,    # [Q, 3]
    mask_b: jnp.ndarray,   # [Q] bool
    chunk: int = 1024,
) -> jnp.ndarray:
    """Per-point min_b d^2 for every a (1e10 where a is masked out)."""
    big = jnp.asarray(1e10, jnp.float32)

    def chunk_min(a_chunk):
        d = jnp.sum((a_chunk[:, None, :] - pts_b[None, :, :]) ** 2, axis=-1)
        d = jnp.where(mask_b[None, :], d, big)
        return jnp.min(d, axis=-1)

    n = pts_a.shape[0]
    pad = (-n) % chunk
    a_p = jnp.pad(pts_a, ((0, pad), (0, 0)))
    mins = jax.lax.map(chunk_min, a_p.reshape(-1, chunk, 3)).reshape(-1)[:n]
    return jnp.where(mask_a, mins, big)


@partial(jax.jit, static_argnames=("chunk",))
def sampling_floor(pts: jnp.ndarray, mask: jnp.ndarray,
                   chunk: int = 1024) -> jnp.ndarray:
    """Resolution floor of a point sampling: mean nearest-OTHER-neighbour
    squared distance among the points themselves.  A query point lying
    exactly on the sampled surface still measures ~ this/4 to its nearest
    sample, so a directed chamfer term toward this set cannot be expected
    below ~floor/4 regardless of scan quality."""
    big = jnp.asarray(1e10, jnp.float32)

    def chunk_min(args):
        a_chunk, i0 = args
        d = jnp.sum((a_chunk[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        d = jnp.where(mask[None, :], d, big)
        # exclude self-distance
        n = pts.shape[0]
        rows = i0 + jnp.arange(a_chunk.shape[0])
        self_oh = rows[:, None] == jnp.arange(n)[None, :]
        d = jnp.where(self_oh, big, d)
        return jnp.min(d, axis=-1)

    n = pts.shape[0]
    pad = (-n) % chunk
    a_p = jnp.pad(pts, ((0, pad), (0, 0)))
    starts = jnp.arange(0, n + pad, chunk)
    mins = jax.lax.map(chunk_min, (a_p.reshape(-1, chunk, 3), starts)).reshape(-1)[:n]
    w = mask.astype(jnp.float32)
    return jnp.sum(mins * w) / jnp.maximum(jnp.sum(w), 1.0)


def dedupe_round_cm(points: np.ndarray) -> np.ndarray:
    """Host-side unique(round(pts, 2 decimals)) — the reference's 1 cm
    voxel dedup before chamfer (env_eval_gennbv.py:256-259)."""
    return np.unique(np.round(points, 2), axis=0)

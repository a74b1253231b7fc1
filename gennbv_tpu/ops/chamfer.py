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


def dedupe_round_cm(points: np.ndarray) -> np.ndarray:
    """Host-side unique(round(pts, 2 decimals)) — the reference's 1 cm
    voxel dedup before chamfer (env_eval_gennbv.py:256-259)."""
    return np.unique(np.round(points, 2), axis=0)

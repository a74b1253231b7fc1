"""Hybrid multi-source state encoder in Flax.

Faithful re-architecture of gennbv/network/hybrid_encoder.py:11-91:
- pose branch: flat obs[:, :600] -> (N, 100, 6) -> sinusoidal positional
  encoding (freqs=2, bands [1, 2], sin++cos) -> (N, 2400) -> MLP
  2400 -> 256 -> 256 with ReLU;
- grid branch: obs[:, 600:8600] -> (N, 20, 20, 20, 1) -> [Conv3D(16, k3,
  s2, VALID) + BatchNorm + ReLU] x2 -> flatten 1024 -> Dense 256 + ReLU;
- fusion: concat(512) -> Dense 256 + ReLU.

The state_rgb slice (obs[:, 8600:]) is sliced off and never used — a
deliberate reference quirk kept for observation-layout parity
(hybrid_encoder.py:83 stops at 8600; SURVEY §7 phase 3).

TPU notes: channels-last layout; Conv3D contractions land on the MXU; the
whole module is bfloat16-friendly via the `dtype` arg (params stay fp32).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from gennbv_tpu import spec
from gennbv_tpu.config import ModelConfig


def positional_encoding(positions: jnp.ndarray, freqs: int = 2) -> jnp.ndarray:
    """[..., D] -> [..., 2 * freqs * D]: sin/cos of positions * 2^k
    (hybrid_encoder.py:56-67; band-major layout then sin ++ cos)."""
    bands = 2.0 ** jnp.arange(freqs, dtype=positions.dtype)
    scaled = (positions[..., None] * bands).reshape(
        positions.shape[:-1] + (freqs * positions.shape[-1],)
    )
    return jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)


class HybridEncoder(nn.Module):
    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        n = obs.shape[0]
        cfg = self.cfg
        obs = obs.astype(self.dtype)

        # ----- pose/action-history branch -----
        pose = obs[:, : spec.STATE_DIM].reshape(n, -1, spec.ACTION_DIM)
        pose = positional_encoding(pose, cfg.posenc_freqs).reshape(n, -1)
        h_pose = nn.Dense(cfg.pose_mlp_hidden, dtype=self.dtype, name="pose_fc1")(pose)
        h_pose = nn.relu(h_pose)
        h_pose = nn.Dense(cfg.pose_mlp_hidden, dtype=self.dtype, name="pose_fc2")(h_pose)
        h_pose = nn.relu(h_pose)

        # ----- occupancy-grid branch -----
        g = spec.GRID_SIZE
        grid = obs[:, spec.STATE_DIM : spec.STATE_DIM + spec.GRID_DIM]
        grid = grid.reshape(n, g, g, g, 1)
        for i in range(2):
            grid = nn.Conv(
                cfg.grid_channels,
                kernel_size=(3, 3, 3),
                strides=(2, 2, 2),
                padding="VALID",
                dtype=self.dtype,
                name=f"grid_conv{i + 1}",
            )(grid)
            grid = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                dtype=self.dtype,
                name=f"grid_bn{i + 1}",
            )(grid)
            grid = nn.relu(grid)
        h_grid = grid.reshape(n, -1)
        h_grid = nn.Dense(cfg.fused_dim, dtype=self.dtype, name="grid_fc")(h_grid)
        h_grid = nn.relu(h_grid)

        # (state_rgb slice intentionally unused)

        fused = jnp.concatenate([h_pose, h_grid], axis=-1)
        out = nn.Dense(cfg.fused_dim, dtype=self.dtype, name="fuse_fc")(fused)
        return nn.relu(out)

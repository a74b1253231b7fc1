"""Device mesh + sharding helpers.

The scaling strategy (SURVEY §2.7): the env axis is the data-parallel axis.
Env state, observations and rollout tensors are sharded over a 1-D mesh
('env'); model params/optimizer state are replicated.  Everything runs under
one jit — GSPMD inserts the gradient all-reduce over ICI, replacing the
reference's single-GPU layout (and its dead --horovod flag,
legged_gym/utils/helpers.py:662-667).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"
DCN_AXIS = "slice"


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    n = num_devices if num_devices > 0 else len(devs)
    return Mesh(np.array(devs[:n]), (ENV_AXIS,))


def make_multislice_mesh(num_slices: int, num_devices: int = 0,
                         devices=None) -> Mesh:
    """2-D ('slice', 'env') mesh for multi-slice scaling over DCN.

    The env axis stays the only *sharded* data axis; the slice axis groups
    devices so GSPMD routes the gradient all-reduce hierarchically —
    reduce-scatter over ICI within a slice, then the small cross-slice
    all-reduce over DCN (SURVEY §5.8).  Shardings below treat ('slice',
    'env') jointly as the env axis, so all env code is layout-agnostic.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = num_devices if num_devices > 0 else len(devs)
    assert n % num_slices == 0, (
        f"num_devices ({n}) must be divisible by num_slices ({num_slices})")
    arr = np.array(devs[:n]).reshape(num_slices, n // num_slices)
    return Mesh(arr, (DCN_AXIS, ENV_AXIS))


def _env_spec(mesh: Mesh) -> P:
    """Leading-axis spec: both mesh axes shard the env dim on a 2-D mesh."""
    if DCN_AXIS in mesh.axis_names:
        return P((DCN_AXIS, ENV_AXIS))
    return P(ENV_AXIS)


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (env) sharding (handles 1-D and multi-slice meshes)."""
    return NamedSharding(mesh, _env_spec(mesh))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_tree(tree: Any, mesh: Mesh) -> Any:
    """device_put a pytree with every array sharded on its leading (env)
    axis; 0-d leaves replicated."""
    shard = env_sharding(mesh)
    rep = replicated(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, shard)
        return jax.device_put(x, rep)

    return jax.tree.map(put, tree)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)

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


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    n = num_devices if num_devices > 0 else len(devs)
    return Mesh(np.array(devs[:n]), (ENV_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (env) sharding."""
    return NamedSharding(mesh, P(ENV_AXIS))


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

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
MODEL_AXIS = "model"


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    n = num_devices if num_devices > 0 else len(devs)
    return Mesh(np.array(devs[:n]), (ENV_AXIS,))


def make_mesh_tp(model_axis: int, num_devices: int = 0, devices=None) -> Mesh:
    """2-D ('env', 'model') mesh: data parallelism over envs x tensor
    parallelism over the policy's feature dimensions.

    The model axis is the MINOR mesh dimension, so TP collectives
    (all-gathers/all-reduces of activations between sharded layers) ride
    contiguous ICI neighbors while the env-gradient all-reduce crosses the
    outer axis — the standard mesh layout from the scaling-book recipe.
    At this policy's ~5M params TP is not a memory necessity; it is the
    capability demo + the layout larger models plug into.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = num_devices if num_devices > 0 else len(devs)
    assert n % model_axis == 0, (
        f"num_devices ({n}) must be divisible by model_axis ({model_axis})")
    arr = np.array(devs[:n]).reshape(n // model_axis, model_axis)
    return Mesh(arr, (ENV_AXIS, MODEL_AXIS))


def param_spec(x, model_axis_size: int) -> P:
    """Shape-based tensor-parallel PartitionSpec for one param/optimizer
    leaf: 2-D kernels shard their OUTPUT features, matching 1-D vectors
    (biases) shard likewise; everything small or indivisible replicates.
    Shape-based (not path-based) so the same rule maps params and their
    optimizer-moment mirrors identically; GSPMD inserts the activation
    resharding between layers, so any choice here is correctness-safe."""
    if (x.ndim == 2 and x.shape[1] % model_axis_size == 0
            and x.shape[1] >= 128):
        return P(None, MODEL_AXIS)
    if (x.ndim == 1 and x.shape[0] % model_axis_size == 0
            and x.shape[0] >= 128):
        return P(MODEL_AXIS)
    return P()


def shard_params_tp(tree: Any, mesh: Mesh) -> Any:
    """device_put a params/opt-state pytree with tensor-parallel sharding
    over the mesh's 'model' axis (see param_spec)."""
    m = int(mesh.shape[MODEL_AXIS])

    def put(x):
        spec = param_spec(x, m) if hasattr(x, "ndim") else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


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

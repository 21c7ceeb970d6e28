"""Device mesh helpers.

The reference has no distributed anything (SURVEY §2.5: single process, one
mutex'd RNG); parallel data loading comes from DataLoader workers.  Here
scaling is mesh-native: a ``('data', 'model')`` mesh, seeds sharded over
``data`` (each chip samples + trains its own shard — the DataLoader-worker
analogue), parameters optionally sharded over ``model``, gradient psum
inserted by XLA via sharding propagation.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              names: Tuple[str, str] = ("data", "model")) -> Mesh:
    """('data', 'model') mesh over all available devices."""
    devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, (shape, n)
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rule(path: Tuple, value, mesh: Mesh) -> NamedSharding:
    """Tensor-parallel rule: Dense kernels shard their output dim over
    'model'; biases and 1-d params replicate."""
    if getattr(value, "ndim", 0) == 2 and value.shape[-1] % mesh.shape["model"] == 0:
        return NamedSharding(mesh, P(None, "model"))
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Apply the TP rule across a param pytree."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = [jax.device_put(v, param_sharding_rule(path, v, mesh))
           for path, v in flat]
    return jax.tree_util.tree_unflatten(treedef, out)

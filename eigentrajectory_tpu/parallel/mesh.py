"""Device-mesh utilities for data-parallel scaling.

The reference's only parallelism is five independent single-GPU OS processes
(script/train.sh:51-59, SURVEY §2c P1). The TPU-native equivalent is a single
SPMD program: a jax.sharding.Mesh with a 'data' axis, scene batches sharded
over it, parameters replicated, and XLA inserting the gradient all-reduce over
ICI automatically. A 'model' axis is exposed for future tensor sharding
(SURVEY §2c P2: not needed for parity, but the knob exists).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1) -> Mesh:
    """Build a ('data', 'model') mesh over the first n_data*n_model devices."""
    devices = jax.devices()
    n_data = n_data or (len(devices) // n_model)
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (scene/ped batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """device_put a batch pytree with its leading axis sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)

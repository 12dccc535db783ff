"""Device mesh helpers.

TPU-native replacement for the reference's process-level parallelism (one
CUDA device per subprocess + JSON merge, `tools/batch_eval.py:8-30,80-98`):
a single-program `jax.sharding.Mesh` with a data axis (images / prompt
batches) and a model axis (prompt-axis or spatial sharding).  The reference
uses no collectives at all (SURVEY.md §2.5); here XLA inserts them from
sharding annotations so they ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a 2D (data, model) mesh.  shape=None -> all devices on data."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices), 1)
    assert shape[0] * shape[1] <= len(devices), (shape, len(devices))
    arr = np.asarray(devices[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def model_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    return NamedSharding(mesh, P("model", *([None] * (ndim - 1))))


def shard_batch(x, mesh: Mesh, ndim: Optional[int] = None):
    """Place a batch array with its leading axis split over 'data'."""
    nd = ndim if ndim is not None else np.ndim(x)
    return jax.device_put(x, data_sharded(mesh, nd))

"""Device mesh construction.

The reference system is single-process / single-device (ref:demo.py:31-34,
ref:train.py:70) with no distributed code at all. Here parallelism is
first-class: a ``jax.sharding.Mesh`` with axes

  ``data``   — batch (data-parallel) axis; gradients psum over ICI
  ``model``  — tensor-parallel axis for the ViT (heads / MLP sharding)

Throughput metric is images/sec/chip, so DP over ``data`` is the load-bearing
strategy; ``model`` defaults to 1 and is used for the `large` backbone.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def default_mesh_shape(n_devices: int, model_parallel: int = 1) -> tuple[int, int]:
    """(data, model) mesh shape. model_parallel must divide n_devices."""
    if n_devices % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} does not divide n_devices={n_devices}"
        )
    return (n_devices // model_parallel, model_parallel)


def make_mesh(
    devices: Sequence[jax.Device] | None = None, model_parallel: int = 1
) -> Mesh:
    """Create a 2-D (data, model) mesh over the given devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    dp, mp = default_mesh_shape(len(devices), model_parallel)
    dev_array = np.asarray(devices).reshape(dp, mp)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch_to_devices(batch_size: int, mesh: Mesh) -> int:
    """Smallest batch >= batch_size divisible by the data axis size."""
    dp = mesh.shape[DATA_AXIS]
    return int(math.ceil(batch_size / dp) * dp)

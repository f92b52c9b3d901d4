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
REPLICA_AXIS = "replica"  # DCN (cross-slice / cross-host) data parallelism


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


def initialize_distributed(**kw) -> None:
    """Multi-host entry: initialize the JAX distributed runtime from the
    environment (coordinator address / process id / num processes are picked
    up from TPU metadata on real pods; pass explicitly elsewhere). Call once
    per process before any backend use."""
    import jax.distributed

    jax.distributed.initialize(**kw)


def make_multihost_mesh(
    model_parallel: int = 1,
    replicas: int | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """3-D (replica, data, model) mesh for multi-slice / multi-host runs.

    The `replica` axis maps across DCN (one replica per slice/host group) and
    carries only gradient all-reduces; `data`/`model` stay within a slice so
    their collectives ride ICI (the scaling-book hybrid recipe). On real
    multi-slice TPU topologies the device order comes from
    mesh_utils.create_hybrid_device_mesh; on flat topologies (or the virtual
    CPU mesh) it degenerates to a reshape — same SPMD program either way.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if replicas is None:
        slice_ids = {getattr(d, "slice_index", 0) or 0 for d in devices}
        replicas = max(1, len(slice_ids))
    if n % (replicas * model_parallel) != 0:
        raise ValueError(
            f"replicas={replicas} * model_parallel={model_parallel} "
            f"does not divide n_devices={n}"
        )
    dp = n // (replicas * model_parallel)
    shape = (replicas, dp, model_parallel)
    if len({getattr(d, "slice_index", 0) or 0 for d in devices}) > 1:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            (1, dp, model_parallel), (replicas, 1, 1), devices=devices
        )
    else:
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, (REPLICA_AXIS, DATA_AXIS, MODEL_AXIS))


def batch_axes(mesh: Mesh):
    """Mesh axes the batch dim shards over: (replica, data) on a multihost
    mesh, data alone on the 2-D mesh."""
    if REPLICA_AXIS in mesh.axis_names:
        return (REPLICA_AXIS, DATA_AXIS)
    return DATA_AXIS


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data(+replica) axes."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch_to_devices(batch_size: int, mesh: Mesh) -> int:
    """Smallest batch >= batch_size divisible by the batch-sharded axes."""
    dp = mesh.shape[DATA_AXIS]
    if REPLICA_AXIS in mesh.axis_names:
        dp *= mesh.shape[REPLICA_AXIS]
    return int(math.ceil(batch_size / dp) * dp)

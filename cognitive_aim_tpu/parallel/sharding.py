"""Sharding rules: DP over the `data` axis, optional TP over `model`.

The reference has zero distributed code (SURVEY.md §2.6); here scaling is
mesh-native. Data parallelism: batches sharded on the leading dim, params
replicated, gradient psum inserted by GSPMD from the sharding annotations.
Tensor parallelism (for the `large` backbone): ViT q/k/v and MLP fc1 shard
their output dim over `model` (head-parallel / Megatron-style column split),
attn_out and fc2 shard their input dim (row split) — activations stay sharded
between the two, with one all-reduce per block pair, riding ICI.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cognitive_aim_tpu.core.mesh import MODEL_AXIS, batch_axes

# Path-suffix -> PartitionSpec for stacked backbone layer params [L, in, out].
_TP_RULES = {
    ("layers", "q", "w"): P(None, None, MODEL_AXIS),
    ("layers", "q", "b"): P(None, MODEL_AXIS),
    ("layers", "k", "w"): P(None, None, MODEL_AXIS),
    ("layers", "k", "b"): P(None, MODEL_AXIS),
    ("layers", "v", "w"): P(None, None, MODEL_AXIS),
    ("layers", "v", "b"): P(None, MODEL_AXIS),
    ("layers", "attn_out", "w"): P(None, MODEL_AXIS, None),
    ("layers", "fc1", "w"): P(None, None, MODEL_AXIS),
    ("layers", "fc1", "b"): P(None, MODEL_AXIS),
    ("layers", "fc2", "w"): P(None, MODEL_AXIS, None),
}


def _path_names(path):
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "idx"):
            names.append(str(p.idx))
        else:
            names.append(str(p))
    return tuple(names)


def param_shardings(mesh: Mesh, params, tensor_parallel: bool = False):
    """NamedSharding pytree matching `params`: replicated by default;
    backbone layer matmuls sharded over `model` when tensor_parallel."""

    def spec_for(path, leaf):
        if tensor_parallel:
            names = _path_names(path)
            for suffix, spec in _TP_RULES.items():
                if names[-len(suffix):] == tuple(suffix):
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def batch_shardings(mesh: Mesh, batch):
    """Shard every leaf's leading (batch) dim over `data` (plus `replica`
    on a multi-host DCN mesh)."""
    spec = P(batch_axes(mesh))
    return jax.tree.map(lambda _: NamedSharding(mesh, spec), batch)


def shard_params(mesh: Mesh, params, tensor_parallel: bool = False):
    return jax.device_put(params, param_shardings(mesh, params, tensor_parallel))


def shard_batch(mesh: Mesh, batch):
    return jax.device_put(batch, batch_shardings(mesh, batch))

"""Pipeline parallelism (GPipe schedule) for the stacked ViT backbone.

The reference has zero distributed code (SURVEY.md §2.6); this is the
TPU-native pipeline option for the 24-layer `large` backbone when
multi-chip latency serving matters more than pure DP throughput.

Design: the backbone's layers are already stacked on a leading axis and
driven by lax.scan (nn/dinov2.py). Pipelining reshapes that axis to
[stages, layers/stage], shards it over a `pipe` mesh axis, and runs the
classic GPipe schedule inside one shard_map:

  * the local batch is split into M microbatches;
  * at step t, stage s runs microbatch (t - s) through its layer chunk;
  * activations move stage s -> s+1 with lax.ppermute (one ICI hop —
    neighbouring stages should be neighbouring devices);
  * after M + S - 1 steps the last stage holds every finished microbatch;
    one masked psum replicates them back to all stages.

Bubble fraction is (S-1)/(M+S-1): M >= 2*S keeps it under a third. All
control flow is a lax.fori_loop over a static step count — one compiled
program, no per-step dispatch.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from cognitive_aim_tpu.core.mesh import DATA_AXIS

PIPE_AXIS = "pipe"


def make_pipeline_mesh(
    n_stages: int, devices: Sequence[jax.Device] | None = None
) -> Mesh:
    """2-D (data, pipe) mesh. The pipe axis is innermost so consecutive
    stages land on ICI-adjacent devices."""
    if devices is None:
        devices = jax.devices()
    if len(devices) % n_stages != 0:
        raise ValueError(
            f"n_stages={n_stages} does not divide n_devices={len(devices)}"
        )
    arr = np.asarray(devices).reshape(len(devices) // n_stages, n_stages)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


def pipelined_scan(
    mesh: Mesh,
    layers,
    x: jnp.ndarray,
    block_fn: Callable,
    n_micro: int,
    remat: bool = False,
):
    """Run ``x -> scan(block_fn, layers)`` pipelined over the mesh's `pipe`
    axis with `n_micro` microbatches per local batch.

    Differentiable: ``jax.grad`` through this function yields the classic
    reversed GPipe backward schedule automatically — ``lax.ppermute``'s
    transpose is the reverse permute (cotangents hop stage s+1 -> s over
    the same ICI links) and the static-bound ``fori_loop`` is converted to
    a scan for reverse-mode. Used by the pipelined training step
    (train/trainer.py, ``TrainConfig.pipeline_stages``).

    Args:
      layers: layer-stacked param pytree, every leaf [L, ...]; L must divide
        by the pipe-axis size.
      x: [B, ...] activations; B must divide by data-axis size * n_micro.
      block_fn: (layer_params, x) -> x for ONE layer.
      remat: rematerialize each stage chunk in the backward pass (canonical
        GPipe memory discipline: keep only microbatch boundaries, recompute
        the per-layer intermediates inside a stage).
    Returns [B, ...], numerically identical to the sequential scan.
    """
    n_stages = mesh.shape[PIPE_AXIS]
    L = jax.tree_util.tree_leaves(layers)[0].shape[0]
    if L % n_stages != 0:
        raise ValueError(f"{L} layers do not divide over {n_stages} stages")
    staged = jax.tree.map(
        lambda a: a.reshape(n_stages, L // n_stages, *a.shape[1:]), layers
    )

    layer_specs = jax.tree.map(lambda _: P(PIPE_AXIS), staged)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(layer_specs, P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    def run(staged_local, x_local):
        chunk = jax.tree.map(lambda a: a[0], staged_local)  # [L/S, ...]
        s = jax.lax.axis_index(PIPE_AXIS)
        b_loc = x_local.shape[0]
        if b_loc % n_micro != 0:
            raise ValueError(
                f"local batch {b_loc} does not divide into {n_micro} microbatches"
            )
        micros = x_local.reshape(n_micro, b_loc // n_micro, *x_local.shape[1:])

        def apply_chunk(xm):
            out, _ = jax.lax.scan(lambda c, lp: (block_fn(lp, c), None), xm, chunk)
            return out

        if remat:
            apply_chunk = jax.checkpoint(apply_chunk)

        n_steps = n_micro + n_stages - 1
        fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def step(t, carry):
            state, outputs = carry
            feed = jax.lax.dynamic_index_in_dim(
                micros, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
            )
            inp = jnp.where(s == 0, feed, state)
            out = apply_chunk(inp)
            # the last stage finishes microbatch t-(S-1) at step t
            done_idx = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
            valid = jnp.logical_and(t >= n_stages - 1, s == n_stages - 1)
            cur = jax.lax.dynamic_index_in_dim(outputs, done_idx, 0, keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(valid, out, cur), done_idx, 0
            )
            state = jax.lax.ppermute(out, PIPE_AXIS, fwd)
            return state, outputs

        state0 = jnp.zeros_like(micros[0])
        out0 = jnp.zeros_like(micros)
        _, outputs = jax.lax.fori_loop(0, n_steps, step, (state0, out0))
        # replicate the finished microbatches from the last stage to all
        # (masked psum: every other stage contributes zeros)
        outputs = jax.lax.psum(
            jnp.where(s == n_stages - 1, outputs, jnp.zeros_like(outputs)),
            PIPE_AXIS,
        )
        return outputs.reshape(b_loc, *x_local.shape[1:])

    return run(staged, x)

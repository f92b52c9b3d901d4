"""Unit tests for the remaining utility tiers: mesh helpers, sharding rules,
profiling primitives, logging helpers."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from cognitive_aim_tpu.core.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    default_mesh_shape,
    make_mesh,
    pad_batch_to_devices,
)
from cognitive_aim_tpu.parallel.sharding import param_shardings, shard_batch
from cognitive_aim_tpu.utils.logging import count_parameters, get_model_size_mb
from cognitive_aim_tpu.utils.profiling import StepTimer, chain_throughput


def test_mesh_shapes():
    assert default_mesh_shape(8, 1) == (8, 1)
    assert default_mesh_shape(8, 2) == (4, 2)
    try:
        default_mesh_shape(8, 3)
        assert False
    except ValueError:
        pass
    mesh = make_mesh(model_parallel=2)
    assert mesh.shape[DATA_AXIS] == 4 and mesh.shape[MODEL_AXIS] == 2
    assert pad_batch_to_devices(10, mesh) == 12


def test_tp_rules_hit_backbone_layers():
    mesh = make_mesh(model_parallel=2)
    params = {
        "backbone": {
            "layers": {
                "q": {"w": jnp.zeros((2, 8, 8)), "b": jnp.zeros((2, 8))},
                "fc2": {"w": jnp.zeros((2, 16, 8)), "b": jnp.zeros((2, 8))},
                "norm1": {"scale": jnp.zeros((2, 8))},
            }
        },
        "fusion": {"fc0": {"w": jnp.zeros((4, 4))}},
    }
    sh = param_shardings(mesh, params, tensor_parallel=True)
    assert sh["backbone"]["layers"]["q"]["w"].spec == P(None, None, MODEL_AXIS)
    assert sh["backbone"]["layers"]["fc2"]["w"].spec == P(None, MODEL_AXIS, None)
    assert sh["backbone"]["layers"]["norm1"]["scale"].spec == P()
    assert sh["fusion"]["fc0"]["w"].spec == P()


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    batch = {"images": jnp.zeros((16, 4)), "depths": jnp.zeros((16,))}
    out = shard_batch(mesh, batch)
    assert out["images"].sharding.spec == P(DATA_AXIS)


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            pass
    s = t.stats()
    assert s["steps"] == 3 and s["mean_s"] >= 0


def test_chain_throughput_measures_something():
    per_step = chain_throughput(lambda c: c * 1.0000001, jnp.ones((64, 64)),
                                k_short=2, k_long=6, repeats=1)
    assert np.isfinite(per_step)


def test_param_counting():
    params = {"a": jnp.zeros((10, 10)), "b": [jnp.zeros(5), jnp.zeros(5)]}
    total, trainable = count_parameters(params)
    assert total == 110 and trainable == 110
    assert abs(get_model_size_mb(params) - 110 * 4 / 1024 / 1024) < 1e-9

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


def test_multihost_mesh_and_batch_sharding():
    """3-D (replica, data, model) DCN x ICI mesh on the virtual devices:
    batch shards over replica+data jointly; padding accounts for both."""
    import jax
    from jax.sharding import PartitionSpec as P

    from cognitive_aim_tpu.core.mesh import (
        MODEL_AXIS,
        REPLICA_AXIS,
        batch_sharding,
        make_multihost_mesh,
        pad_batch_to_devices,
    )

    mesh = make_multihost_mesh(model_parallel=2, replicas=2,
                               devices=jax.devices()[:8])
    assert mesh.shape == {"replica": 2, "data": 2, "model": 2}
    bs = batch_sharding(mesh)
    assert bs.spec == P((REPLICA_AXIS, "data"))
    assert pad_batch_to_devices(5, mesh) == 8  # ceil(5 / (replica*data=4)) * 4

    # replicas must divide the device count
    import pytest

    with pytest.raises(ValueError):
        make_multihost_mesh(model_parallel=3, replicas=2,
                            devices=jax.devices()[:8])


def test_multihost_train_step():
    """One sharded training step over the (replica, data, model) mesh —
    the gradient all-reduce spans the replica (DCN) axis."""
    import jax
    import numpy as np

    from cognitive_aim_tpu.core.mesh import make_multihost_mesh

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    from cognitive_aim_tpu.train.trainer import TrainConfig, Trainer

    mesh = make_multihost_mesh(model_parallel=2, replicas=2,
                               devices=jax.devices()[:8])
    model, params = g._flagship(image_size=28, tiny=True)
    cfg = TrainConfig(epochs=1, steps_per_epoch=2, freeze_backbone=True,
                      tensor_parallel=True, accumulation_steps=1)
    trainer = Trainer(model, params, cfg, mesh=mesh,
                      output_dir="/tmp/graft_multihost")
    rng = np.random.RandomState(0)
    B = 8
    batch = {
        "images": rng.randn(B, 28, 28, 3).astype(np.float32),
        "depths": np.abs(rng.randn(B, 28, 28).astype(np.float32)) + 0.1,
        "exif": {
            "camera_idx": np.zeros(B, np.int32),
            "focal_length": np.full(B, 0.25, np.float32),
            "aperture": np.full(B, 0.127, np.float32),
            "iso": np.full(B, 0.016, np.float32),
        },
    }
    logs = trainer.train_step(batch, jax.random.PRNGKey(0))
    assert np.isfinite(logs["loss"])


def test_pipelined_backbone_matches_sequential():
    """GPipe pipelined_scan over a (data=2, pipe=4) virtual mesh reproduces
    the sequential lax.scan forward exactly."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from cognitive_aim_tpu.nn import dinov2
    from cognitive_aim_tpu.parallel.pipeline import make_pipeline_mesh

    cfg = dinov2.DinoV2Config(hidden_size=64, num_layers=4, num_heads=4,
                              patch_size=14, pretrain_image_size=56)
    params = dinov2.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 56, 56, 3)) * 0.5

    want = np.asarray(dinov2.apply(params, x, cfg, fuse_qkv=False))
    mesh = make_pipeline_mesh(4)
    assert mesh.shape == {"data": 2, "pipe": 4}
    got = np.asarray(
        jax.jit(
            lambda p, c: dinov2.apply_pipelined(p, c, cfg, mesh, n_micro=2)
        )(params, x)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)


def test_full_model_pipelined_matches_sequential():
    """CognitiveAimModel.apply(pipeline_mesh=...) — the FULL model (focal
    streams, fusion, heads included) with a GPipe backbone reproduces the
    sequential forward; the filter/quantize exclusions raise cleanly."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    import pytest

    from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
    from cognitive_aim_tpu.models.config import ModelArchConfig
    from cognitive_aim_tpu.nn.dinov2 import DinoV2Config
    from cognitive_aim_tpu.parallel.pipeline import make_pipeline_mesh

    vit = DinoV2Config(hidden_size=64, num_layers=4, num_heads=4,
                       patch_size=14, pretrain_image_size=56)
    arch = ModelArchConfig(num_iterations=2, image_size=56)
    model = CognitiveAimModel(arch, vit_cfg=vit)
    params = model.init(jax.random.PRNGKey(0))
    B = 4
    images = jax.random.normal(jax.random.PRNGKey(1), (B, 56, 56, 3)) * 0.5
    exif = {
        "camera_idx": jnp.zeros((B,), jnp.int32),
        "focal_length": jnp.full((B,), 50.0),
        "aperture": jnp.full((B,), 2.8),
        "iso": jnp.full((B,), 100.0),
    }
    key = jax.random.PRNGKey(2)
    gidx = jnp.asarray([0, 3, 5, 8], jnp.int32)
    want = model.apply(params, images, exif, guidance=gidx, rng=key)
    mesh = make_pipeline_mesh(4)
    got = jax.jit(
        lambda p, x, e, g: model.apply(p, x, e, guidance=g, rng=key,
                                       pipeline_mesh=mesh,
                                       pipeline_n_micro=2)
    )(params, images, exif, gidx)
    np.testing.assert_allclose(np.asarray(got.depth),
                               np.asarray(want.depth), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got.confidence),
                               np.asarray(want.confidence), atol=1e-5,
                               rtol=1e-4)
    # T=0.05 softmax amplifies the ~1e-5 pipelined-backbone difference
    # ~20x into the guided blend; near-zero entries make rtol meaningless
    np.testing.assert_allclose(np.asarray(got.attention),
                               np.asarray(want.attention), atol=1e-3)

    # exclusions: token filter and int8 backbone don't compose with PP
    arch_tf = ModelArchConfig(num_iterations=2, image_size=56,
                              token_filter_layer=2, token_filter_keep=0.5)
    model_tf = CognitiveAimModel(arch_tf, vit_cfg=vit)
    with pytest.raises(ValueError, match="mutually exclusive"):
        model_tf.apply(params, images, exif, guidance=gidx, rng=key,
                       pipeline_mesh=mesh)


def test_pipelined_scan_grad_matches_sequential():
    """jax.grad THROUGH the GPipe schedule (the reversed-pipeline backward:
    ppermute's transpose hops cotangents stage s+1 -> s) matches the
    sequential scan's gradients, with and without per-stage remat."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from cognitive_aim_tpu.parallel.pipeline import (
        make_pipeline_mesh,
        pipelined_scan,
    )

    L, D, B = 8, 16, 4
    key = jax.random.PRNGKey(0)
    layers = {
        "w": jax.random.normal(key, (L, D, D)) * 0.1,
        "b": jax.random.normal(jax.random.fold_in(key, 1), (L, D)) * 0.1,
    }
    x = jax.random.normal(jax.random.fold_in(key, 2), (B, 5, D))

    def block(lp, c):
        return c + jnp.tanh(c @ lp["w"] + lp["b"])

    def seq_loss(layers, x):
        out, _ = jax.lax.scan(lambda c, lp: (block(lp, c), None), x, layers)
        return jnp.sum(out**2)

    want = jax.grad(seq_loss, argnums=(0, 1))(layers, x)
    mesh = make_pipeline_mesh(4)
    for remat in (False, True):
        got = jax.jit(jax.grad(
            lambda l, c: jnp.sum(
                pipelined_scan(mesh, l, c, block, n_micro=2, remat=remat)**2
            ),
            argnums=(0, 1),
        ))(layers, x)
        for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=5e-5, rtol=2e-4)


def test_pipelined_train_step_matches_sequential():
    """A full Trainer optimizer step with TrainConfig.pipeline_stages=4
    (GPipe backbone fwd+bwd over a (data=2, pipe=4) mesh) reproduces the
    plain data-parallel step: same loss, same updated params."""
    import numpy as np

    import jax

    from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
    from cognitive_aim_tpu.models.config import ModelArchConfig
    from cognitive_aim_tpu.nn.dinov2 import DinoV2Config
    from cognitive_aim_tpu.train.trainer import TrainConfig, Trainer

    vit = DinoV2Config(hidden_size=64, num_layers=4, num_heads=4,
                       patch_size=14, pretrain_image_size=56)
    arch = ModelArchConfig(num_iterations=2, image_size=56,
                           freeze_backbone=False, use_lora=False)
    model = CognitiveAimModel(arch, vit_cfg=vit)
    # host copy: each Trainer donates its params into the jitted step, and
    # device_put can REUSE the input buffer — two Trainers sharing one
    # device pytree would see deleted arrays
    params = jax.device_get(model.init(jax.random.PRNGKey(0)))

    rng = np.random.RandomState(0)
    B = 8
    batch = {
        "images": rng.randn(B, 56, 56, 3).astype(np.float32) * 0.5,
        "depths": np.abs(rng.randn(B).astype(np.float32)) + 0.5,
        "exif": {
            "camera_idx": np.zeros(B, np.int32),
            "focal_length": np.full(B, 0.25, np.float32),
            "aperture": np.full(B, 0.127, np.float32),
            "iso": np.full(B, 0.016, np.float32),
        },
    }

    def one_step(**cfg_over):
        cfg = TrainConfig(epochs=1, batch_size=B, steps_per_epoch=2,
                          freeze_backbone=False, **cfg_over)
        tr = Trainer(model, params, cfg, output_dir="/tmp/pp_train_test")
        logs = tr.train_step(batch, jax.random.PRNGKey(7))
        return float(logs["loss"]), jax.device_get(tr.params)

    loss_seq, p_seq = one_step()
    loss_pp, p_pp = one_step(pipeline_stages=4, pipeline_n_micro=2)
    assert abs(loss_pp - loss_seq) < 1e-4 * max(1.0, abs(loss_seq))
    # atol 1e-4: AdamW's normalized update turns the pipelined backbone's
    # ~1e-5 accumulation-order difference into O(lr)-scale param deltas on
    # near-zero weights; loss parity above is the strict check
    for a, b in zip(jax.tree.leaves(p_pp), jax.tree.leaves(p_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=2e-3)

    import pytest

    with pytest.raises(ValueError, match="mutually exclusive"):
        Trainer(model, params,
                TrainConfig(pipeline_stages=4, tensor_parallel=True),
                output_dir="/tmp/pp_train_test")


def test_pipelined_scan_rejects_bad_shapes():
    import pytest

    import jax
    import jax.numpy as jnp

    from cognitive_aim_tpu.parallel.pipeline import (
        make_pipeline_mesh,
        pipelined_scan,
    )

    mesh = make_pipeline_mesh(4)
    layers = {"w": jnp.zeros((6, 3, 3))}  # 6 layers don't divide 4 stages
    with pytest.raises(ValueError):
        pipelined_scan(mesh, layers, jnp.zeros((4, 3)), lambda lp, c: c, 2)
    with pytest.raises(ValueError):
        make_pipeline_mesh(3)  # 3 stages don't divide 8 devices

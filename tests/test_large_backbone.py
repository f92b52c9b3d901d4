"""`backbone_size: large` path: dims resolve (1024-d, 16 heads, 24 layers —
ref:src/model.py:807-809), streams/curiosity adapt, forward runs (tiny
layer-count override for CPU speed)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
from cognitive_aim_tpu.models.config import ModelArchConfig, resolve_model_config
from cognitive_aim_tpu.nn import dinov2


def test_large_dims_resolve():
    arch = resolve_model_config({"backbone_size": "large"})
    assert arch.feature_dim == 1024
    cfg = dinov2.config_for("large")
    assert cfg.hidden_size == 1024 and cfg.num_heads == 16 and cfg.num_layers == 24


def test_large_forward_runs():
    arch = ModelArchConfig(backbone_size="large", num_iterations=2,
                           image_size=28, num_cameras=3)
    vit = dataclasses.replace(dinov2.config_for("large"), num_layers=2,
                              pretrain_image_size=28)
    model = CognitiveAimModel(arch, vit_cfg=vit)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 28, 28, 3), jnp.float32)
    exif = {
        "camera_idx": jnp.zeros((2,), jnp.int32),
        "focal_length": jnp.full((2,), 50.0),
        "aperture": jnp.full((2,), 2.8),
        "iso": jnp.full((2,), 100.0),
    }
    out = model.apply(params, x, exif, guidance=0, rng=jax.random.PRNGKey(1))
    assert out.depth.shape == (2, 1) and np.all(np.asarray(out.depth) > 0)
    assert out.attention.shape == (2, 4)  # 2x2 grid at 28^2/patch14

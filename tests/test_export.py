"""jax.export AOT serving artifact (scripts/export_model.py contract):
serialize the guided forward, deserialize, and reproduce the live outputs.
The reference has no deploy story beyond eager torch demo.py."""

import jax
import jax.numpy as jnp
import numpy as np

from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
from cognitive_aim_tpu.models.config import ModelArchConfig
from cognitive_aim_tpu.nn.dinov2 import DinoV2Config


def test_export_roundtrip_tiny():
    from jax import export as jexport

    vit = DinoV2Config(hidden_size=64, num_layers=2, num_heads=4,
                       pretrain_image_size=56, patch_size=14)
    arch = ModelArchConfig(num_iterations=2, image_size=56)
    model = CognitiveAimModel(arch, vit_cfg=vit)
    params = model.prepare_params(model.init(jax.random.PRNGKey(0)))
    B = 2
    images = jax.random.normal(jax.random.PRNGKey(1), (B, 56, 56, 3))
    exif = {
        "camera_idx": jnp.zeros((B,), jnp.int32),
        "focal_length": jnp.full((B,), 50.0),
        "aperture": jnp.full((B,), 2.8),
        "iso": jnp.full((B,), 100.0),
    }
    gidx = jnp.zeros((B,), jnp.int32)
    key = jax.random.PRNGKey(0)

    def serve(p, x, e, g):
        out = model.apply(p, x, e, guidance=g, rng=key)
        return out.depth, out.confidence

    exported = jexport.export(jax.jit(serve))(params, images, exif, gidx)
    blob = exported.serialize()
    assert len(blob) > 1000
    rt = jexport.deserialize(blob)
    d0, c0 = jax.jit(serve)(params, images, exif, gidx)
    # consumer contract: params rebuilt from the name-keyed npz alone (the
    # scripts/export_model.py artifact pair needs no model definition)
    import io as _io

    from cognitive_aim_tpu.api import flatten_tree, unflatten_npz

    buf = _io.BytesIO()
    np.savez(buf, **flatten_tree(params))
    buf.seek(0)
    params_rt = unflatten_npz(np.load(buf))
    d1, c1 = rt.call(params_rt, images, exif, gidx)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), rtol=2e-5)

"""Token-filtering fast path (nn/dinov2.py filter_layer/filter_keep).

Opt-in approximation with no reference equivalent (the reference always
runs all tokens, ref:src/model.py:973-975); these tests pin its contract:
keep-all is exact, the output keeps full shape/order, guided-region tokens
are always kept, and the model-level config threads through.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cognitive_aim_tpu.nn import dinov2


CFG = dinov2.DinoV2Config(
    hidden_size=64, num_layers=4, num_heads=4, pretrain_image_size=56,
    patch_size=14,
)


@pytest.fixture(scope="module")
def setup():
    params = dinov2.init(jax.random.PRNGKey(0), CFG)
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    return params, images  # 4x4 grid -> 16 patch tokens


def test_keep_all_is_exact(setup):
    params, images = setup
    ref = dinov2.apply(params, images, CFG)
    # keep=0.999 rounds to k=16=P: the filter machinery runs (gather, split
    # scan, scatter) but must reproduce the unfiltered forward exactly
    out = dinov2.apply(params, images, CFG, filter_layer=2, filter_keep=0.999)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_filtered_shape_and_frozen_tokens(setup):
    params, images = setup
    out = dinov2.apply(params, images, CFG, filter_layer=2, filter_keep=0.25)
    assert out.shape == (2, 17, 64)
    assert np.all(np.isfinite(np.asarray(out)))
    # with k=4 of 16 kept, at least one patch token must differ from the
    # exact forward (the dropped ones are frozen at their layer-2 state)
    ref = dinov2.apply(params, images, CFG)
    assert not np.allclose(np.asarray(out[:, 1:]), np.asarray(ref[:, 1:]))


def test_guided_region_always_kept(setup):
    params, images = setup
    x = dinov2._embed(params, images, CFG, jnp.float32)
    first = jax.tree.map(lambda a: a[0], params["layers"])
    imp = dinov2._cls_importance(first, x, CFG)
    assert imp.shape == (2, 16)
    # guidance weights >1 on tokens 5..8 must force them into the kept set
    kw = np.ones((2, 16), np.float32)
    kw[:, 5:9] = 5.0
    _, idx = dinov2._filter_tokens(x, imp, jnp.asarray(kw), 6)
    idx = np.asarray(idx)
    for b in range(2):
        assert {5, 6, 7, 8}.issubset(set(idx[b].tolist()))
        assert np.all(np.diff(idx[b]) > 0)  # ascending (spatial order kept)


def test_fused_context_token(setup):
    params, images = setup
    x = dinov2._embed(params, images, CFG, jnp.float32)
    first = jax.tree.map(lambda a: a[0], params["layers"])
    imp = dinov2._cls_importance(first, x, CFG)
    xf, idx = dinov2._filter_tokens(x, imp, None, 4, fuse=True)
    assert xf.shape == (2, 1 + 4 + 1, 64)
    # the fused token is the importance-weighted mean of the DROPPED tokens
    idx_np = np.asarray(idx)
    for b in range(2):
        dropped = sorted(set(range(16)) - set(idx_np[b].tolist()))
        w = np.asarray(imp)[b, dropped]
        expect = (np.asarray(x)[b, 1:][dropped] * w[:, None]).sum(0) / (
            w.sum() + 1e-9
        )
        np.testing.assert_allclose(np.asarray(xf)[b, -1], expect, atol=1e-5)
    # scatter must discard it and restore full length
    out = dinov2._scatter_tokens(x, xf, idx)
    assert out.shape == x.shape
    # output with fuse on still finite end-to-end
    full = dinov2.apply(params, images, CFG, filter_layer=2,
                        filter_keep=0.25, filter_fuse=True)
    assert np.all(np.isfinite(np.asarray(full)))


def test_model_level_threading():
    from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
    from cognitive_aim_tpu.models.config import ModelArchConfig

    arch = ModelArchConfig(
        num_iterations=2, image_size=56, token_filter_layer=2,
        token_filter_keep=0.5,
    )
    model = CognitiveAimModel(arch, vit_cfg=CFG)
    params = model.init(jax.random.PRNGKey(0))
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    exif = {
        "camera_idx": jnp.zeros((2,), jnp.int32),
        "focal_length": jnp.full((2,), 50.0),
        "aperture": jnp.full((2,), 2.8),
        "iso": jnp.full((2,), 100.0),
    }
    out = model.apply(params, images, exif, guidance=jnp.array([0, 3]),
                      rng=jax.random.PRNGKey(2))
    assert out.depth.shape == (2, 1)
    assert np.all(np.isfinite(np.asarray(out.depth)))
    # train path must bypass the filter (uses the exact backbone)
    out_t = model.apply(params, images, exif, guidance=jnp.array([0, 3]),
                        rng=jax.random.PRNGKey(2), train=True)
    assert np.all(np.isfinite(np.asarray(out_t.depth)))


def test_filtered_forward_dp_sharded():
    """The filtered guided forward (top_k + gather + scatter) composes with
    a data-parallel NamedSharding over the 8-virtual-device mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
    from cognitive_aim_tpu.models.config import ModelArchConfig

    assert jax.device_count() == 8
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    arch = ModelArchConfig(
        num_iterations=2, image_size=56, token_filter_layer=2,
        token_filter_keep=0.5,
    )
    model = CognitiveAimModel(arch, vit_cfg=CFG)
    params = model.init(jax.random.PRNGKey(0))
    images = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (16, 56, 56, 3)),
        NamedSharding(mesh, P("data")),
    )
    exif = {
        "camera_idx": jnp.zeros((16,), jnp.int32),
        "focal_length": jnp.full((16,), 50.0),
        "aperture": jnp.full((16,), 2.8),
        "iso": jnp.full((16,), 100.0),
    }
    exif = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
            for k, v in exif.items()}
    gidx = jax.device_put(
        jnp.arange(16, dtype=jnp.int32) % 9, NamedSharding(mesh, P("data"))
    )
    fwd = jax.jit(lambda p, x, e, g: model.apply(
        p, x, e, guidance=g, rng=jax.random.PRNGKey(2)
    ))
    out = fwd(params, images, exif, gidx)
    assert out.depth.shape == (16, 1)
    assert np.all(np.isfinite(np.asarray(out.depth)))


def test_config_resolver_reads_token_filter():
    from cognitive_aim_tpu.models.config import resolve_model_config

    raw = {"model": {"token_filter_layer": 4, "token_filter_keep": 0.35}}
    arch = resolve_model_config(raw)
    assert arch.token_filter_layer == 4
    assert arch.token_filter_keep == 0.35
    # absent -> off (exact path)
    arch2 = resolve_model_config({})
    assert arch2.token_filter_layer == 0
    assert arch2.token_filter_keep == 1.0

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


def test_stratified_fused_context_tokens(setup):
    """@f4: one context token per 2x2 spatial cell of the 4x4 grid —
    each is the importance-weighted mean of ITS cell's dropped tokens, so
    regional aggregates survive the drop (the binding failure mode of the
    global-aggregation depth laws, docs/PERF.md)."""
    params, images = setup
    x = dinov2._embed(params, images, CFG, jnp.float32)
    first = jax.tree.map(lambda a: a[0], params["layers"])
    imp = dinov2._cls_importance(first, x, CFG)
    # 4x4 grid, quadrants of 2x2
    groups = np.asarray(
        [(r // 2) * 2 + (c // 2) for r in range(4) for c in range(4)],
        np.int32)
    xf, idx = dinov2._filter_tokens(x, imp, None, 4, fuse=True,
                                    fuse_groups=groups)
    assert xf.shape == (2, 1 + 4 + 4, 64)
    idx_np = np.asarray(idx)
    for b in range(2):
        dropped = sorted(set(range(16)) - set(idx_np[b].tolist()))
        for g in range(4):
            dg = [p for p in dropped if groups[p] == g]
            w = np.asarray(imp)[b, dg]
            expect = (np.asarray(x)[b, 1:][dg] * w[:, None]).sum(0) / (
                w.sum() + 1e-9)
            np.testing.assert_allclose(np.asarray(xf)[b, 5 + g], expect,
                                       atol=1e-5)
    # scatter discards all G context tokens and restores full length
    out = dinov2._scatter_tokens(x, xf, idx)
    assert out.shape == x.shape
    # end-to-end: single-stage and progressive, finite and full-shape
    for kw in (dict(filter_layer=2, filter_keep=0.25),
               dict(filter_schedule=((1, 0.5), (2, 0.25)))):
        full = dinov2.apply(params, images, CFG, filter_fuse=True,
                            filter_fuse_k=4, **kw)
        assert full.shape == (2, 17, 64)
        assert np.all(np.isfinite(np.asarray(full)))


def test_fuse_k_progressive_accumulates_per_group(setup):
    """Stage 2+ re-fusion stays group-local: each new context token folds
    in only its own group's newly dropped tokens plus the group's OLD
    context token (weighted by the fused slots' own importances)."""
    params, images = setup
    x = dinov2._embed(params, images, CFG, jnp.float32)
    first = jax.tree.map(lambda a: a[0], params["layers"])
    imp = dinov2._cls_importance(first, x, CFG)
    groups = np.asarray(
        [(r // 2) * 2 + (c // 2) for r in range(4) for c in range(4)],
        np.int32)
    xf, idx = dinov2._filter_tokens(x, imp, None, 8, fuse=True,
                                    fuse_groups=groups)
    imp2 = dinov2._cls_importance(first, xf, CFG)  # [2, 8+4]
    gg = jnp.asarray(groups)[idx]
    xf2, idx2 = dinov2._refilter_tokens(xf, imp2, 8, None, 4, fuse=True,
                                        groups_gathered=gg, n_groups=4)
    assert xf2.shape == (2, 1 + 4 + 4, 64)
    idx2_np, gg_np = np.asarray(idx2), np.asarray(gg)
    for b in range(2):
        dropped_local = sorted(set(range(8)) - set(idx2_np[b].tolist()))
        for g in range(4):
            dl = [i for i in dropped_local if gg_np[b, i] == g]
            w = np.asarray(imp2)[b, dl]
            num = (np.asarray(xf)[b, 1:9][dl] * w[:, None]).sum(0)
            den = w.sum()
            wf = np.asarray(imp2)[b, 8 + g]
            num = num + np.asarray(xf)[b, 9 + g] * wf
            den = den + wf
            np.testing.assert_allclose(
                np.asarray(xf2)[b, 5 + g], num / (den + 1e-9), atol=1e-5)


def test_fuse_k_empty_group_falls_back_to_group_mean(setup):
    """A spatial cell whose patches are ALL kept (e.g. the guided region
    covers it — guided tiers always outrank background) has no dropped
    tokens; its context token must be the group's importance-weighted
    mean over all its tokens, not a 0/eps zero-vector artifact."""
    params, images = setup
    x = dinov2._embed(params, images, CFG, jnp.float32)
    first = jax.tree.map(lambda a: a[0], params["layers"])
    imp = dinov2._cls_importance(first, x, CFG)
    groups = np.asarray(
        [(r // 2) * 2 + (c // 2) for r in range(4) for c in range(4)],
        np.int32)
    # force group 0 (positions 0,1,4,5) fully into the kept set
    kw = np.ones((2, 16), np.float32)
    kw[:, [0, 1, 4, 5]] = 5.0
    xf, idx = dinov2._filter_tokens(x, imp, jnp.asarray(kw), 4, fuse=True,
                                    fuse_groups=groups, fuse_n_groups=4)
    idx_np = np.asarray(idx)
    for b in range(2):
        assert set(idx_np[b].tolist()) == {0, 1, 4, 5}
        w = np.asarray(imp)[b, [0, 1, 4, 5]]
        expect = (np.asarray(x)[b, 1:][[0, 1, 4, 5]] * w[:, None]).sum(0) \
            / (w.sum() + 1e-9)
        got = np.asarray(xf)[b, 5]  # group 0's context token
        np.testing.assert_allclose(got, expect, atol=1e-5)
        assert np.abs(got).max() > 1e-3  # not a zero vector


def test_fuse_k_sparse_grid_densifies():
    """fuse_k larger than the grid allows: on a 2x2 patch grid, q=4 cell
    ids are sparse ({0,2,8,10}); they must densify so every stage agrees
    on the context-token count (round-3 review finding: the mismatch
    silently discarded all accumulated context at stage 2+)."""
    cfg28 = dinov2.DinoV2Config(
        hidden_size=64, num_layers=4, num_heads=4, pretrain_image_size=28,
        patch_size=14)
    params = dinov2.init(jax.random.PRNGKey(0), cfg28)
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
    out = dinov2.apply(params, images, cfg28, filter_fuse=True,
                       filter_fuse_k=16,
                       filter_schedule=((1, 0.8), (2, 0.3)))
    assert out.shape == (2, 5, 64)
    assert np.all(np.isfinite(np.asarray(out)))


def test_refilter_fused_count_mismatch_raises(setup):
    params, images = setup
    x = dinov2._embed(params, images, CFG, jnp.float32)
    first = jax.tree.map(lambda a: a[0], params["layers"])
    imp = dinov2._cls_importance(first, x, CFG)
    groups = np.asarray([0] * 8 + [1] * 8, np.int32)
    xf, idx = dinov2._filter_tokens(x, imp, None, 8, fuse=True,
                                    fuse_groups=groups, fuse_n_groups=2)
    imp2 = dinov2._cls_importance(first, xf, CFG)
    gg = jnp.asarray(groups)[idx]
    with pytest.raises(ValueError, match="mismatch"):
        dinov2._refilter_tokens(xf, imp2, 8, None, 4, fuse=True,
                                groups_gathered=gg, n_groups=4)


def test_parse_token_filter_fuse_k():
    from cognitive_aim_tpu.models.config import (
        ModelArchConfig,
        parse_token_filter,
    )

    kw = parse_token_filter("2:0.25@f4")
    assert kw["token_filter_fuse_k"] == 4
    assert kw["token_filter_layer"] == 2
    a = ModelArchConfig(**kw)
    assert a.token_filter_active and a.token_filter_fuse_k == 4
    # non-square and mode conflicts rejected at apply time
    with pytest.raises(ValueError):
        dinov2.apply(
            dinov2.init(jax.random.PRNGKey(0), CFG),
            jax.random.normal(jax.random.PRNGKey(1), (1, 56, 56, 3)),
            CFG, filter_layer=2, filter_keep=0.25, filter_fuse_k=3)


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


def test_model_level_fuse_k():
    """token_filter_fuse_k threads arch -> backbone: guided model forward
    with 4 stratified context tokens stays finite and full-shape."""
    from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
    from cognitive_aim_tpu.models.config import ModelArchConfig

    arch = ModelArchConfig(
        num_iterations=2, image_size=56,
        token_filter_schedule=((1, 0.5), (2, 0.25)), token_filter_fuse_k=4,
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


def test_progressive_schedule_shapes_and_freeze(setup):
    """Multi-stage schedule: full output shape/order preserved; tokens
    dropped at stage i freeze at stage-i values (they differ from both the
    exact forward and the embedding)."""
    params, images = setup
    out = dinov2.apply(params, images, CFG,
                       filter_schedule=((1, 0.6), (2, 0.4), (3, 0.25)))
    assert out.shape == (2, 17, 64)
    assert np.all(np.isfinite(np.asarray(out)))
    ref = dinov2.apply(params, images, CFG)
    assert not np.allclose(np.asarray(out[:, 1:]), np.asarray(ref[:, 1:]))
    # CLS always survives all stages and carries the full computation
    # depth, so it should be much closer to the exact CLS than the frozen
    # background tokens are to theirs
    cls_err = np.abs(np.asarray(out[:, 0]) - np.asarray(ref[:, 0])).mean()
    patch_err = np.abs(np.asarray(out[:, 1:]) - np.asarray(ref[:, 1:])).mean()
    assert cls_err < patch_err


def test_progressive_single_stage_equals_legacy(setup):
    """A one-entry schedule must match the legacy filter_layer/filter_keep
    path bit-for-bit (same code path, same rounding)."""
    params, images = setup
    a = dinov2.apply(params, images, CFG, filter_layer=2, filter_keep=0.5)
    b = dinov2.apply(params, images, CFG, filter_schedule=((2, 0.5),))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_progressive_guided_region_survives_all_stages(setup):
    """Guidance priority is re-applied (gathered at surviving indices) at
    every stage: the guided tokens must be in the FINAL kept set."""
    params, images = setup
    kw = np.ones((2, 16), np.float32)
    kw[:, 5:9] = 5.0
    # run the real forward and recover the final kept set by checking which
    # tokens changed after the last stage vs a frozen-at-stage copy
    out = dinov2.apply(params, images, CFG,
                       filter_schedule=((1, 0.6), (3, 0.25)),
                       keep_weights=jnp.asarray(kw), filter_fuse=False)
    # k_final = round(.25*16) = 4 = number of guided tokens; the guided
    # tokens are the final kept set, so they must differ from a forward
    # truncated at the last filter layer (they kept computing), while
    # most background tokens froze earlier
    assert np.all(np.isfinite(np.asarray(out)))
    # direct unit check of the refilter stage
    x = dinov2._embed(params, images, CFG, jnp.float32)
    first = jax.tree.map(lambda a: a[0], params["layers"])
    imp = dinov2._cls_importance(first, x, CFG)
    xf, idx1 = dinov2._filter_tokens(x, imp, jnp.asarray(kw), 10, fuse=True)
    imp2 = dinov2._cls_importance(first, xf, CFG)
    kw_g = jnp.take_along_axis(jnp.asarray(kw), idx1, axis=1)
    xf2, idx_local = dinov2._refilter_tokens(xf, imp2, 10, kw_g, 4,
                                             fuse=True)
    assert xf2.shape == (2, 1 + 4 + 1, 64)
    idx_global = np.take_along_axis(np.asarray(idx1), np.asarray(idx_local),
                                    axis=1)
    for b in range(2):
        assert set(idx_global[b].tolist()) == {5, 6, 7, 8}


def test_refilter_refuses_context_token_math(setup):
    """Stage-2 fused token = importance-weighted mean of (newly dropped
    patches + old fused token)."""
    params, images = setup
    x = dinov2._embed(params, images, CFG, jnp.float32)
    first = jax.tree.map(lambda a: a[0], params["layers"])
    imp = dinov2._cls_importance(first, x, CFG)
    xf, idx1 = dinov2._filter_tokens(x, imp, None, 8, fuse=True)
    imp2 = dinov2._cls_importance(first, xf, CFG)
    xf2, idx_local = dinov2._refilter_tokens(xf, imp2, 8, None, 3, fuse=True)
    assert xf2.shape == (2, 1 + 3 + 1, 64)
    imp2_np, xf_np = np.asarray(imp2), np.asarray(xf)
    il = np.asarray(idx_local)
    for b in range(2):
        dropped = sorted(set(range(8)) - set(il[b].tolist()))
        w = imp2_np[b, dropped]
        num = (xf_np[b, 1:9][dropped] * w[:, None]).sum(0)
        den = w.sum()
        w_f = imp2_np[b, 8]  # old fused token's importance column
        num += xf_np[b, 9] * w_f
        den += w_f
        np.testing.assert_allclose(np.asarray(xf2)[b, -1], num / (den + 1e-9),
                                   atol=1e-5)


def test_schedule_validation(setup):
    params, images = setup
    with pytest.raises(ValueError):
        dinov2.apply(params, images, CFG,
                     filter_schedule=((2, 0.5), (2, 0.25)))  # dup layer
    with pytest.raises(ValueError):
        dinov2.apply(params, images, CFG,
                     filter_schedule=((1, 0.25), (2, 0.5)))  # keep increases


def test_parse_token_filter_schedule():
    from cognitive_aim_tpu.models.config import parse_token_filter

    assert parse_token_filter("") == {}
    assert parse_token_filter("2:0.25") == {
        "token_filter_layer": 2, "token_filter_keep": 0.25}
    assert parse_token_filter("1:0.6,3:0.4,5:0.25") == {
        "token_filter_schedule": ((1, 0.6), (3, 0.4), (5, 0.25))}
    assert parse_token_filter("1:0.6,3:0.4@r0.5") == {
        "token_filter_schedule": ((1, 0.6), (3, 0.4)),
        "token_filter_rollout": 0.5}
    with pytest.raises(ValueError):
        parse_token_filter("1:0.6@x2")


def test_progressive_rollout_ranking(setup):
    """filter_rollout blends carried importance into later-stage ranking:
    with r=1.0 the stage-2 ranking must reproduce stage-1's order (fresh
    attention fully ignored), so the kept set is the stage-1 top-k."""
    params, images = setup
    out = dinov2.apply(params, images, CFG,
                       filter_schedule=((1, 0.6), (3, 0.25)),
                       filter_rollout=0.5)
    assert out.shape == (2, 17, 64)
    assert np.all(np.isfinite(np.asarray(out)))
    # direct unit check: r=1 keeps stage-1 order
    x = dinov2._embed(params, images, CFG, jnp.float32)
    first = jax.tree.map(lambda a: a[0], params["layers"])
    imp1 = dinov2._cls_importance(first, x, CFG)
    xf, idx1 = dinov2._filter_tokens(x, imp1, None, 8, fuse=False)
    carried = jnp.take_along_axis(imp1, idx1, axis=1)
    # blended importance with r=1 == carried; top-3 of carried must equal
    # the local indices of the 3 highest stage-1 importances
    _, idx_local = dinov2._refilter_tokens(xf, carried, 8, None, 3,
                                           fuse=False)
    want = np.sort(np.argsort(-np.asarray(carried), axis=1)[:, :3], axis=1)
    np.testing.assert_array_equal(np.asarray(idx_local), want)


def test_model_level_progressive():
    from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
    from cognitive_aim_tpu.models.config import ModelArchConfig

    arch = ModelArchConfig(
        num_iterations=2, image_size=56,
        token_filter_schedule=((1, 0.6), (2, 0.3)),
    )
    assert arch.token_filter_active
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


def test_config_resolver_reads_token_filter():
    from cognitive_aim_tpu.models.config import resolve_model_config

    raw = {"model": {"token_filter_layer": 4, "token_filter_keep": 0.35}}
    arch = resolve_model_config(raw)
    assert arch.token_filter_layer == 4
    assert arch.token_filter_keep == 0.35
    raw_s = {"model": {"token_filter_schedule": [[1, 0.6], [3, 0.3]]}}
    assert resolve_model_config(raw_s).token_filter_schedule == (
        (1, 0.6), (3, 0.3))
    # absent -> off (exact path)
    arch2 = resolve_model_config({})
    assert arch2.token_filter_layer == 0
    assert arch2.token_filter_keep == 1.0


# ---------------------------------------------------------------- merge mode


def test_merge_keep_all_is_exact(setup):
    params, images = setup
    ref = dinov2.apply(params, images, CFG)
    out = dinov2.apply(params, images, CFG, filter_layer=2,
                       filter_keep=0.999, filter_merge=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_merge_unit_math(setup):
    """_filter_tokens_merge vs a numpy reference: assignment by cosine over
    keys, group-mean merging, rep map, size conservation."""
    params, images = setup
    x = dinov2._embed(params, images, CFG, jnp.float32)
    first = jax.tree.map(lambda a: a[0], params["layers"])
    imp, keys = dinov2._cls_importance(first, x, CFG, return_keys=True)
    assert keys.shape == (2, 17, 64)
    xf, idx, rep, sizes = dinov2._filter_tokens_merge(x, imp, keys, None, 6)
    assert xf.shape == (2, 7, 64)
    assert rep.shape == (2, 16)
    x_np, imp_np, keys_np = map(np.asarray, (x, imp, keys))
    idx_np, rep_np, sizes_np = map(np.asarray, (idx, rep, sizes))
    for b in range(2):
        kept = sorted(np.argsort(-imp_np[b])[:6].tolist())
        assert kept == idx_np[b].tolist()
        dropped = sorted(set(range(16)) - set(kept))
        kn = keys_np[b, 1:]
        kn = kn / np.linalg.norm(kn, axis=-1, keepdims=True)
        sim = kn[dropped] @ kn[kept].T
        assign = sim.argmax(-1)
        groups = [[x_np[b, 1 + p]] for p in kept]
        for j, p in enumerate(dropped):
            groups[assign[j]].append(x_np[b, 1 + p])
            assert rep_np[b, p] == assign[j]
        for i, p in enumerate(kept):
            assert rep_np[b, p] == i
            np.testing.assert_allclose(
                np.asarray(xf)[b, 1 + i], np.mean(groups[i], axis=0),
                atol=1e-5)
            assert sizes_np[b, i] == len(groups[i])
    assert np.all(sizes_np.sum(axis=1) == 16)  # every token accounted for


def test_merge_forward_no_stale_positions(setup):
    """End-to-end merge forward: every dropped position carries its
    representative's FINAL feature, so the patch block has at most k
    distinct rows — and none of them equals a frozen early-layer value."""
    params, images = setup
    out = dinov2.apply(params, images, CFG, filter_layer=2,
                       filter_keep=0.25, filter_merge=True)
    assert out.shape == (2, 17, 64)
    assert np.all(np.isfinite(np.asarray(out)))
    for b in range(2):
        uniq = np.unique(np.asarray(out)[b, 1:], axis=0)
        assert uniq.shape[0] <= 4  # k = round(.25 * 16)
    # CLS carries full depth: closer to exact than the merged patches are
    ref = dinov2.apply(params, images, CFG)
    cls_err = np.abs(np.asarray(out[:, 0]) - np.asarray(ref[:, 0])).mean()
    patch_err = np.abs(np.asarray(out[:, 1:]) - np.asarray(ref[:, 1:])).mean()
    assert cls_err < patch_err


def test_merge_guided_region_kept(setup):
    """Merge mode uses the same priority formula: guided tokens stay."""
    params, images = setup
    x = dinov2._embed(params, images, CFG, jnp.float32)
    first = jax.tree.map(lambda a: a[0], params["layers"])
    imp, keys = dinov2._cls_importance(first, x, CFG, return_keys=True)
    kw = np.ones((2, 16), np.float32)
    kw[:, 5:9] = 5.0
    _, idx, rep, _ = dinov2._filter_tokens_merge(
        x, imp, keys, jnp.asarray(kw), 6)
    idx = np.asarray(idx)
    for b in range(2):
        assert {5, 6, 7, 8}.issubset(set(idx[b].tolist()))


def test_progressive_merge_schedule(setup):
    """Two-stage merge: shapes hold, rep composition stays in range, and
    sizes still sum to P after size-weighted re-merging."""
    params, images = setup
    out = dinov2.apply(params, images, CFG,
                       filter_schedule=((1, 0.6), (3, 0.25)),
                       filter_merge=True)
    assert out.shape == (2, 17, 64)
    assert np.all(np.isfinite(np.asarray(out)))
    for b in range(2):
        uniq = np.unique(np.asarray(out)[b, 1:], axis=0)
        assert uniq.shape[0] <= 4
    # unit: compose the two stages by hand and check size conservation
    x = dinov2._embed(params, images, CFG, jnp.float32)
    first = jax.tree.map(lambda a: a[0], params["layers"])
    imp, keys = dinov2._cls_importance(first, x, CFG, return_keys=True)
    xf, idx1, rep1, sizes1 = dinov2._filter_tokens_merge(x, imp, keys,
                                                         None, 10)
    imp2, keys2 = dinov2._cls_importance(first, xf, CFG, return_keys=True)
    xf2, idx_l, smap, sizes2 = dinov2._refilter_tokens_merge(
        xf, imp2, keys2, 10, None, 4, sizes1)
    assert xf2.shape == (2, 5, 64)
    rep = jnp.take_along_axis(smap, rep1, axis=1)
    assert np.asarray(rep).max() < 4 and np.asarray(rep).min() >= 0
    np.testing.assert_allclose(np.asarray(sizes2).sum(axis=1),
                               np.full(2, 16.0), atol=1e-4)
    # size-weighted merge: each new slot's size counts every original token
    rep_np = np.asarray(rep)
    for b in range(2):
        counts = np.bincount(rep_np[b], minlength=4).astype(np.float64)
        np.testing.assert_allclose(np.asarray(sizes2)[b], counts, atol=1e-4)


def test_parse_token_filter_merge():
    from cognitive_aim_tpu.models.config import parse_token_filter

    assert parse_token_filter("2:0.25@m") == {
        "token_filter_layer": 2, "token_filter_keep": 0.25,
        "token_filter_merge": True}
    assert parse_token_filter("1:0.5,3:0.3@m@r0.5") == {
        "token_filter_schedule": ((1, 0.5), (3, 0.3)),
        "token_filter_merge": True, "token_filter_rollout": 0.5}
    with pytest.raises(ValueError):
        parse_token_filter("2:0.25@z")


def test_model_level_merge_and_train_filter():
    """@m threads through the model config; token_filter_train keeps the
    filter active under train=True (filter-aware finetuning) with finite
    gradients — without it, training silently bypasses the filter."""
    from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
    from cognitive_aim_tpu.models.config import ModelArchConfig
    from cognitive_aim_tpu.core.rng import NoiseMode

    arch = ModelArchConfig(
        num_iterations=2, image_size=56, token_filter_layer=2,
        token_filter_keep=0.5, token_filter_merge=True,
        token_filter_train=True,
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

    def loss(p):
        out = model.apply(p, images, exif, guidance=jnp.array([0, 3]),
                          rng=jax.random.PRNGKey(2), train=True,
                          noise_mode=NoiseMode.ZEROS)
        return jnp.mean(out.depth)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in leaves)
    assert total > 0.0
    # filtered-train forward differs from the exact-train forward (the
    # filter really was active under train=True)
    arch_off = ModelArchConfig(num_iterations=2, image_size=56)
    model_off = CognitiveAimModel(arch_off, vit_cfg=CFG)
    out_f = model.apply(params, images, exif, guidance=jnp.array([0, 3]),
                        rng=jax.random.PRNGKey(2), train=True,
                        noise_mode=NoiseMode.ZEROS)
    out_e = model_off.apply(params, images, exif, guidance=jnp.array([0, 3]),
                            rng=jax.random.PRNGKey(2), train=True,
                            noise_mode=NoiseMode.ZEROS)
    assert not np.allclose(np.asarray(out_f.depth), np.asarray(out_e.depth))


# ---------------------------------------------------- delta-corrected drop


def test_delta_correct_keep_all_is_exact(setup):
    params, images = setup
    ref = dinov2.apply(params, images, CFG)
    out = dinov2.apply(params, images, CFG, filter_layer=2,
                       filter_keep=0.999, filter_delta_correct=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_delta_correct_reconstruction_math(setup):
    """@d output: kept positions = exact short-stream finals; dropped
    position j = its filter-point feature + (rep final - rep filter-point).
    Verified by reconstructing from the drop-mode building blocks."""
    params, images = setup
    out = dinov2.apply(params, images, CFG, filter_layer=2,
                       filter_keep=0.5, filter_delta_correct=True,
                       filter_fuse=False)
    drop = dinov2.apply(params, images, CFG, filter_layer=2,
                        filter_keep=0.5, filter_fuse=False)
    assert out.shape == drop.shape == (2, 17, 64)
    # recover the kept set + assignment exactly as apply() does
    x = dinov2._embed(params, images, CFG, jnp.float32)
    seg = jax.tree.map(lambda a: a[:2], params["layers"])

    def body(c, lp):
        return dinov2._block(lp, c, CFG, "xla"), None

    xf, _ = jax.lax.scan(body, x, seg)
    lp2 = jax.tree.map(lambda a: a[2], params["layers"])
    imp, keys = dinov2._cls_importance(lp2, xf, CFG, return_keys=True)
    _, idx = dinov2._filter_tokens(xf, imp, None, 8)
    idx_drop, assign = dinov2._assign_dropped(imp, keys, None, idx, 8)
    out_np, drop_np, xf_np = map(np.asarray, (out, drop, xf))
    idx_np, idxd_np, as_np = map(np.asarray, (idx, idx_drop, assign))
    # the final norm is applied after reconstruction, so compare through it:
    # kept positions agree with drop mode bit-for-bit (same backbone)
    for b in range(2):
        for i, p in enumerate(idx_np[b]):
            np.testing.assert_allclose(out_np[b, 1 + p], drop_np[b, 1 + p],
                                       atol=1e-5)
    # dropped positions must DIFFER from drop mode (the correction applied)
    diffs = [not np.allclose(out_np[b, 1 + p], drop_np[b, 1 + p], atol=1e-6)
             for b in range(2) for p in idxd_np[b]]
    assert any(diffs)


def test_delta_correct_error_same_scale_as_drop(setup):
    """Mechanical sanity: the corrected reconstruction stays on the same
    error scale as plain drop vs the exact forward. (Whether it actually
    REDUCES the error depends on neighbouring tokens' residual updates
    correlating — true for trained weights, not for this random-init tiny
    net; the trained-checkpoint comparison lives in scripts/delta_sweep.py
    and docs/PERF.md.)"""
    params, images = setup
    ref = dinov2.apply(params, images, CFG)
    drop = dinov2.apply(params, images, CFG, filter_layer=2,
                        filter_keep=0.5, filter_fuse=False)
    corr = dinov2.apply(params, images, CFG, filter_layer=2,
                        filter_keep=0.5, filter_fuse=False,
                        filter_delta_correct=True)
    e_drop = np.abs(np.asarray(drop) - np.asarray(ref)).mean()
    e_corr = np.abs(np.asarray(corr) - np.asarray(ref)).mean()
    assert np.isfinite(e_corr) and e_corr < 3.0 * e_drop


def test_delta_correct_validation(setup):
    params, images = setup
    with pytest.raises(ValueError):
        dinov2.apply(params, images, CFG, filter_layer=2, filter_keep=0.5,
                     filter_delta_correct=True, filter_merge=True)
    with pytest.raises(ValueError):
        dinov2.apply(params, images, CFG,
                     filter_schedule=((1, 0.6), (2, 0.3)),
                     filter_delta_correct=True)


def test_parse_token_filter_delta():
    from cognitive_aim_tpu.models.config import parse_token_filter

    assert parse_token_filter("2:0.25@d") == {
        "token_filter_layer": 2, "token_filter_keep": 0.25,
        "token_filter_delta_correct": True}


def test_model_level_delta_correct():
    from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
    from cognitive_aim_tpu.models.config import ModelArchConfig

    arch = ModelArchConfig(
        num_iterations=2, image_size=56, token_filter_layer=2,
        token_filter_keep=0.5, token_filter_delta_correct=True,
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


# ------------------------------------------------------- stratified keep


def test_stratified_grid_tokens_kept(setup):
    """@s2 on the 4x4 grid reserves the (2,2)-strided positions (offset 1):
    patch indices {5, 7, 13, 15}; with keep=0.5 (k=8) and no guidance,
    those 4 must all be in the kept set regardless of attention."""
    params, images = setup
    out = dinov2.apply(params, images, CFG, filter_layer=2, filter_keep=0.5,
                       filter_strat_stride=2, filter_fuse=False)
    assert out.shape == (2, 17, 64)
    assert np.all(np.isfinite(np.asarray(out)))
    # unit check through the same machinery: bonus must put grid tokens on top
    x = dinov2._embed(params, images, CFG, jnp.float32)
    first = jax.tree.map(lambda a: a[0], params["layers"])
    imp = dinov2._cls_importance(first, x, CFG)
    m = np.zeros((4, 4), np.float32)
    m[1::2, 1::2] = 1.0
    kw = jnp.asarray(1.0 + 0.25 * m.reshape(-1))[None]
    kw = jnp.broadcast_to(kw, (2, 16))
    _, idx = dinov2._filter_tokens(x, imp, kw, 8)
    for b in range(2):
        assert {5, 7, 13, 15}.issubset(set(np.asarray(idx)[b].tolist()))


def test_stratified_below_guided_tiers(setup):
    """Guided tokens (weight 5.0) still outrank stratified ones when the
    budget is too small for both."""
    params, images = setup
    x = dinov2._embed(params, images, CFG, jnp.float32)
    first = jax.tree.map(lambda a: a[0], params["layers"])
    imp = dinov2._cls_importance(first, x, CFG)
    kw = np.ones((2, 16), np.float32)
    kw[:, 0:4] = 5.0          # guided region: tokens 0-3
    m = np.zeros(16, np.float32)
    m[[5, 7, 13, 15]] = 1.0   # stratified grid
    kw = jnp.asarray(kw) + 0.25 * jnp.asarray(m)[None]
    _, idx = dinov2._filter_tokens(x, imp, kw, 4)
    for b in range(2):
        assert set(np.asarray(idx)[b].tolist()) == {0, 1, 2, 3}


def test_parse_token_filter_strat():
    from cognitive_aim_tpu.models.config import parse_token_filter

    assert parse_token_filter("2:0.25@s3") == {
        "token_filter_layer": 2, "token_filter_keep": 0.25,
        "token_filter_strat_stride": 3}
    assert parse_token_filter("2:0.25@s3@d") == {
        "token_filter_layer": 2, "token_filter_keep": 0.25,
        "token_filter_strat_stride": 3,
        "token_filter_delta_correct": True}


# ------------------------------------------- proportional attention (@p) ----
def test_prop_attn_runs_and_differs(setup):
    """'@p' changes the filtered forward (fused token now carries its
    sources' aggregate softmax mass) and keeps the full output contract."""
    params, images = setup
    base = dinov2.apply(params, images, CFG, filter_layer=2,
                        filter_keep=0.25)
    prop = dinov2.apply(params, images, CFG, filter_layer=2,
                        filter_keep=0.25, filter_prop_attn=True)
    assert prop.shape == base.shape
    assert np.all(np.isfinite(np.asarray(prop)))
    assert not np.allclose(np.asarray(prop), np.asarray(base))


def test_prop_attn_identical_dropped_tokens_recover_exact():
    """End-to-end form of the kernel-level exactness property: when every
    patch token is IDENTICAL, any kept set's fused token equals the
    dropped tokens, and '@p' makes the filtered block attention match the
    full forward exactly (drift comes only from CLS, which is kept). The
    un-biased filter does NOT have this property — its softmax
    renormalizes onto the subsample."""
    params = dinov2.init(jax.random.PRNGKey(0), CFG)
    # identical patch TOKENS: a tiled image + zeroed positional embedding
    # (pos-embed is the only thing distinguishing equal patches)
    params = dict(params)
    params["pos_embed"] = jnp.zeros_like(params["pos_embed"])
    images = jnp.tile(jax.random.normal(jax.random.PRNGKey(1),
                                        (1, 14, 14, 3)), (1, 4, 4, 1))
    ref = dinov2.apply(params, images, CFG)
    prop = dinov2.apply(params, images, CFG, filter_layer=2,
                        filter_keep=0.25, filter_prop_attn=True)
    base = dinov2.apply(params, images, CFG, filter_layer=2,
                        filter_keep=0.25)
    # CLS row: @p tracks the exact path far tighter than the plain filter
    cls_ref = np.asarray(ref[:, 0])
    err_prop = np.abs(np.asarray(prop[:, 0]) - cls_ref).max()
    err_base = np.abs(np.asarray(base[:, 0]) - cls_ref).max()
    assert err_prop < 1e-4, err_prop
    assert err_prop < err_base


def test_prop_attn_requires_represented_tokens(setup):
    params, images = setup
    with pytest.raises(ValueError, match="prop_attn"):
        dinov2.apply(params, images, CFG, filter_layer=2, filter_keep=0.25,
                     filter_fuse=False, filter_prop_attn=True)


def test_prop_attn_merge_mode(setup):
    """ToMe-style size weighting in merge mode runs and changes outputs."""
    params, images = setup
    base = dinov2.apply(params, images, CFG, filter_layer=2,
                        filter_keep=0.25, filter_merge=True)
    prop = dinov2.apply(params, images, CFG, filter_layer=2,
                        filter_keep=0.25, filter_merge=True,
                        filter_prop_attn=True)
    assert prop.shape == base.shape
    assert np.all(np.isfinite(np.asarray(prop)))
    assert not np.allclose(np.asarray(prop), np.asarray(base))


def test_prop_attn_progressive_fuse_k(setup):
    """@p composes with progressive schedules and stratified @f4 groups."""
    params, images = setup
    out = dinov2.apply(params, images, CFG,
                       filter_schedule=((1, 0.5), (2, 0.25)),
                       filter_fuse_k=4, filter_prop_attn=True)
    assert out.shape == (2, 17, 64)
    assert np.all(np.isfinite(np.asarray(out)))


def test_parse_token_filter_prop():
    from cognitive_aim_tpu.models.config import parse_token_filter

    out = parse_token_filter("2:0.25@p")
    assert out["token_filter_prop_attn"] is True
    assert out["token_filter_layer"] == 2
    out = parse_token_filter("1:0.5,2:0.25@f4@p")
    assert out["token_filter_prop_attn"] is True
    assert out["token_filter_fuse_k"] == 4


def test_model_level_prop_attn():
    """token_filter_prop_attn threads from ModelArchConfig through the
    full CognitiveAimModel forward."""
    from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
    from cognitive_aim_tpu.models.config import ModelArchConfig

    vit = dinov2.DinoV2Config(hidden_size=64, num_layers=4, num_heads=4,
                              pretrain_image_size=56, patch_size=14)
    kw = dict(num_iterations=1, image_size=56, num_cameras=4)
    exif = {
        "camera_idx": jnp.zeros((2,), jnp.int32),
        "focal_length": jnp.full((2,), 0.25),
        "aperture": jnp.full((2,), 0.127),
        "iso": jnp.full((2,), 0.016),
    }
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    m0 = CognitiveAimModel(
        ModelArchConfig(token_filter_layer=2, token_filter_keep=0.25, **kw),
        vit_cfg=vit)
    p = m0.init(jax.random.PRNGKey(0))
    m1 = CognitiveAimModel(
        ModelArchConfig(token_filter_layer=2, token_filter_keep=0.25,
                        token_filter_prop_attn=True, **kw),
        vit_cfg=vit)
    o0 = m0.apply(p, images, exif, rng=jax.random.PRNGKey(0))
    o1 = m1.apply(p, images, exif, rng=jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(o1.depth)))
    assert not np.allclose(np.asarray(o0.depth), np.asarray(o1.depth))


# ---- context reserve ('@cF') --------------------------------------------


def test_ctx_reserve_selection(setup):
    """Budget 8, ctx_frac 0.5: 4 slots go to guided priority, 4 to raw
    importance — scene context survives even though the boosted region
    (10 tokens) alone would exhaust the budget."""
    params, images = setup
    x = dinov2._embed(params, images, CFG, jnp.float32)
    first = jax.tree.map(lambda a: a[0], params["layers"])
    imp = dinov2._cls_importance(first, x, CFG)
    kw = np.ones((2, 16), np.float32)
    kw[:, :10] = 5.0  # boosted disc bigger than the keep budget
    idx = np.asarray(
        dinov2._keep_indices(imp, jnp.asarray(kw), 8, ctx_frac=0.5))
    imp_np = np.asarray(imp)
    for b in range(2):
        s = set(idx[b].tolist())
        assert len(s) == 8 and np.all(np.diff(idx[b]) > 0)
        prio = imp_np[b] + 10.0 * (kw[b] - 1.0)
        guided4 = set(np.argsort(-prio)[:4].tolist())
        assert guided4 <= s
        # context slots = best raw-importance tokens not already kept
        ctx4 = [i for i in np.argsort(-imp_np[b]) if i not in guided4][:4]
        assert set(ctx4) <= s
        # without the reserve, ALL 8 slots sit inside the boosted disc
        base = np.asarray(
            dinov2._keep_indices(imp, jnp.asarray(kw), 8))[b]
        assert set(base.tolist()) <= set(range(10))


def test_ctx_reserve_unguided_noop(setup):
    """With no guidance (keep_weights None or all-ones) the reserve is an
    exact no-op: both top_k calls read the same ranking."""
    params, images = setup
    x = dinov2._embed(params, images, CFG, jnp.float32)
    first = jax.tree.map(lambda a: a[0], params["layers"])
    imp = dinov2._cls_importance(first, x, CFG)
    base = np.asarray(dinov2._keep_indices(imp, None, 6))
    assert np.array_equal(
        np.asarray(dinov2._keep_indices(imp, None, 6, ctx_frac=0.5)), base)
    ones = jnp.ones_like(imp)
    assert np.array_equal(
        np.asarray(dinov2._keep_indices(imp, ones, 6, ctx_frac=0.5)), base)
    # end-to-end: unguided filtered forward identical with/without @c
    o0 = dinov2.apply(params, images, CFG, filter_layer=2, filter_keep=0.25)
    o1 = dinov2.apply(params, images, CFG, filter_layer=2, filter_keep=0.25,
                      filter_ctx_frac=0.5)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


def test_ctx_reserve_guided_changes_output(setup):
    params, images = setup
    kw = np.ones((2, 16), np.float32)
    kw[:, :10] = 5.0
    o0 = dinov2.apply(params, images, CFG, filter_layer=2, filter_keep=0.25,
                      keep_weights=jnp.asarray(kw))
    o1 = dinov2.apply(params, images, CFG, filter_layer=2, filter_keep=0.25,
                      filter_ctx_frac=0.5, keep_weights=jnp.asarray(kw))
    assert np.all(np.isfinite(np.asarray(o1)))
    assert not np.allclose(np.asarray(o0), np.asarray(o1))


def test_ctx_reserve_validation(setup):
    params, images = setup
    with pytest.raises(ValueError, match="ctx_frac"):
        dinov2.apply(params, images, CFG, filter_layer=2, filter_keep=0.25,
                     filter_ctx_frac=1.0)


def test_ctx_reserve_composes_with_merge_and_progressive(setup):
    params, images = setup
    kw = jnp.asarray(np.where(np.arange(16)[None] < 10, 5.0, 1.0)
                     * np.ones((2, 16), np.float32))
    om = dinov2.apply(params, images, CFG, filter_layer=2, filter_keep=0.5,
                      filter_merge=True, filter_ctx_frac=0.5,
                      keep_weights=kw)
    assert om.shape == (2, 17, 64) and np.all(np.isfinite(np.asarray(om)))
    op = dinov2.apply(params, images, CFG,
                      filter_schedule=((1, 0.75), (2, 0.5)),
                      filter_ctx_frac=0.5, keep_weights=kw)
    assert op.shape == (2, 17, 64) and np.all(np.isfinite(np.asarray(op)))


def test_parse_token_filter_ctx():
    from cognitive_aim_tpu.models.config import parse_token_filter

    out = parse_token_filter("2:0.25@c0.33")
    assert out["token_filter_layer"] == 2
    assert out["token_filter_keep"] == 0.25
    assert out["token_filter_ctx_frac"] == 0.33
    out = parse_token_filter("2:0.25@c0.5@p")
    assert out["token_filter_ctx_frac"] == 0.5
    assert out["token_filter_prop_attn"] is True


def test_model_level_ctx_reserve():
    """token_filter_ctx_frac threads from ModelArchConfig through the full
    guided forward (the guidance mask supplies keep_weights)."""
    from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
    from cognitive_aim_tpu.models.config import ModelArchConfig

    vit = dinov2.DinoV2Config(hidden_size=64, num_layers=4, num_heads=4,
                              pretrain_image_size=56, patch_size=14)
    kw = dict(num_iterations=1, image_size=56, num_cameras=4)
    exif = {
        "camera_idx": jnp.zeros((2,), jnp.int32),
        "focal_length": jnp.full((2,), 0.25),
        "aperture": jnp.full((2,), 0.127),
        "iso": jnp.full((2,), 0.016),
    }
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    m0 = CognitiveAimModel(
        ModelArchConfig(token_filter_layer=2, token_filter_keep=0.25, **kw),
        vit_cfg=vit)
    p = m0.init(jax.random.PRNGKey(0))
    m1 = CognitiveAimModel(
        ModelArchConfig(token_filter_layer=2, token_filter_keep=0.25,
                        token_filter_ctx_frac=0.5, **kw),
        vit_cfg=vit)
    g = jnp.zeros((2,), jnp.int32)  # 'center'
    o0 = m0.apply(p, images, exif, guidance=g, rng=jax.random.PRNGKey(0))
    o1 = m1.apply(p, images, exif, guidance=g, rng=jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(o1.depth)))
    assert not np.allclose(np.asarray(o0.depth), np.asarray(o1.depth))
    # unguided: @c must be a no-op
    u0 = m0.apply(p, images, exif, rng=jax.random.PRNGKey(0))
    u1 = m1.apply(p, images, exif, rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(u0.depth), np.asarray(u1.depth))

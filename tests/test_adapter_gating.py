"""Adapter-gated token-filter sandwich: the round-5 certification path.

The round-4 full-weight sandwich rescued the filter's concentrated-regime
collapse but cost the EXACT path ~1pp (docs/PERF.md:568) — the deployment
delta vs the original weights was never assembled (VERDICT r4 missing #1).
Round 5's mechanism: freeze the whole base model and train only backbone
LoRA adapters (reference shapes, ref:src/model.py:13-30, extended to
qkv/fc1/fc2) with the filter active; the adapters are GATED by
`use_lora`, so the adapter-off exact path is bit-identical to the
original weights by construction and filtered-vs-exact on the sandwiched
checkpoint IS the full deployment delta vs the original checkpoint.

This file guards every link of that chain in CI:
  1. gating: an exact-path model ignores adapter tensors bit-exactly;
  2. zero-init: fresh adapters (B=0) are a no-op on the gated path;
  3. train_only_lora: a real optimizer step moves ONLY lora tensors;
  4. the sandwich rescue direction (VERDICT r4 #6): adapter training
     with the shipping filter spec reduces the filtered path's task
     loss and its prediction gap to the frozen exact path.
  5. provenance stamps: filter configs warn/refuse on unstamped weights
     (VERDICT r4 #8).
"""

import dataclasses
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from cognitive_aim_tpu.core.precision import STRICT_F32
from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
from cognitive_aim_tpu.models.config import (
    ModelArchConfig,
    parse_token_filter,
    token_filter_spec,
)
from cognitive_aim_tpu.nn import dinov2
from cognitive_aim_tpu.nn.dinov2 import DinoV2Config
from cognitive_aim_tpu.train.trainer import TrainConfig, Trainer

SIZE = 56
VIT = DinoV2Config(hidden_size=64, num_layers=4, num_heads=4,
                   patch_size=14, pretrain_image_size=SIZE)
ALL_TARGETS = ("qkv", "attn_out", "fc1", "fc2")


def _exif(b):
    return {"camera_idx": jnp.zeros(b, jnp.int32),
            "focal_length": jnp.full(b, 0.25),
            "aperture": jnp.full(b, 0.127),
            "iso": jnp.full(b, 0.016)}


# ------------------------------------------------------------- backbone ----
def test_extended_lora_gating_bit_exact():
    """use_lora=False ignores adapter tensors entirely; zero-B adapters
    are a no-op; nonzero adapters move only the gated path."""
    cfgL = dataclasses.replace(
        VIT, use_lora=True, lora_rank=4, lora_alpha=4,
        lora_targets=ALL_TARGETS)
    pL = dinov2.init(jax.random.PRNGKey(0), cfgL)
    assert {k for k in pL["layers"] if k.startswith("lora")} == {
        "lora_A", "lora_B", "lora_qkv_A", "lora_qkv_B",
        "lora_fc1_A", "lora_fc1_B", "lora_fc2_A", "lora_fc2_B"}

    x = jax.random.normal(jax.random.PRNGKey(1), (2, SIZE, SIZE, 3))
    pe = dinov2.init(jax.random.PRNGKey(0), VIT)
    base = dinov2.apply(pe, x, VIT)

    # graft fresh adapters into the lora-free base tree
    pl = dict(pe)
    lay = dict(pe["layers"])
    for k, v in pL["layers"].items():
        if k.startswith("lora"):
            lay[k] = v
    pl["layers"] = lay

    assert jnp.array_equal(dinov2.apply(pl, x, VIT), base)  # gate off
    gated0 = dinov2.apply(pl, x, cfgL)
    assert float(jnp.max(jnp.abs(gated0 - base))) == 0.0  # B=0 no-op

    lay2 = {k: (jax.random.normal(jax.random.PRNGKey(2), v.shape) * 0.1
                if k.startswith("lora") and k.endswith("_B") else v)
            for k, v in lay.items()}
    pl2 = dict(pl)
    pl2["layers"] = lay2
    assert float(jnp.max(jnp.abs(
        dinov2.apply(pl2, x, cfgL) - gated0))) > 1e-6  # gate on moves
    assert jnp.array_equal(dinov2.apply(pl2, x, VIT), base)  # exact fixed


def test_lora_composes_with_token_filter():
    cfgL = dataclasses.replace(
        VIT, use_lora=True, lora_rank=4, lora_alpha=4,
        lora_targets=ALL_TARGETS)
    p = dinov2.init(jax.random.PRNGKey(0), cfgL)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, SIZE, SIZE, 3))
    out = dinov2.apply(p, x, cfgL, filter_layer=1, filter_keep=0.5)
    assert out.shape == (2, 1 + (SIZE // 14) ** 2, 64)
    assert bool(jnp.all(jnp.isfinite(out)))


# ------------------------------------------------- trainer + end-to-end ----
@pytest.fixture(scope="module")
def sandwich_cell():
    """Tiny end-to-end adapter sandwich on the certification cell's law:
    base trained exact, then adapter-only finetune with the shipping
    filter spec (2:0.35) active."""
    from policy_delta import synth_images
    from train_synth_ckpt import depth_law

    from cognitive_aim_tpu.io.preprocess import IMAGENET_MEAN, IMAGENET_STD

    imgs01 = synth_images(64, SIZE, seed=0)
    target = depth_law(imgs01)
    norm = ((imgs01 - np.asarray(IMAGENET_MEAN, np.float32))
            / np.asarray(IMAGENET_STD, np.float32)).astype(np.float32)

    def batch(i):
        b = slice((i % 8) * 8, (i % 8) * 8 + 8)
        return {"images": norm[b], "depths": target[b],
                "exif": {"camera_idx": np.zeros(8, np.int32),
                         "focal_length": np.full(8, 0.25, np.float32),
                         "aperture": np.full(8, 0.127, np.float32),
                         "iso": np.full(8, 0.016, np.float32)}}

    # base cell: exact path, no adapters
    base_arch = ModelArchConfig(num_iterations=2, image_size=SIZE,
                                freeze_backbone=False, use_lora=False)
    base_model = CognitiveAimModel(base_arch, policy=STRICT_F32, vit_cfg=VIT)
    tr = Trainer(base_model, base_model.init(jax.random.PRNGKey(0)),
                 TrainConfig(epochs=1, batch_size=8, steps_per_epoch=60,
                             learning_rate=3e-3, freeze_backbone=False,
                             weight_decay=0.0),
                 output_dir="/tmp/adapter_guard_base")
    for i in range(60):
        tr.train_step(batch(i), jax.random.PRNGKey(i))
    base_params = jax.device_get(tr.params)
    return base_params, norm, target, batch


def _adapter_arch(**kw):
    return ModelArchConfig(
        num_iterations=2, image_size=SIZE, freeze_backbone=False,
        use_lora=True, lora_rank=8, lora_alpha=8, lora_targets=ALL_TARGETS,
        token_filter_layer=2, token_filter_keep=0.35,
        token_filter_train=True, **kw)


def test_adapter_sandwich_rescue_and_frozen_base(sandwich_cell):
    """The CI version of the round-5 certification mechanics (VERDICT r4
    #6): adapter-only finetuning with the shipping spec active (a) leaves
    every non-lora tensor bit-identical, (b) reduces the filtered path's
    task loss, and (c) shrinks the filtered-vs-exact prediction gap
    relative to the raw (no-adapter) filter."""
    base_params, norm, target, batch = sandwich_cell

    ad_model = CognitiveAimModel(_adapter_arch(), policy=STRICT_F32,
                                 vit_cfg=VIT)
    # graft fresh adapters into the trained base (pretrain_procedural's
    # --adapter-rank warm-start path, mirrored)
    fresh = ad_model.init(jax.random.PRNGKey(7))
    params = dict(base_params)
    params["backbone"] = dict(base_params["backbone"])
    lay = dict(base_params["backbone"]["layers"])
    for k, v in fresh["backbone"]["layers"].items():
        if k.startswith("lora") and k not in lay:
            lay[k] = v
    params["backbone"]["layers"] = lay

    tr = Trainer(ad_model, params,
                 TrainConfig(epochs=1, batch_size=8, steps_per_epoch=80,
                             learning_rate=1e-2, freeze_backbone=False,
                             weight_decay=0.0, train_only_lora=True),
                 output_dir="/tmp/adapter_guard_ad")
    losses = []
    for i in range(80):
        losses.append(tr.train_step(batch(i), jax.random.PRNGKey(i))["loss"])
    after = jax.device_get(tr.params)

    # (a) frozen base: everything except lora_* is numerically unchanged
    def flat(t, prefix=""):
        out = {}
        for k, v in t.items():
            key = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, dict):
                out.update(flat(v, key))
            elif isinstance(v, list):
                out.update(flat({str(j): e for j, e in enumerate(v)}, key))
            else:
                out[key] = np.asarray(v)
        return out

    fb, fa = flat(base_params), flat(after)
    moved_lora = 0.0
    for k in fa:
        if "lora" in k:
            if k in fb or k.endswith("_B"):
                moved_lora = max(moved_lora, float(np.max(np.abs(fa[k]))))
            continue
        assert np.array_equal(fb[k], fa[k]), f"frozen tensor {k} moved"
    assert moved_lora > 0.0, "no adapter tensor trained"

    # (b) the filtered path actually optimized
    assert np.mean(losses[-10:]) < np.mean(losses[:10]), \
        "adapter finetune did not reduce filtered-path loss"

    # (c) the rescue direction on the certification's gt metric: the
    # adapted filtered path fits the task better than the raw filter on
    # the same frozen base. (The tiny memorizing cell cannot reproduce
    # the concentrated-regime collapse that makes the REAL raw gap huge
    # — docs/PERF.md round-4 — so CI asserts the direction the sandwich
    # trains, not the 2-orders-of-magnitude production rescue.)
    raw_m = CognitiveAimModel(
        ModelArchConfig(num_iterations=2, image_size=SIZE,
                        freeze_backbone=False, use_lora=False,
                        token_filter_layer=2, token_filter_keep=0.35),
        policy=STRICT_F32, vit_cfg=VIT)

    x = jnp.asarray(norm[:16])
    gt = np.asarray(target[:16], np.float64)
    ex = _exif(16)
    key = jax.random.PRNGKey(0)
    g = jnp.full(16, 3, jnp.int32)
    d_raw = np.asarray(raw_m.apply(
        jax.device_put(base_params), x, ex, guidance=g, rng=key).depth[:, 0],
        np.float64)
    d_ad = np.asarray(ad_model.apply(
        jax.device_put(after), x, ex, guidance=g, rng=key).depth[:, 0],
        np.float64)
    absrel_raw = float(np.mean(np.abs(d_raw - gt) / np.maximum(gt, 1e-6)))
    absrel_ad = float(np.mean(np.abs(d_ad - gt) / np.maximum(gt, 1e-6)))
    assert absrel_ad < absrel_raw, (
        f"adapter sandwich did not improve the filtered path's task fit "
        f"(raw {absrel_raw * 100:.2f}% -> adapted {absrel_ad * 100:.2f}%)")


def test_merge_lora_matches_runtime_adapter():
    """The deployment fold (merge_lora: W' = W + scaling * A^T B^T) is
    mathematically the runtime-gated adapter — outputs match to float
    rounding — and the folded tree carries no lora tensors (so the
    filtered serving path pays ZERO adapter overhead)."""
    cfgL = dataclasses.replace(
        VIT, use_lora=True, lora_rank=4, lora_alpha=8,
        lora_targets=ALL_TARGETS)
    p = dinov2.init(jax.random.PRNGKey(0), cfgL)
    lay = {k: (jax.random.normal(jax.random.PRNGKey(3), v.shape) * 0.05
               if k.startswith("lora") and k.endswith("_B") else v)
           for k, v in p["layers"].items()}
    p = dict(p)
    p["layers"] = lay
    x = jax.random.normal(jax.random.PRNGKey(1), (2, SIZE, SIZE, 3))

    runtime = dinov2.apply(p, x, cfgL)
    folded_tree = dinov2.merge_lora(p, cfgL.lora_alpha / cfgL.lora_rank)
    assert not any(k.startswith("lora") for k in folded_tree["layers"])
    folded = dinov2.apply(folded_tree, x, VIT)  # plain config, no lora
    np.testing.assert_allclose(np.asarray(folded), np.asarray(runtime),
                               rtol=2e-4, atol=2e-5)
    # The folded FILTERED graph runs (this is the deployment graph; it is
    # not compared elementwise against the runtime-adapter filter because
    # the keep-set is discrete — float-rounding differences between the
    # two formulations can flip near-tie importance rankings, which is
    # why δ grids measure the folded graph directly)
    fo_f = dinov2.apply(folded_tree, x, VIT, filter_layer=1,
                        filter_keep=0.5)
    assert fo_f.shape == folded.shape
    assert bool(jnp.all(jnp.isfinite(fo_f)))
    # merge is a no-op on adapter-free trees (same object back)
    assert dinov2.merge_lora(folded_tree, 1.0) is folded_tree


# ------------------------------------------------------------ provenance ----
def test_token_filter_spec_roundtrip():
    for spec in ("2:0.35", "2:0.25", "1:0.5,3:0.35,5:0.25", "2:0.25@c0.5",
                 "2:0.35@s4@f4", "2:0.25@m", "4:0.5@p"):
        arch = ModelArchConfig(**parse_token_filter(spec))
        back = token_filter_spec(arch)
        assert set(parse_token_filter(back).items()) \
            == set(parse_token_filter(spec).items()), (spec, back)
    assert token_filter_spec(ModelArchConfig()) == ""


def test_filter_stamp_warning_and_refusal(tmp_path, capsys, monkeypatch):
    """api.py: a token-filter engine loading UNSTAMPED weights warns (and
    refuses under CAIM_REQUIRE_FILTER_STAMP=1); matching stamp is silent."""
    from cognitive_aim_tpu.api import flatten_tree, npz_meta

    arch = ModelArchConfig(num_iterations=2, image_size=SIZE,
                           freeze_backbone=False,
                           token_filter_layer=2, token_filter_keep=0.35)
    model = CognitiveAimModel(arch, policy=STRICT_F32, vit_cfg=VIT)
    params = model.init(jax.random.PRNGKey(0))

    class Engine:  # minimal host for _check_filter_stamp
        from cognitive_aim_tpu.api import CognitiveAimInference
        _check = CognitiveAimInference._check_filter_stamp

    eng = Engine()
    eng.arch = arch

    flat = flatten_tree(params)
    unstamped = tmp_path / "unstamped.npz"
    np.savez(unstamped, **flat)
    stamped = tmp_path / "stamped.npz"
    np.savez(stamped, **flat, **{"__meta__/train_filter": np.asarray("2:0.35")})

    z_un = np.load(unstamped)
    z_ok = np.load(stamped)
    assert npz_meta(z_un) == {}
    assert npz_meta(z_ok) == {"train_filter": "2:0.35"}

    eng._check(npz_meta(z_ok), str(stamped))
    assert "WARNING" not in capsys.readouterr().out

    eng._check(npz_meta(z_un), str(unstamped))
    assert "recipe-conditional" in capsys.readouterr().out

    monkeypatch.setenv("CAIM_REQUIRE_FILTER_STAMP", "1")
    with pytest.raises(ValueError, match="recipe-conditional"):
        eng._check(npz_meta(z_un), str(unstamped))


def test_api_auto_fold_on_filter_engine():
    """api._maybe_merge_adapters folds stamped adapter checkpoints for
    filter engines and leaves exact engines (and unstamped trees)
    untouched."""
    from cognitive_aim_tpu.api import CognitiveAimInference

    cfgL = dataclasses.replace(
        VIT, use_lora=True, lora_rank=4, lora_alpha=4,
        lora_targets=("attn_out",))
    bb = dinov2.init(jax.random.PRNGKey(0), cfgL)
    incoming = {"backbone": bb}
    meta = {"train_filter": "2:0.35", "adapter_rank": "4",
            "adapter_alpha": "4", "adapter_targets": "attn_out"}

    class Engine:
        _fold = CognitiveAimInference._maybe_merge_adapters

    eng = Engine()
    eng.arch = ModelArchConfig(token_filter_layer=2, token_filter_keep=0.35)
    folded = eng._fold(incoming, meta)
    assert not any(k.startswith("lora")
                   for k in folded["backbone"]["layers"])

    eng_exact = Engine()
    eng_exact.arch = ModelArchConfig()
    untouched = eng_exact._fold(incoming, meta)
    assert "lora_A" in untouched["backbone"]["layers"]

    # stamped rank missing -> no fold even on a filter engine
    assert "lora_A" in eng._fold(incoming, {})["backbone"]["layers"]


def test_trainer_stamps_filter_checkpoints(tmp_path):
    """Trainer.save_checkpoint writes the train-filter provenance stamp
    when (and only when) the model trains with an active filter."""
    from cognitive_aim_tpu.api import npz_meta

    arch = _adapter_arch()
    model = CognitiveAimModel(arch, policy=STRICT_F32, vit_cfg=VIT)
    tr = Trainer(model, model.init(jax.random.PRNGKey(0)),
                 TrainConfig(epochs=1, batch_size=4, steps_per_epoch=1,
                             freeze_backbone=False),
                 output_dir=str(tmp_path))
    tr.save_checkpoint(is_best=False)
    z = np.load(tmp_path / "checkpoint.npz")
    assert npz_meta(z).get("train_filter") == "2:0.35"

    plain = ModelArchConfig(num_iterations=2, image_size=SIZE,
                            freeze_backbone=False)
    model2 = CognitiveAimModel(plain, policy=STRICT_F32, vit_cfg=VIT)
    tr2 = Trainer(model2, model2.init(jax.random.PRNGKey(0)),
                  TrainConfig(epochs=1, batch_size=4, steps_per_epoch=1,
                              freeze_backbone=False),
                  output_dir=str(tmp_path / "plain"))
    tr2.save_checkpoint(is_best=False)
    assert "train_filter" not in npz_meta(np.load(
        tmp_path / "plain" / "checkpoint.npz"))


def test_sandwich_heads_trains_heads_frozen_backbone(sandwich_cell):
    """Sandwich v2 (round-5): train_only_lora + sandwich_heads moves the
    lora tensors AND the non-backbone tensors while every non-lora
    BACKBONE tensor stays bit-identical. (The trained non-backbone copies
    ship as a filterpath/ overlay; pretrain_procedural --adapter-heads.)"""
    base_params, norm, target, batch = sandwich_cell

    ad_model = CognitiveAimModel(_adapter_arch(), policy=STRICT_F32,
                                 vit_cfg=VIT)
    fresh = ad_model.init(jax.random.PRNGKey(7))
    params = dict(base_params)
    params["backbone"] = dict(base_params["backbone"])
    lay = dict(base_params["backbone"]["layers"])
    for k, v in fresh["backbone"]["layers"].items():
        if k.startswith("lora") and k not in lay:
            lay[k] = v
    params["backbone"]["layers"] = lay

    tr = Trainer(ad_model, params,
                 TrainConfig(epochs=1, batch_size=8, steps_per_epoch=30,
                             learning_rate=1e-2, freeze_backbone=False,
                             weight_decay=0.0, train_only_lora=True,
                             sandwich_heads=True),
                 output_dir="/tmp/adapter_guard_adh")
    for i in range(30):
        tr.train_step(batch(i), jax.random.PRNGKey(i))
    after = jax.device_get(tr.params)

    def flat(t, prefix=""):
        out = {}
        for k, v in t.items():
            key = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, dict):
                out.update(flat(v, key))
            elif isinstance(v, list):
                out.update(flat({str(j): e for j, e in enumerate(v)}, key))
            else:
                out[key] = np.asarray(v)
        return out

    fb, fa = flat(base_params), flat(after)
    heads_moved = lora_moved = 0
    for k, v in fa.items():
        if "lora" in k:
            lora_moved += int(k.endswith("_B")
                              and float(np.max(np.abs(v))) > 0)
            continue
        if k.startswith("backbone/"):
            assert np.array_equal(fb[k], fa[k]), f"backbone tensor {k} moved"
        else:
            heads_moved += int(not np.array_equal(fb[k], fa[k]))
    assert lora_moved > 0, "no adapter tensor trained"
    assert heads_moved > 0, "sandwich_heads trained no non-backbone tensor"


def test_filterpath_overlay_gating():
    """api._maybe_merge_adapters applies the sandwich-v2 filterpath/
    overlay on filter engines and strips it (serving the ORIGINAL
    tensors) on exact engines."""
    from cognitive_aim_tpu.api import CognitiveAimInference

    orig_fusion = {"w": np.ones((4, 4), np.float32)}
    trained_fusion = {"w": np.full((4, 4), 2.0, np.float32)}
    incoming = {"backbone": {"layers": {}}, "fusion": orig_fusion,
                "filterpath": {"fusion": trained_fusion}}

    class Engine:
        _fold = CognitiveAimInference._maybe_merge_adapters

    eng = Engine()
    eng.arch = ModelArchConfig(token_filter_layer=2, token_filter_keep=0.35)
    out = eng._fold(dict(incoming), {})
    assert "filterpath" not in out
    assert np.array_equal(out["fusion"]["w"], trained_fusion["w"])

    eng_exact = Engine()
    eng_exact.arch = ModelArchConfig()
    out2 = eng_exact._fold(dict(incoming), {})
    assert "filterpath" not in out2
    assert np.array_equal(out2["fusion"]["w"], orig_fusion["w"])

"""Config resolver: reference lookup semantics, nested mode, ablation
toggles, shipped-YAML acceptance."""

import glob

import yaml

from cognitive_aim_tpu.models.config import (
    resolve_model_config,
    resolve_image_size,
    resolve_num_cameras,
)


def load(path):
    with open(path) as f:
        return yaml.safe_load(f)


def test_experiment_b_reference_lookup():
    """experiment_B.yaml nests everything under model:, so the reference
    instantiates the DEFAULTS (frozen base, no lora, 3 iterations,
    focus_strength 1.5, curiosity_guided False) — ref:src/model.py:803-862."""
    raw = load("configs/experiment_B.yaml")
    a = resolve_model_config(raw, lookup="reference")
    assert a.backbone_size == "base"
    assert a.freeze_backbone is True
    assert a.use_lora is False
    assert a.num_iterations == 3
    assert a.focus_strength == 1.5
    assert a.curiosity_guided is False
    assert a.use_ambient and a.use_focal and a.use_iterative and a.use_exif
    assert a.num_cameras == 71
    assert a.image_size == 224


def test_experiment_b_nested_lookup():
    """nested mode reads what the YAML authors wrote: lora on, 6 iterations,
    unfrozen backbone."""
    raw = load("configs/experiment_B.yaml")
    a = resolve_model_config(raw, lookup="nested")
    assert a.use_lora is True
    assert a.freeze_backbone is False
    assert a.num_iterations == 6
    assert a.focus_strength == 2.5
    # the 'enabled' vs 'enable' key typo still yields False in reference
    # mode; nested mode honors 'enable'
    assert a.curiosity_guided is True


def test_ablation_toggles():
    raw = load("eval_configs/without_ambient_config.yaml")
    a = resolve_model_config(raw)
    assert a.use_ambient is False
    assert a.use_focal and a.use_exif
    raw = load("eval_configs/without_focal_config.yaml")
    a = resolve_model_config(raw)
    assert a.use_focal is False and a.use_iterative is False
    raw = load("eval_configs/baseline_dinov2_config.yaml")
    a = resolve_model_config(raw)
    assert not (a.use_ambient or a.use_focal or a.use_exif)
    assert a.use_curiosity is False
    # strict reference behavior ignores the (dead) toggles
    a = resolve_model_config(raw, honor_ablation_toggles=False)
    assert a.use_ambient and a.use_focal and a.use_exif


def test_all_shipped_yamls_resolve():
    for path in glob.glob("configs/*.yaml") + glob.glob("eval_configs/*.yaml"):
        raw = load(path)
        for lookup in ("reference", "nested"):
            a = resolve_model_config(raw, lookup=lookup)
            assert a.fusion_dim == 192
            assert resolve_image_size(raw) in (224, 384, 518)
            assert resolve_num_cameras(raw) == 71


def test_fast_tpu_config_resolves_certified_point():
    """The framework-added fast config must resolve to the fast
    operating point: 518 eval, 2 focal iterations, token filter 2:0.35
    with the fused context token. (Round 4 certified this spec on both
    task semantics RECIPE-CONDITIONALLY — sandwich-finetuned weights
    only, refuted on raw weights; the yaml documents the condition —
    but the resolver contract is unchanged: these keys must keep
    resolving exactly.)"""
    raw = load("eval_configs/full_cognitive_fast_tpu.yaml")
    for lookup in ("reference", "nested"):
        a = resolve_model_config(raw, lookup=lookup)
        assert a.token_filter_layer == 2
        assert a.token_filter_keep == 0.35
        assert a.token_filter_fuse is True
        assert a.token_filter_active
        assert a.num_iterations == 2
        assert a.use_ambient and a.use_focal and a.use_exif
    assert resolve_image_size(raw) == 518


def test_default_module_injection():
    a = resolve_model_config({})
    assert a.use_ambient and a.use_iterative and a.use_exif
    a = resolve_model_config({}, inject_default_modules=False)
    assert not a.use_focal

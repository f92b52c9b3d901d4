"""End-to-end parity: full CognitiveAimModel (JAX) vs the reference's
CognitiveAimModel (torch), with the HF backbone monkeypatched to a small
random-init Dinov2 (no network) and all forward-time sampling zeroed.

Covers: backbone -> curiosity -> ambient/focal/exif -> fusion -> heads,
guided and unguided, across all 9 instructions."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cognitive_aim_tpu.core.precision import STRICT_F32  # noqa: E402
from cognitive_aim_tpu.core.rng import NoiseMode  # noqa: E402
from cognitive_aim_tpu.io import checkpoint_torch as ct  # noqa: E402
from cognitive_aim_tpu.models import guidance as G  # noqa: E402
from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel  # noqa: E402
from cognitive_aim_tpu.models.config import resolve_model_config  # noqa: E402

from conftest import import_reference_model

ref = import_reference_model()

IMAGE = 84  # 6x6 patch grid at patch 14


def small_backbone():
    from transformers import Dinov2Config, Dinov2Model

    cfg = Dinov2Config(
        hidden_size=768, num_hidden_layers=2, num_attention_heads=12,
        intermediate_size=3072, patch_size=14, image_size=IMAGE,
    )
    return Dinov2Model(cfg)


@pytest.fixture(scope="module")
def pair():
    """(reference torch model, our model, our params) with identical weights."""
    torch.manual_seed(0)
    backbone = small_backbone()
    from transformers import Dinov2Model

    orig = Dinov2Model.from_pretrained
    Dinov2Model.from_pretrained = classmethod(lambda cls, name, **kw: backbone)
    try:
        raw_cfg = {
            "cognitive_modules": [
                "ambient_stream", "iterative_focal_stream", "exif_prior_database",
            ],
        }
        tm = ref.CognitiveAimModel(raw_cfg, camera_info={"num_cameras": 5}).eval()
    finally:
        Dinov2Model.from_pretrained = orig

    arch = resolve_model_config(raw_cfg, {"num_cameras": 5})
    arch = arch.__class__(**{**arch.__dict__, "image_size": IMAGE})
    jm = CognitiveAimModel(arch, policy=STRICT_F32)

    sd = tm.state_dict()
    params = {
        "backbone": ct.convert_backbone(sd, "backbone."),
        "ambient_stream": ct.convert_ambient(sd, "ambient_stream"),
        "focal_stream": ct.convert_iterative_focal(sd, "focal_stream"),
        "exif_prior": ct.convert_exif_prior(sd, "exif_prior"),
        "curiosity_module": ct.convert_curiosity(sd, "curiosity_module"),
        **ct.convert_heads(sd),
    }
    # persistent guided projection: the reference draws a FRESH Linear each
    # guided call (ref:src/model.py:1419-1422) — init ours arbitrarily
    params["guided_projection"] = {
        "w": np.random.RandomState(0).randn(768, 64).astype(np.float32) * 0.01,
        "b": np.zeros(64, np.float32),
    }
    params = jax.tree.map(jnp.asarray, params)
    return tm, jm, params


def exif_pair(B):
    t = {
        "camera_idx": torch.zeros(B, dtype=torch.long),
        "focal_length": torch.full((B,), 50.0),
        "aperture": torch.full((B,), 2.8),
        "iso": torch.full((B,), 100.0),
    }
    j = {k: jnp.asarray(v.numpy()) for k, v in t.items()}
    return t, j


def test_unguided_forward_parity(pair, monkeypatch):
    tm, jm, params = pair
    monkeypatch.setattr(torch, "randn_like", lambda t, **kw: torch.zeros_like(t))
    x = torch.randn(2, 3, IMAGE, IMAGE)
    exif_t, exif_j = exif_pair(2)
    with torch.no_grad():
        want_d, want_c = tm(x, exif_t)
    out = jm.apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), exif_j,
        noise_mode=NoiseMode.ZEROS,
    )
    np.testing.assert_allclose(np.asarray(out.depth), want_d.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.confidence), want_c.numpy(), atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("instruction", G.INSTRUCTIONS)
def test_guided_attention_parity(pair, monkeypatch, instruction):
    """Guided attention is deterministic in the reference (the random
    temp_projection only affects features) — compare it across all 9
    instructions."""
    tm, jm, params = pair
    monkeypatch.setattr(torch, "randn_like", lambda t, **kw: torch.zeros_like(t))
    x = torch.randn(1, 3, IMAGE, IMAGE)
    exif_t, exif_j = exif_pair(1)
    with torch.no_grad():
        want_d, want_c, want_a = tm.forward_with_guidance(
            x, exif_t, instruction, return_attention=True
        )
    out = jm.apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), exif_j,
        guidance=G.instruction_index(instruction), noise_mode=NoiseMode.ZEROS,
    )
    np.testing.assert_allclose(
        np.asarray(out.attention), want_a.numpy(), atol=1e-5, rtol=1e-3
    )


def test_reference_guided_depth_is_nondeterministic_ours_is_not(pair, monkeypatch):
    """Documents the reference accident we fix: with IterativeFocalStream the
    reference projects guided features through a fresh random Linear per call
    (ref:src/model.py:1419-1422), so its guided depth varies call-to-call;
    ours is deterministic."""
    tm, jm, params = pair
    monkeypatch.setattr(torch, "randn_like", lambda t, **kw: torch.zeros_like(t))
    x = torch.randn(1, 3, IMAGE, IMAGE)
    exif_t, exif_j = exif_pair(1)
    with torch.no_grad():
        d1, _ = tm.forward_with_guidance(x, exif_t, "center")
        d2, _ = tm.forward_with_guidance(x, exif_t, "center")
    assert not torch.allclose(d1, d2), "reference fresh-Linear quirk vanished?"

    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    o1 = jm.apply(params, xj, exif_j, guidance=0, noise_mode=NoiseMode.ZEROS)
    o2 = jm.apply(params, xj, exif_j, guidance=0, noise_mode=NoiseMode.ZEROS)
    np.testing.assert_array_equal(np.asarray(o1.depth), np.asarray(o2.depth))


def test_guided_depth_parity_single_focal(monkeypatch):
    """With a single (non-iterative) FocalStream the reference's guided path
    uses the stream's trained projection (ref:src/model.py:1417-1418) — full
    depth/confidence parity is checkable."""
    torch.manual_seed(1)
    backbone = small_backbone()
    from transformers import Dinov2Model

    monkeypatch.setattr(
        Dinov2Model, "from_pretrained", classmethod(lambda cls, n, **kw: backbone)
    )
    raw_cfg = {
        "cognitive_modules": ["ambient_stream", "focal_stream", "exif_prior_database"],
    }
    tm = ref.CognitiveAimModel(raw_cfg, camera_info={"num_cameras": 5}).eval()
    arch = resolve_model_config(raw_cfg, {"num_cameras": 5})
    jm = CognitiveAimModel(arch, policy=STRICT_F32)
    sd = tm.state_dict()
    params = jax.tree.map(
        jnp.asarray,
        {
            "backbone": ct.convert_backbone(sd, "backbone."),
            "ambient_stream": ct.convert_ambient(sd, "ambient_stream"),
            "focal_stream": ct.convert_focal_stream(sd, "focal_stream"),
            "exif_prior": ct.convert_exif_prior(sd, "exif_prior"),
            "curiosity_module": ct.convert_curiosity(sd, "curiosity_module"),
            **ct.convert_heads(sd),
        },
    )
    monkeypatch.setattr(torch, "randn_like", lambda t, **kw: torch.zeros_like(t))
    x = torch.randn(1, 3, IMAGE, IMAGE)
    exif_t, exif_j = exif_pair(1)
    with torch.no_grad():
        want_d, want_c = tm.forward_with_guidance(x, exif_t, "top-left")
    out = jm.apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), exif_j,
        guidance=G.instruction_index("top-left"), noise_mode=NoiseMode.ZEROS,
    )
    np.testing.assert_allclose(np.asarray(out.depth), want_d.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.confidence), want_c.numpy(), atol=2e-4, rtol=1e-3)

"""Numerical parity: our JAX DINOv2 vs transformers.Dinov2Model (torch CPU)
with identical (random) weights transplanted through the converter."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from cognitive_aim_tpu.io import checkpoint_torch as ct  # noqa: E402
from cognitive_aim_tpu.nn import dinov2  # noqa: E402


def _small_pair(image_size=42, patch=14, hidden=64, layers=3, heads=4):
    from transformers import Dinov2Config, Dinov2Model

    torch.manual_seed(0)
    tcfg = Dinov2Config(
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        intermediate_size=hidden * 4,
        patch_size=patch,
        image_size=image_size,
    )
    tm = Dinov2Model(tcfg).eval()
    jcfg = dinov2.DinoV2Config(
        hidden_size=hidden,
        num_layers=layers,
        num_heads=heads,
        mlp_ratio=4,
        patch_size=patch,
        pretrain_image_size=image_size,
    )
    params = ct.convert_backbone(tm.state_dict(), prefix="")
    return tm, jcfg, params


def test_same_resolution_parity():
    tm, jcfg, params = _small_pair()
    x = torch.randn(2, 3, 42, 42)
    with torch.no_grad():
        ref = tm(x).last_hidden_state.numpy()
    ours = dinov2.apply(
        params_to_jnp(params), jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), jcfg
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=2e-4)


def params_to_jnp(tree):
    import jax

    return jax.tree.map(jnp.asarray, tree)


def test_interpolated_pos_embed_parity():
    """224-equivalent input against a different pretrain grid: exercises the
    bicubic pos-embed interpolation path (HF half-pixel, no antialias)."""
    tm, jcfg, params = _small_pair(image_size=70)  # 5x5 pretrain grid
    x = torch.randn(1, 3, 42, 42)  # 3x3 grid at runtime -> interpolation
    with torch.no_grad():
        ref = tm(x, interpolate_pos_encoding=True).last_hidden_state.numpy()
    ours = dinov2.apply(
        params_to_jnp(params), jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), jcfg
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-5, rtol=2e-4)


def test_lora_applies():
    """LoRA with nonzero B must change the output; with zero B it must not
    (reference shapes: lora_A [r, D], lora_B [D, r], scaling alpha/r)."""
    import jax

    tm, jcfg, params = _small_pair()
    params = params_to_jnp(params)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 42, 42, 3), jnp.float32)
    base = dinov2.apply(params, x, jcfg)

    lora_cfg = dinov2.DinoV2Config(
        **{
            **{f.name: getattr(jcfg, f.name) for f in __import__("dataclasses").fields(jcfg)},
            "use_lora": True,
            "lora_rank": 4,
        }
    )
    L = jcfg.num_layers
    D = jcfg.hidden_size
    key = jax.random.PRNGKey(1)
    params["layers"]["lora_A"] = 0.01 * jax.random.normal(key, (L, 4, D))
    params["layers"]["lora_B"] = jnp.zeros((L, D, 4))
    out_zero = dinov2.apply(params, x, lora_cfg)
    np.testing.assert_allclose(np.asarray(out_zero), np.asarray(base), atol=1e-6)

    params["layers"]["lora_B"] = 0.1 * jax.random.normal(key, (L, D, 4))
    out = dinov2.apply(params, x, lora_cfg)
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-4

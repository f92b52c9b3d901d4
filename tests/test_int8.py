"""Int8 backbone path: quantized forward stays close to the f32 path."""

import numpy as np

import jax
import jax.numpy as jnp

from cognitive_aim_tpu.kernels.int8_ops import (
    int8_linear,
    quantize_backbone_layers,
    quantize_weight,
)
from cognitive_aim_tpu.nn import dinov2


def test_int8_linear_accuracy():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 768).astype(np.float32))
    w = jnp.asarray(rng.randn(768, 256).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(256).astype(np.float32) * 0.01)
    want = np.asarray(x @ w + b)
    got = np.asarray(int8_linear(x, quantize_weight(w), b))
    rel = np.abs(got - want) / (np.abs(want) + 1e-3)
    assert np.median(rel) < 0.02, float(np.median(rel))


def test_int8_backbone_close_to_f32():
    cfg = dinov2.DinoV2Config(hidden_size=64, num_layers=2, num_heads=4,
                              patch_size=14, pretrain_image_size=56)
    params = dinov2.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    ref = np.asarray(dinov2.apply(params, x, cfg))

    qparams = dict(params)
    qparams["layers"] = quantize_backbone_layers(params["layers"])
    got = np.asarray(dinov2.apply(qparams, x, cfg))
    # per-token cosine similarity stays high under int8 dense projections
    cos = np.sum(got * ref, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1) + 1e-9
    )
    assert cos.min() > 0.995, float(cos.min())


def test_int8_gemm_fused_interpret(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)

    from cognitive_aim_tpu.kernels.int8_gemm import int8_gemm_fused

    rng = np.random.RandomState(0)
    M, K, N = 300, 256, 128  # non-divisible M exercises edge blocks
    x = jnp.asarray(rng.randn(M, K).astype(np.float32))
    w = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(N).astype(np.float32) * 0.01)
    wq = quantize_weight(w)
    want = np.asarray(x @ w + b)
    got = np.asarray(
        int8_gemm_fused(x, wq["q"], wq["s"], b, m_block=128,
                        out_dtype=jnp.float32)
    )
    rel = np.abs(got - want) / (np.abs(want) + 1e-2)
    assert np.median(rel) < 0.02, float(np.median(rel))

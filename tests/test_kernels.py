"""Pallas kernel tests: interpret-mode correctness vs the XLA reference
(every kernel ships with a reference implementation, SURVEY.md §7.3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cognitive_aim_tpu.kernels import flash_attention as FA


def _qkv(B=2, N=257, H=4, D=64, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (B, N, H, D)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


@pytest.mark.parametrize("N", [257, 200, 1370])
def test_flash_attention_interpret_matches_reference(N, monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)

    q, k, v = _qkv(B=1, N=N, H=2)
    scale = 64**-0.5
    want = FA.attention_reference(q, k, v, scale)
    got = FA.flash_attention(q, k, v, scale=scale, q_block=128, k_block=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-4)


def test_flash_attention_matches_dinov2_path(monkeypatch):
    """dinov2.apply(attn_impl='pallas') == attn_impl='xla' (interpret mode)."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)

    from cognitive_aim_tpu.nn import dinov2

    cfg = dinov2.DinoV2Config(hidden_size=64, num_layers=2, num_heads=4,
                              patch_size=14, pretrain_image_size=56)
    params = dinov2.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    a = dinov2.apply(params, x, cfg, attn_impl="xla")
    b = dinov2.apply(params, x, cfg, attn_impl="pallas")
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5, rtol=5e-4)


@pytest.mark.parametrize("N", [257, 1370])
def test_flash_packed_interpret_matches_reference(N, monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)

    B, H, D = 1, 4, 64
    q, k, v = _qkv(B=B, N=N, H=H, D=D)
    scale = D**-0.5
    want = FA.attention_reference(q, k, v, scale).reshape(B, N, H * D)
    qp = q.reshape(B, N, H * D)
    kp = k.reshape(B, N, H * D)
    vp = v.reshape(B, N, H * D)
    got = FA.flash_attention_packed(qp, kp, vp, scale=scale, num_heads=H,
                                    q_block=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=2e-4)


def test_packed_dinov2_path(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)

    from cognitive_aim_tpu.nn import dinov2

    cfg = dinov2.DinoV2Config(hidden_size=64, num_layers=2, num_heads=4,
                              patch_size=14, pretrain_image_size=56)
    params = dinov2.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    a = dinov2.apply(params, x, cfg, attn_impl="xla")
    b = dinov2.apply(params, x, cfg, attn_impl="pallas_packed")
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5, rtol=5e-4)


def test_flash_packed_grad_matches_reference(monkeypatch):
    """custom_vjp: grads through the packed kernel equal grads through the
    XLA reference."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)

    B, N, H, D = 1, 130, 2, 64
    q, k, v = _qkv(B=B, N=N, H=H, D=D)
    qp, kp, vp = (t.reshape(B, N, H * D) for t in (q, k, v))
    scale = D**-0.5

    def loss_pallas(q_, k_, v_):
        return FA.flash_attention_packed(q_, k_, v_, scale, H, 128).sum()

    def loss_ref(q_, k_, v_):
        return FA._packed_reference(q_, k_, v_, scale, H).sum()

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(qp, kp, vp)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(qp, kp, vp)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   rtol=5e-4)


def test_flash_packed_int8_close(monkeypatch):
    """int8 QK^T variant stays close to the f32 reference (fast-path
    accuracy bound)."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)

    B, N, H, D = 1, 260, 2, 64
    q, k, v = _qkv(B=B, N=N, H=H, D=D)
    qp, kp, vp = (t.reshape(B, N, H * D) for t in (q, k, v))
    scale = D**-0.5
    want = np.asarray(FA._packed_reference(qp, kp, vp, scale, H))
    got = np.asarray(
        FA.flash_attention_packed(qp, kp, vp, scale, H, 128, True)
    )
    cos = np.sum(got * want, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1) + 1e-9
    )
    assert cos.min() > 0.995, float(cos.min())

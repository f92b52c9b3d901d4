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


def _interp(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)


def test_flash_packed_i8qk_close(monkeypatch):
    """Pre-quantized int8 QK^T variant stays close to the f32 reference."""
    _interp(monkeypatch)
    B, N, H, D = 1, 260, 2, 64
    q, k, v = _qkv(B=B, N=N, H=H, D=D)
    qp, kp, vp = (t.reshape(B, N, H * D) for t in (q, k, v))
    scale = D**-0.5
    want = np.asarray(FA._packed_reference(qp, kp, vp, scale, H))
    got = np.asarray(FA.flash_attention_packed_i8qk(qp, kp, vp, scale, H))
    cos = np.sum(got * want, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1) + 1e-9
    )
    assert cos.min() > 0.999, cos.min()
    np.testing.assert_allclose(got, want, atol=0.08)


@pytest.mark.parametrize("N", [256, 130])
def test_focal_fused_matches_reference(N, monkeypatch):
    """Fused focal kernel: all four views (attended/colmean/diag/rowmax)
    match the XLA reference, including non-block-multiple N."""
    _interp(monkeypatch)
    from cognitive_aim_tpu.kernels import focal_attention as FOC

    D = 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (2, N, D)) * 0.5 for kk in ks)
    scale = float(np.sqrt(D // 8))
    want = FOC.focal_attention_reference(q, k, v, scale)
    got = FOC.focal_attention_fused(q, k, v, scale, q_block=64)
    for name, w, g in zip(("attended", "colmean", "diag", "rowmax"), want, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-5, rtol=2e-4, err_msg=name
        )


def test_focal_fused_grad_matches_reference(monkeypatch):
    _interp(monkeypatch)
    from cognitive_aim_tpu.kernels import focal_attention as FOC

    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (1, 96, 128)) * 0.5 for kk in ks)
    scale = 4.0

    def loss(fn):
        def f(q_, k_, v_):
            att, cm, dg, rm = fn(q_, k_, v_, scale)
            return att.sum() + cm.sum() * 2 + dg.sum() * 3 + rm.sum()
        return f

    g1 = jax.grad(loss(lambda *a: FOC.focal_attention_fused(*a, q_block=64)),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss(FOC.focal_attention_reference), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   rtol=5e-4)


def test_focal_apply_fused_matches_xla(monkeypatch):
    """streams.focal_apply(fused_attention=True) == XLA path."""
    _interp(monkeypatch)
    from cognitive_aim_tpu.models import streams as S

    key = jax.random.PRNGKey(0)
    p = S.focal_init(key, patch_dim=128)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 128)) * 0.5
    cur = jnp.asarray([0.3, 0.7])
    a = S.focal_apply(p, x, cur, noise_mode=S.NoiseMode.ZEROS)
    b = S.focal_apply(p, x, cur, noise_mode=S.NoiseMode.ZEROS,
                      fused_attention=True)
    for w, g in zip(a, b):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-5,
                                   rtol=2e-4)


def test_int8_block_kernels_match_xla_chain(monkeypatch):
    """qkv/fc1+gelu/out_res chained kernels == the XLA int8 op sequence."""
    _interp(monkeypatch)
    from cognitive_aim_tpu.kernels import int8_block as IB
    from cognitive_aim_tpu.kernels import int8_ops as I8

    B, N, D, F = 2, 70, 128, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (B, N, D), jnp.float32) * 0.5
    w_qkv = I8.quantize_weight(jax.random.normal(ks[1], (D, 3 * D)) * 0.05)
    w1 = I8.quantize_weight(jax.random.normal(ks[2], (D, F)) * 0.05)
    w2 = I8.quantize_weight(jax.random.normal(ks[3], (F, D)) * 0.05)
    b_qkv = jax.random.normal(ks[4], (3 * D,), jnp.float32) * 0.01
    b1 = jnp.zeros((F,), jnp.float32)
    b2 = jnp.zeros((D,), jnp.float32)
    ls = jnp.full((D,), 0.9, jnp.float32)

    # qkv split
    q, k, v = IB.int8_qkv_proj(x, w_qkv["q"], w_qkv["s"], b_qkv, n_block=64,
                               out_dtype=jnp.float32)
    want = I8.int8_linear(x, w_qkv, b_qkv)
    np.testing.assert_allclose(np.asarray(q), np.asarray(want[..., :D]),
                               atol=2e-5, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(v), np.asarray(want[..., 2 * D:]),
                               atol=2e-5, rtol=2e-4)

    # fc1 + gelu + requant, then fc2 + layerscale + residual
    h8, sh = IB.int8_fc1_gelu(x, w1["q"], w1["s"], b1, n_block=64)
    got = IB.int8_out_residual_prequant(h8, sh, w2["q"], w2["s"], b2, ls, x,
                                        n_block=64)
    h_ref = jax.nn.gelu(I8.int8_linear(x, w1, b1), approximate=True)
    h8_ref, sh_ref = I8.quantize_activations(h_ref)
    y_ref = I8.int8_matmul_prequant(h8_ref, sh_ref, w2, b2, jnp.float32)
    want2 = x + ls * y_ref
    np.testing.assert_allclose(np.asarray(got), np.asarray(want2), atol=2e-4,
                               rtol=2e-3)

    # attn_out + residual (bf16-in variant)
    wo = I8.quantize_weight(jax.random.normal(ks[5], (D, D)) * 0.05)
    got3 = IB.int8_out_residual(x, wo["q"], wo["s"], b2, ls, x, n_block=64)
    want3 = x + ls * I8.int8_linear(x, wo, b2)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want3), atol=2e-4,
                               rtol=2e-3)


def test_int8_ln_fused_kernels_match_unfused(monkeypatch):
    """LN-fused qkv/fc1 kernels == f32 layernorm followed by the unfused
    kernels (the fusion only moves the LN into VMEM)."""
    _interp(monkeypatch)
    from cognitive_aim_tpu.kernels import int8_block as IB
    from cognitive_aim_tpu.kernels import int8_ops as I8

    B, N, D, F = 2, 70, 128, 256
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    x = jax.random.normal(ks[0], (B, N, D), jnp.float32) * 0.5
    g = 1.0 + 0.1 * jax.random.normal(ks[1], (D,), jnp.float32)
    be = 0.05 * jax.random.normal(ks[2], (D,), jnp.float32)
    w_qkv = I8.quantize_weight(jax.random.normal(ks[3], (D, 3 * D)) * 0.05)
    w1 = I8.quantize_weight(jax.random.normal(ks[4], (D, F)) * 0.05)
    b_qkv = jax.random.normal(ks[5], (3 * D,), jnp.float32) * 0.01
    b1 = jnp.zeros((F,), jnp.float32)

    eps = 1e-6
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps) * g + be

    q, k, v = IB.int8_qkv_proj_ln(x, g, be, w_qkv["q"], w_qkv["s"], b_qkv,
                                  eps=eps, n_block=64, out_dtype=jnp.float32)
    qr, kr, vr = IB.int8_qkv_proj(xn, w_qkv["q"], w_qkv["s"], b_qkv,
                                  n_block=64, out_dtype=jnp.float32)
    for got, want in ((q, qr), (k, kr), (v, vr)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-4)

    h8, sh = IB.int8_fc1_gelu_ln(x, g, be, w1["q"], w1["s"], b1, eps=eps,
                                 n_block=64)
    h8_r, sh_r = IB.int8_fc1_gelu(xn, w1["q"], w1["s"], b1, n_block=64)
    np.testing.assert_allclose(np.asarray(sh), np.asarray(sh_r), rtol=2e-4)
    assert np.mean(np.asarray(h8) != np.asarray(h8_r)) < 0.01


def test_int8_mlp_fused_matches_split_kernels(monkeypatch):
    """One-kernel MLP (LN+fc1+GELU+requant+fc2+LayerScale+residual) == the
    split fc1_gelu_ln -> out_residual_prequant chain."""
    _interp(monkeypatch)
    from cognitive_aim_tpu.kernels import int8_block as IB
    from cognitive_aim_tpu.kernels import int8_ops as I8

    B, N, D, F = 2, 70, 128, 256
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    x = jax.random.normal(ks[0], (B, N, D), jnp.float32) * 0.5
    g = 1.0 + 0.1 * jax.random.normal(ks[1], (D,), jnp.float32)
    be = 0.05 * jax.random.normal(ks[2], (D,), jnp.float32)
    w1 = I8.quantize_weight(jax.random.normal(ks[3], (D, F)) * 0.05)
    w2 = I8.quantize_weight(jax.random.normal(ks[4], (F, D)) * 0.05)
    b1 = jnp.zeros((F,), jnp.float32)
    b2 = jnp.zeros((D,), jnp.float32)
    ls = jnp.full((D,), 0.9, jnp.float32)

    got = IB.int8_mlp_ln(x, g, be, w1["q"], w1["s"], b1, w2["q"], w2["s"],
                         b2, ls, n_block=64)
    h8, sh = IB.int8_fc1_gelu_ln(x, g, be, w1["q"], w1["s"], b1, n_block=64)
    want = IB.int8_out_residual_prequant(h8, sh, w2["q"], w2["s"], b2, ls, x,
                                         n_block=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4,
                               rtol=2e-3)


def test_flash_out_res_fused_matches_split(monkeypatch):
    """Attention + int8 attn_out + LayerScale + residual in one kernel ==
    packed attention followed by int8_out_residual."""
    _interp(monkeypatch)
    from cognitive_aim_tpu.kernels import int8_block as IB
    from cognitive_aim_tpu.kernels import int8_ops as I8
    from cognitive_aim_tpu.kernels.flash_attention import (
        flash_attention_packed,
        flash_attention_packed_out_res,
    )

    B, N, H, D = 2, 70, 4, 32
    HD = H * D
    ks = jax.random.split(jax.random.PRNGKey(4), 5)
    q = jax.random.normal(ks[0], (B, N, HD), jnp.float32) * 0.5
    k = jax.random.normal(ks[1], (B, N, HD), jnp.float32) * 0.5
    v = jax.random.normal(ks[2], (B, N, HD), jnp.float32) * 0.5
    res = jax.random.normal(ks[3], (B, N, HD), jnp.float32)
    wo = I8.quantize_weight(jax.random.normal(ks[4], (HD, HD)) * 0.05)
    b = jnp.zeros((HD,), jnp.float32)
    ls = jnp.full((HD,), 0.9, jnp.float32)

    got = flash_attention_packed_out_res(
        q, k, v, wo["q"], wo["s"], b, ls, res, D**-0.5, H, q_block=64)
    ctx = flash_attention_packed(q, k, v, D**-0.5, H, q_block=64)
    want = IB.int8_out_residual(ctx, wo["q"], wo["s"], b, ls, res, n_block=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4,
                               rtol=2e-3)


def test_dinov2_chained_int8_matches_xla_int8(monkeypatch):
    """The chained-block dispatch (qkv_i8 + pallas_packed + gelu_approx)
    matches the XLA int8 path end-to-end through dinov2.apply."""
    _interp(monkeypatch)
    import dataclasses

    from cognitive_aim_tpu.kernels.int8_ops import quantize_backbone_layers
    from cognitive_aim_tpu.nn import dinov2

    cfg = dataclasses.replace(
        dinov2.DinoV2Config(hidden_size=64, num_layers=2, num_heads=4,
                            patch_size=14, pretrain_image_size=56),
        gelu_approx=True,
    )
    params = dinov2.init(jax.random.PRNGKey(0), cfg)
    qp = dict(params)
    qp["layers"] = quantize_backbone_layers(params["layers"])
    assert "qkv_i8" in qp["layers"]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3)) * 0.5

    xla_lay = dict(qp["layers"])
    del xla_lay["qkv_i8"]  # force the per-projection XLA int8 path
    a = dinov2.apply({**qp, "layers": xla_lay}, x, cfg, attn_impl="pallas_packed")
    b = dinov2.apply(qp, x, cfg, attn_impl="pallas_packed")
    # both paths are int8-quantized; they differ only in epilogue rounding
    # order, which accumulates slightly across layers (measured on TPU at
    # full scale: chained-vs-bf16 deviation == XLA-int8-vs-bf16 deviation)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-2,
                               rtol=5e-2)


def test_chained_int8_per_layer_parity(monkeypatch):
    """Per-LAYER bound on the chained-int8 kernels vs the XLA int8 path —
    an order of magnitude tighter than the end-to-end 2e-2/5e-2 above:
    within one block the two paths differ only in epilogue rounding order
    (both consume identical int8 weights), so a single-layer comparison
    pins the deviation before it accumulates across the stack."""
    _interp(monkeypatch)
    import dataclasses

    from cognitive_aim_tpu.kernels.int8_ops import quantize_backbone_layers
    from cognitive_aim_tpu.nn import dinov2

    cfg = dataclasses.replace(
        dinov2.DinoV2Config(hidden_size=64, num_layers=1, num_heads=4,
                            patch_size=14, pretrain_image_size=56),
        gelu_approx=True,
    )
    params = dinov2.init(jax.random.PRNGKey(0), cfg)
    qlayers = quantize_backbone_layers(params["layers"])
    lp = jax.tree.map(lambda a: a[0], qlayers)  # unstack the single layer
    lp_xla = dict(lp)
    del lp_xla["qkv_i8"]  # per-projection XLA int8 path

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 17, 64), jnp.float32)
    got = np.asarray(dinov2._block_int8_chained(lp, x, cfg, "pallas_packed"))
    want = np.asarray(dinov2._block(lp_xla, x, cfg, "pallas_packed"))
    f32 = np.asarray(dinov2._block(
        jax.tree.map(lambda a: a[0], params["layers"]), x, cfg,
        "pallas_packed"))
    # absolute per-layer bound (vs 2e-2 end-to-end) ...
    np.testing.assert_allclose(got, want, atol=8e-3)
    # ... and relative to the quantization noise floor: the chained-vs-XLA
    # gap must not exceed the XLA-int8-vs-f32 quantization error itself
    # (both paths sit one rounding step from the float answer)
    assert np.abs(got - want).max() <= 1.5 * np.abs(want - f32).max()


def test_tp_mesh_composes_with_pallas_packed(monkeypatch):
    """VERDICT r1 weak #3: TP-sharded q/k/v ([B,N,H*D/2] per shard) through
    the packed Pallas kernel — GSPMD must produce the same result as the
    unsharded XLA path (verified on the DP2xTP2 virtual mesh)."""
    _interp(monkeypatch)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cognitive_aim_tpu.core.mesh import DATA_AXIS, make_mesh
    from cognitive_aim_tpu.nn import dinov2
    from cognitive_aim_tpu.parallel.sharding import shard_params

    cfg = dinov2.DinoV2Config(hidden_size=64, num_layers=2, num_heads=4,
                              patch_size=14, pretrain_image_size=56)
    params = dinov2.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 56, 56, 3))
    ref = dinov2.apply(params, x, cfg, attn_impl="xla")

    mesh = make_mesh(jax.devices()[:4], model_parallel=2)
    sp = shard_params(mesh, params, tensor_parallel=True)
    sx = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))
    out = jax.jit(
        lambda p, c: dinov2.apply(p, c, cfg, attn_impl="pallas_packed")
    )(sp, sx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4,
                               rtol=5e-4)


def test_mlp_nb_cap_shape_aware():
    """VMEM-budget-aware MLP block cap: ViT-B keeps the tuned 352; ViT-L
    (8.4 MB of resident int8 weights) drops to the measured 160 (round-3
    retune — 128 was the mid-round-2 safe point); a hypothetical huge F
    still returns a positive multiple of 32."""
    from cognitive_aim_tpu.kernels.int8_block import _mlp_nb_cap

    assert _mlp_nb_cap(768, 3072, 768) == 352
    assert _mlp_nb_cap(1024, 4096, 1024) == 160
    cap = _mlp_nb_cap(2048, 8192, 2048)
    assert cap >= 32 and cap % 32 == 0


def test_int8_mlp_ln_large_shapes_interpret(monkeypatch):
    """The fused MLP kernel stays correct at ViT-L-like channel widths
    (D=1024, F=4096 — where the block cap drops) on a short token dim."""
    _interp(monkeypatch)
    from cognitive_aim_tpu.kernels import int8_block as IB
    from cognitive_aim_tpu.kernels import int8_ops as I8

    B, N, D, F = 1, 40, 1024, 4096
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    x = jax.random.normal(ks[0], (B, N, D), jnp.float32) * 0.5
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)
    w1 = I8.quantize_weight(jax.random.normal(ks[1], (D, F)) * 0.03)
    w2 = I8.quantize_weight(jax.random.normal(ks[2], (F, D)) * 0.03)
    b1 = jnp.zeros((F,), jnp.float32)
    b2 = jnp.zeros((D,), jnp.float32)
    ls = jnp.full((D,), 0.9, jnp.float32)
    out = IB.int8_mlp_ln(x, g, be, w1["q"], w1["s"], b1,
                         w2["q"], w2["s"], b2, ls)
    assert out.shape == (B, N, D)
    # reference: f32 LN + dequantized GEMMs with the same quantization steps
    xn = (x - x.mean(-1, keepdims=True)) / jnp.sqrt(
        x.var(-1, keepdims=True) + 1e-6)
    xq, sx = I8.quantize_activations(xn)
    h = jax.nn.gelu(
        (xq.astype(jnp.float32) @ w1["q"].astype(jnp.float32)) * sx * w1["s"]
        + b1, approximate=True)
    hq, sh = I8.quantize_activations(h)
    y = (hq.astype(jnp.float32) @ w2["q"].astype(jnp.float32)) * sh * w2["s"] + b2
    ref = x + ls * y
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_int8_attnout_mlp_fused_matches_split(monkeypatch):
    """One-kernel attn_out+residual+LN2+MLP == out_residual -> mlp_ln."""
    _interp(monkeypatch)
    from cognitive_aim_tpu.kernels import int8_block as IB
    from cognitive_aim_tpu.kernels import int8_ops as I8

    B, N, D, F = 2, 70, 128, 256
    ks = jax.random.split(jax.random.PRNGKey(11), 6)
    ctx = jax.random.normal(ks[0], (B, N, D), jnp.float32) * 0.5
    res = jax.random.normal(ks[1], (B, N, D), jnp.float32) * 0.5
    g = 1.0 + 0.1 * jax.random.normal(ks[2], (D,), jnp.float32)
    be = 0.05 * jax.random.normal(ks[3], (D,), jnp.float32)
    wo = I8.quantize_weight(jax.random.normal(ks[4], (D, D)) * 0.05)
    w1 = I8.quantize_weight(jax.random.normal(ks[5], (D, F)) * 0.05)
    w2 = I8.quantize_weight(jax.random.normal(ks[0], (F, D)) * 0.05)
    bo = jnp.zeros((D,), jnp.float32)
    b1 = jnp.zeros((F,), jnp.float32)
    b2 = jnp.zeros((D,), jnp.float32)
    ls1 = jnp.full((D,), 0.8, jnp.float32)
    ls2 = jnp.full((D,), 0.9, jnp.float32)

    x_split = IB.int8_out_residual(ctx, wo["q"], wo["s"], bo, ls1, res)
    ref = IB.int8_mlp_ln(x_split, g, be, w1["q"], w1["s"], b1,
                         w2["q"], w2["s"], b2, ls2)
    out = IB.int8_attnout_mlp_ln(ctx, wo["q"], wo["s"], bo, ls1, res, g, be,
                                 w1["q"], w1["s"], b1, w2["q"], w2["s"], b2,
                                 ls2)
    # the fused path carries x in f32 between the two halves; the split
    # path round-trips through bf16 — tolerance covers that cast
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


# ------------------------------------------- proportional-attention bias ----
@pytest.mark.parametrize("N", [257, 200])
def test_flash_packed_bias_matches_reference(N, monkeypatch):
    """Key-side logit-bias kernel == XLA reference with the same bias."""
    _interp(monkeypatch)
    B, H, D = 2, 2, 64
    q, k, v = _qkv(B=B, N=N, H=H, D=D)
    qp, kp, vp = (t.reshape(B, N, H * D) for t in (q, k, v))
    bias = jax.random.normal(jax.random.PRNGKey(7), (B, N)) * 2.0
    scale = D**-0.5
    want = FA._packed_reference_bias(qp, kp, vp, bias, scale, H)
    got = FA.flash_attention_packed_bias(qp, kp, vp, bias, scale, H,
                                         q_block=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-4)


def test_flash_packed_i8qk_bias_close(monkeypatch):
    _interp(monkeypatch)
    B, N, H, D = 1, 260, 2, 64
    q, k, v = _qkv(B=B, N=N, H=H, D=D)
    qp, kp, vp = (t.reshape(B, N, H * D) for t in (q, k, v))
    bias = jax.random.normal(jax.random.PRNGKey(7), (B, N))
    scale = D**-0.5
    want = np.asarray(FA._packed_reference_bias(qp, kp, vp, bias, scale, H))
    got = np.asarray(
        FA.flash_attention_packed_i8qk_bias(qp, kp, vp, bias, scale, H))
    cos = np.sum(got * want, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1) + 1e-9
    )
    assert cos.min() > 0.999, cos.min()
    np.testing.assert_allclose(got, want, atol=0.08)


def test_flash_packed_bias_grad_flows(monkeypatch):
    """custom_vjp backward (XLA reference) produces finite grads for all
    four inputs, matching the direct reference gradient."""
    _interp(monkeypatch)
    B, N, H, D = 1, 96, 2, 32
    q, k, v = _qkv(B=B, N=N, H=H, D=D)
    qp, kp, vp = (t.reshape(B, N, H * D) for t in (q, k, v))
    bias = jax.random.normal(jax.random.PRNGKey(3), (B, N))
    scale = D**-0.5

    def loss(fn):
        return lambda a, b, c, d: fn(a, b, c, d).sum()

    g1 = jax.grad(loss(lambda *a: FA.flash_attention_packed_bias(
        *a, scale, H, 64)), argnums=(0, 1, 2, 3))(qp, kp, vp, bias)
    g2 = jax.grad(loss(lambda *a: FA._packed_reference_bias(*a, scale, H)),
                  argnums=(0, 1, 2, 3))(qp, kp, vp, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4)


def test_proportional_bias_exactness():
    """The property the '@p' filter variant rides on: if the n dropped
    tokens are IDENTICAL, attending over [kept, fused] with the fused
    token biased by +log(n) reproduces full attention over
    [kept, n copies] EXACTLY (the fused token is the copies' mean = the
    copy itself; exp(s + log n) = n*exp(s) recovers their joint softmax
    mass)."""
    B, H, D, n_kept, n_drop = 1, 2, 16, 5, 7
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    kept_k = jax.random.normal(ks[0], (B, n_kept, H, D))
    kept_v = jax.random.normal(ks[1], (B, n_kept, H, D))
    one_k = jax.random.normal(ks[2], (B, 1, H, D))
    one_v = jax.random.normal(ks[3], (B, 1, H, D))
    q = jax.random.normal(jax.random.PRNGKey(9), (B, n_kept + 1, H, D))

    # full set: kept tokens + n_drop identical copies
    k_full = jnp.concatenate([kept_k] + [one_k] * n_drop, axis=1)
    v_full = jnp.concatenate([kept_v] + [one_v] * n_drop, axis=1)
    q_full = jnp.concatenate(
        [q[:, :n_kept]] + [q[:, n_kept:]] * n_drop, axis=1)
    want = FA.attention_reference(q_full, k_full, v_full, D**-0.5)

    # filtered set: kept + ONE fused token (= the identical copy) with
    # a +log(n_drop) proportional-attention bias
    k_filt = jnp.concatenate([kept_k, one_k], axis=1)
    v_filt = jnp.concatenate([kept_v, one_v], axis=1)
    bias = jnp.concatenate(
        [jnp.zeros((B, n_kept)), jnp.full((B, 1), np.log(n_drop))], axis=1)
    got = FA.attention_reference_bias(q, k_filt, v_filt, bias, D**-0.5)

    np.testing.assert_allclose(
        np.asarray(got[:, :n_kept]), np.asarray(want[:, :n_kept]),
        atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got[:, n_kept]), np.asarray(want[:, n_kept]),
        atol=1e-6, rtol=1e-5)

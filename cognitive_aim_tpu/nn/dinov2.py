"""DINOv2 ViT backbone, TPU-native.

Re-implements the behavior of `transformers.Dinov2Model`
(ref:src/model.py:805-814 selects facebook/dinov2-base (768-d) or -large
(1024-d)) as pure functions over a parameter pytree:

  * patch embedding as reshape + matmul (mathematically equal to the 14x14
    stride-14 conv, but lowers to one big MXU matmul);
  * bicubic position-embedding interpolation (HF semantics: half-pixel,
    no antialias) via static resize matrices, so 224^2 (256 patches) and
    518^2 (1370 patches) inputs both work against a 37x37 pretrained grid;
  * pre-LN transformer blocks with LayerScale:
        x = x + ls1 * MHSA(LN1(x));  x = x + ls2 * MLP(LN2(x))
    softmax computed in f32 (matches HF eager attention);
  * transformer layers stacked on a leading axis and driven by lax.scan —
    one trace for all 12/24 layers (fast compile, XLA still pipelines);
  * functional LoRA: the reference's LoRALayer (ref:src/model.py:13-30) is
    broken & dead (calls undefined self.lora_projection, never invoked). Here
    LoRA keeps the reference's parameter shapes (lora_A [r, D] x0.01-randn,
    lora_B [D, r] zeros, scaling alpha/r, one adapter per backbone layer) but
    is actually applied — to the attention output projection:
        out = dense(ctx) + scaling * (ctx @ A.T) @ B.T
  * attention can route through the Pallas flash-attention kernel
    (kernels/flash_attention.py) via `attn_impl="pallas"`.

Parity: tests/test_dinov2_parity.py transplants random torch Dinov2Model
weights and checks outputs to ~1e-5 in f32.
"""

from __future__ import annotations

import dataclasses


import jax
import jax.numpy as jnp

from cognitive_aim_tpu.nn import init as tinit
from cognitive_aim_tpu.nn import layers as L
from cognitive_aim_tpu.nn.torch_interp import resize_weights


@dataclasses.dataclass(frozen=True)
class DinoV2Config:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    patch_size: int = 14
    pretrain_image_size: int = 518  # position-embedding grid = 37x37
    layer_norm_eps: float = 1e-6
    layerscale_value: float = 1.0
    use_lora: bool = False
    lora_rank: int = 16
    lora_alpha: int = 16
    # which projections carry adapters. The reference shape ("attn_out"
    # only, rank 16) is the default; the adapter-gated token-filter
    # sandwich (docs/PERF.md round-5) extends to ("qkv", "attn_out",
    # "fc1", "fc2") so a FROZEN base + trained adapters can absorb the
    # filter's distribution shift while the adapter-off exact path stays
    # bit-identical to the original weights.
    lora_targets: tuple = ("attn_out",)
    # tanh-approx GELU: ~6x faster on the VPU than HF's exact erf GELU
    # (measured 450 vs 71 Gelem/s on v5e); max deviation ~3e-4 per
    # activation. Parity policies keep exact erf.
    gelu_approx: bool = False

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @property
    def num_pretrain_patches(self):
        g = self.pretrain_image_size // self.patch_size
        return g * g

    @property
    def mlp_dim(self):
        return int(self.hidden_size * self.mlp_ratio)


BASE = DinoV2Config(hidden_size=768, num_layers=12, num_heads=12)
LARGE = DinoV2Config(hidden_size=1024, num_layers=24, num_heads=16)


def config_for(backbone_size: str, **kw) -> DinoV2Config:
    """Mirror of ref:src/model.py:803-812: 'base' -> 768-d, 'large' -> 1024-d,
    anything else falls back to base."""
    base = LARGE if backbone_size == "large" else BASE
    return dataclasses.replace(base, **kw)


# ------------------------------------------------------------------ init ----
def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *trees)


def init(key, cfg: DinoV2Config, dtype=jnp.float32):
    D, Ld = cfg.hidden_size, cfg.num_layers
    ks = jax.random.split(key, 6 + Ld)
    patch_in = cfg.patch_size * cfg.patch_size * 3

    def layer_init(k):
        kk = jax.random.split(k, 8)
        p = {
            "norm1": L.layernorm_init(D, dtype),
            "q": L.linear_init(kk[0], D, D, dtype),
            "k": L.linear_init(kk[1], D, D, dtype),
            "v": L.linear_init(kk[2], D, D, dtype),
            "attn_out": L.linear_init(kk[3], D, D, dtype),
            "ls1": jnp.full((D,), cfg.layerscale_value, dtype),
            "norm2": L.layernorm_init(D, dtype),
            "fc1": L.linear_init(kk[4], D, cfg.mlp_dim, dtype),
            "fc2": L.linear_init(kk[5], cfg.mlp_dim, D, dtype),
            "ls2": jnp.full((D,), cfg.layerscale_value, dtype),
        }
        if cfg.use_lora:
            r = cfg.lora_rank
            if "attn_out" in cfg.lora_targets:
                # reference shapes: lora_A [rank, in] * 0.01 randn, lora_B
                # zeros (ref:src/model.py:23-24)
                p["lora_A"] = 0.01 * jax.random.normal(kk[6], (r, D), dtype)
                p["lora_B"] = jnp.zeros((D, r), dtype)
            # extended targets (same A-randn/B-zeros scheme): adapter-gated
            # sandwich capacity beyond the reference's attn_out-only shape
            ext = {"qkv": (D, 3 * D), "fc1": (D, cfg.mlp_dim),
                   "fc2": (cfg.mlp_dim, D)}
            kext = jax.random.split(kk[7], len(ext))
            for ke, (name, (din, dout)) in zip(kext, sorted(ext.items())):
                if name in cfg.lora_targets:
                    p[f"lora_{name}_A"] = 0.01 * jax.random.normal(
                        ke, (r, din), dtype)
                    p[f"lora_{name}_B"] = jnp.zeros((dout, r), dtype)
        return p

    params = {
        "cls_token": jax.random.normal(ks[0], (1, 1, D), dtype),
        "mask_token": jnp.zeros((1, D), dtype),
        "pos_embed": jax.random.normal(
            ks[1], (1, cfg.num_pretrain_patches + 1, D), dtype
        ),
        "patch_embed": {
            "w": tinit.kaiming_uniform_linear(ks[2], patch_in, D, dtype),
            "b": tinit.linear_bias_default(ks[3], patch_in, D, dtype),
        },
        "layers": _stack([layer_init(k) for k in ks[6:]]),
        "final_norm": L.layernorm_init(D, dtype),
    }
    return params


# ------------------------------------------------------------- pos embed ----
def interpolate_pos_embed(pos_embed, cfg: DinoV2Config, grid_h: int, grid_w: int):
    """HF Dinov2 bicubic interpolation of the patch position embeddings
    (half-pixel, no antialias, computed in f32)."""
    n_pos = pos_embed.shape[1] - 1
    src = int(round(n_pos**0.5))
    if grid_h * grid_w == n_pos and grid_h == grid_w:
        return pos_embed
    cls_pos = pos_embed[:, :1]
    patch_pos = pos_embed[:, 1:].reshape(1, src, src, -1).astype(jnp.float32)
    Wh = jnp.asarray(resize_weights(src, grid_h, "bicubic"))
    Ww = jnp.asarray(resize_weights(src, grid_w, "bicubic"))
    out = jnp.einsum("oh,bhwd->bowd", Wh, patch_pos)
    out = jnp.einsum("pw,bowd->bopd", Ww, out)
    out = out.reshape(1, grid_h * grid_w, -1).astype(pos_embed.dtype)
    return jnp.concatenate([cls_pos, out], axis=1)


# --------------------------------------------------------------- forward ----
def _has_wq(layer_params) -> bool:
    return isinstance(layer_params.get("fc1"), dict) and "wq" in layer_params["fc1"]


def patchify(images, patch: int):
    """[B, H, W, 3] -> [B, (H/p)*(W/p), p*p*3], ordering identical to a
    stride-p conv + flatten (channel-fastest within each patch to match the
    torch conv weight layout after conversion)."""
    B, H, W, C = images.shape
    gh, gw = H // patch, W // patch
    x = images.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B gh gw p p C
    return x.reshape(B, gh * gw, patch * patch * C)


def _lin(p, x):
    """Dense projection: f32/bf16 matmul, or the int8 MXU path when the
    weight has been quantized (kernels/int8_ops.quantize_backbone_layers).
    On TPU the int8 path uses the fused Pallas GEMM (in-VMEM quantization,
    one HBM pass); elsewhere the XLA fallback."""
    if "wq" in p:
        # XLA's int8 dot + fused quantize chains measured faster end-to-end
        # than the hand-written Pallas GEMM (407 vs 332 img/s @518^2) — the
        # Pallas variant (kernels/int8_gemm.py) stays available for tuning.
        from cognitive_aim_tpu.kernels.int8_ops import int8_linear

        return int8_linear(x, p["wq"], p.get("b"))
    return L.linear_apply(p, x)


def merge_lora(params, scaling: float):
    """Fold trained adapters into the dense weights: W' = W + scaling
    * A^T B^T per target (scaling = lora_alpha / lora_rank), dropping the
    lora tensors.

    The deployment transform of the adapter-gated filter sandwich
    (docs/PERF.md round-5): training keeps the adapters runtime-gated
    (so the frozen base stays bit-identical for the exact path), but the
    FILTERED serving engine folds them in once at load time — zero
    runtime overhead (rank-64 adapters on all four targets would
    otherwise add ~11% dense FLOPs to the fast path) and the folded
    weights then ride the ordinary int8 quantization. Mathematically
    identical to the runtime adapter (x@(W+dW) = x@W + x@dW) up to float
    rounding; δ grids measure the folded graph, i.e. what deploys.

    Returns a new params tree; input is not mutated. No-op (same tree)
    when no adapter tensors are present."""
    layers = params.get("layers", {})
    if not any(k.startswith("lora") for k in layers):
        return params

    def fold(wa, a, b):
        # a [L, r, din], b [L, dout, r] -> dW [L, din, dout]
        dw = jnp.einsum("lrd,lor->ldo", a, b)
        return wa + scaling * dw.astype(wa.dtype)

    lay = dict(layers)
    if "lora_A" in lay:  # reference-named attn_out adapter
        ao = dict(lay["attn_out"])
        ao["w"] = fold(ao["w"], lay.pop("lora_A"), lay.pop("lora_B"))
        lay["attn_out"] = ao
    for name in ("fc1", "fc2"):
        if f"lora_{name}_A" in lay:
            lin = dict(lay[name])
            lin["w"] = fold(lin["w"], lay.pop(f"lora_{name}_A"),
                            lay.pop(f"lora_{name}_B"))
            lay[name] = lin
    if "lora_qkv_A" in lay:
        a = lay.pop("lora_qkv_A")
        b = lay.pop("lora_qkv_B")  # [L, 3D, r] over concatenated q,k,v
        D = a.shape[-1]
        dqkv = scaling * jnp.einsum("lrd,lor->ldo", a, b)  # [L, D, 3D]
        for i, name in enumerate(("q", "k", "v")):
            lin = dict(lay[name])
            lin["w"] = lin["w"] + dqkv[..., i * D:(i + 1) * D].astype(
                lin["w"].dtype)
            lay[name] = lin
    out = dict(params)
    out["layers"] = lay
    return out


def _lora_delta(p, name, x, cfg: DinoV2Config):
    """scaling * (x @ A.T) @ B.T for extended-target adapters, or None.

    Low-rank additive path on the qkv / fc1 / fc2 projections (the
    attn_out adapter keeps the reference's bare lora_A/lora_B names and
    is applied inline in _mhsa). Gated by cfg.use_lora: an exact-path
    model built with use_lora=False IGNORES adapter tensors present in
    the param tree, which is what makes the adapter-gated filter
    sandwich's exact path bit-identical to the original weights."""
    a = p.get(f"lora_{name}_A")
    if not cfg.use_lora or a is None:
        return None
    b = p[f"lora_{name}_B"]
    scaling = cfg.lora_alpha / cfg.lora_rank
    return scaling * ((x @ a.T.astype(x.dtype)) @ b.T.astype(x.dtype))


def _mhsa(p, x, cfg: DinoV2Config, attn_impl: str, k_bias=None):
    """k_bias: optional [B, N] f32 additive key-side logit bias —
    proportional attention for the token filter's fused/merged tokens
    (each gets +log(#source tokens it represents), so the post-filter
    softmax approximates the full-token-set distribution; see
    docs/PERF.md round-4 CLS-drift mechanism)."""
    B, N, D = x.shape
    H, hd = cfg.num_heads, cfg.head_dim
    dqkv = _lora_delta(p, "qkv", x, cfg)  # [B, N, 3D] or None
    if attn_impl in ("pallas_packed", "pallas_packed_i8qk"):
        # packed kernel consumes [B, N, H*D] directly — no head transpose
        from cognitive_aim_tpu.kernels.flash_attention import (
            flash_attention_packed,
            flash_attention_packed_bias,
            flash_attention_packed_i8qk,
            flash_attention_packed_i8qk_bias,
        )

        if "qkv_i8" in p:
            # fused int8 qkv: one in-VMEM-quantizing GEMM over [D, 3D]
            from cognitive_aim_tpu.kernels.int8_gemm import int8_linear_fused

            qkv = int8_linear_fused(x, p["qkv_i8"]["wq"], p["qkv_i8"]["b"])
            if dqkv is not None:
                qkv = qkv + dqkv
            qp, kp, vp = jnp.split(qkv, 3, axis=-1)
        elif "wq" in p.get("q", {}):
            from cognitive_aim_tpu.kernels import int8_ops as I8

            xq, sx = I8.quantize_activations(x)
            qp = I8.int8_matmul_prequant(xq, sx, p["q"]["wq"], p["q"].get("b"), x.dtype)
            kp = I8.int8_matmul_prequant(xq, sx, p["k"]["wq"], p["k"].get("b"), x.dtype)
            vp = I8.int8_matmul_prequant(xq, sx, p["v"]["wq"], p["v"].get("b"), x.dtype)
            if dqkv is not None:
                dq, dk, dv = jnp.split(dqkv, 3, axis=-1)
                qp, kp, vp = qp + dq, kp + dk, vp + dv
        elif "qkv_w" in p:
            qkv = x @ p["qkv_w"] + p["qkv_b"]
            if dqkv is not None:
                qkv = qkv + dqkv
            qp, kp, vp = jnp.split(qkv, 3, axis=-1)
        else:
            qp = L.linear_apply(p["q"], x)
            kp = L.linear_apply(p["k"], x)
            vp = L.linear_apply(p["v"], x)
            if dqkv is not None:
                dq, dk, dv = jnp.split(dqkv, 3, axis=-1)
                qp, kp, vp = qp + dq, kp + dk, vp + dv
        if attn_impl == "pallas_packed_i8qk":
            # int8 QK^T with quantization hoisted OUT of the kernel (fuses
            # into the projection epilogue); round 1's in-kernel quantization
            # variant lost (364 vs 405 img/s) to redundant per-q-block VPU
            # requantization of K — this one quantizes once per layer.
            if k_bias is not None:
                ctx = flash_attention_packed_i8qk_bias(qp, kp, vp, k_bias,
                                                       hd**-0.5, H)
            else:
                ctx = flash_attention_packed_i8qk(qp, kp, vp, hd**-0.5, H)
        elif k_bias is not None:
            ctx = flash_attention_packed_bias(qp, kp, vp, k_bias,
                                              hd**-0.5, H)
        else:
            ctx = flash_attention_packed(qp, kp, vp, hd**-0.5, H)
        out = _lin(p["attn_out"], ctx)
        if cfg.use_lora and "lora_A" in p:
            scaling = cfg.lora_alpha / cfg.lora_rank
            out = out + scaling * ((ctx @ p["lora_A"].T) @ p["lora_B"].T)
        return out
    if "qkv_w" in p:  # fused projection: one [D, 3D] MXU matmul
        qkv = x @ p["qkv_w"] + p["qkv_b"]
        if dqkv is not None:
            qkv = qkv + dqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, N, H, hd)
        k = k.reshape(B, N, H, hd)
        v = v.reshape(B, N, H, hd)
    elif "wq" in p["q"]:
        # quantize the shared input once for all three projections
        from cognitive_aim_tpu.kernels import int8_ops as I8

        xq, sx = I8.quantize_activations(x)
        q = I8.int8_matmul_prequant(xq, sx, p["q"]["wq"], p["q"].get("b"), x.dtype)
        k = I8.int8_matmul_prequant(xq, sx, p["k"]["wq"], p["k"].get("b"), x.dtype)
        v = I8.int8_matmul_prequant(xq, sx, p["v"]["wq"], p["v"].get("b"), x.dtype)
        if dqkv is not None:
            dq, dk, dv = jnp.split(dqkv, 3, axis=-1)
            q, k, v = q + dq, k + dk, v + dv
        q = q.reshape(B, N, H, hd)
        k = k.reshape(B, N, H, hd)
        v = v.reshape(B, N, H, hd)
    else:
        q = _lin(p["q"], x).reshape(B, N, H, hd)
        k = _lin(p["k"], x).reshape(B, N, H, hd)
        v = _lin(p["v"], x).reshape(B, N, H, hd)
        if dqkv is not None:
            dq, dk, dv = (d.reshape(B, N, H, hd)
                          for d in jnp.split(dqkv, 3, axis=-1))
            q, k, v = q + dq, k + dk, v + dv
    if attn_impl == "pallas" and k_bias is None:
        from cognitive_aim_tpu.kernels.flash_attention import flash_attention

        ctx = flash_attention(q, k, v, scale=hd**-0.5)
    else:
        # xla path (also the pallas-v1 fallback when a bias is present —
        # the v1 kernel predates the bias plumbing and isn't a fast path)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd**-0.5)
        if k_bias is not None:
            scores = scores + k_bias[:, None, None, :].astype(scores.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bqhd", probs, v)
    ctx = ctx.reshape(B, N, D)
    out = _lin(p["attn_out"], ctx)
    if cfg.use_lora and "lora_A" in p:
        scaling = cfg.lora_alpha / cfg.lora_rank
        out = out + scaling * ((ctx @ p["lora_A"].T) @ p["lora_B"].T)
    return out


def _block(p, x, cfg: DinoV2Config, attn_impl: str, k_bias=None):
    h = L.layernorm_apply(p["norm1"], x, cfg.layer_norm_eps)
    x = x + p["ls1"] * _mhsa(p, h, cfg, attn_impl, k_bias)
    h = L.layernorm_apply(p["norm2"], x, cfg.layer_norm_eps)
    h1 = _lin(p["fc1"], h)
    d1 = _lora_delta(p, "fc1", h, cfg)
    if d1 is not None:
        h1 = h1 + d1
    g = jax.nn.gelu(h1, approximate=cfg.gelu_approx)
    h2 = _lin(p["fc2"], g)
    d2 = _lora_delta(p, "fc2", g, cfg)
    if d2 is not None:
        h2 = h2 + d2
    x = x + p["ls2"] * h2
    return x


def _block_int8_chained(p, x, cfg: DinoV2Config, attn_impl: str, k_bias=None):
    """Int8 inference block in FOUR Pallas kernel launches:

      1. int8_qkv_proj_ln  — LN1 + quant + fused [D,3D] GEMM + split
      2. flash attention   — packed layout, whole K/V VMEM-resident
      3. int8_out_residual — int8 attn_out + LayerScale + residual
      4. int8_mlp_ln       — LN2 + quant + fc1 + GELU + requant + fc2 +
         LayerScale + residual (the [*, F] hidden never reaches HBM)

    The only bare intermediates between kernels are q/k/v, the attention
    context, and the residual stream. Same math as _block to within
    quantization rounding (the layernorms run in f32 here)."""
    from cognitive_aim_tpu.kernels import int8_block as IB
    from cognitive_aim_tpu.kernels.flash_attention import (
        flash_attention_packed,
        flash_attention_packed_bias,
        flash_attention_packed_i8qk,
        flash_attention_packed_i8qk_bias,
    )

    H, hd = cfg.num_heads, cfg.head_dim
    eps = cfg.layer_norm_eps

    qp, kp, vp = IB.int8_qkv_proj_ln(
        x, p["norm1"]["scale"], p["norm1"]["bias"],
        p["qkv_i8"]["wq"]["q"], p["qkv_i8"]["wq"]["s"], p["qkv_i8"]["b"],
        eps=eps,
    )
    if attn_impl == "pallas_packed_i8qk":
        if k_bias is not None:
            ctx = flash_attention_packed_i8qk_bias(qp, kp, vp, k_bias,
                                                   hd**-0.5, H)
        else:
            ctx = flash_attention_packed_i8qk(qp, kp, vp, hd**-0.5, H)
    elif k_bias is not None:
        ctx = flash_attention_packed_bias(qp, kp, vp, k_bias, hd**-0.5, H)
    else:
        # NOTE: flash_attention_packed_out_res (attn_out fused into the
        # attention epilogue) measured SLOWER end-to-end (454 vs 462 img/s
        # @518^2 B16) — the projection serializes with the attention dots
        # inside each program, while the separate out_residual launch
        # pipelines; kept in-tree as a tested negative result.
        ctx = flash_attention_packed(qp, kp, vp, hd**-0.5, H)
    import os as _os

    if _os.environ.get("CAIM_FUSE_AOMLP", "0") == "1":
        # experimental: steps 3+4 in ONE kernel (the post-attention
        # residual never reaches HBM) — A/B via env until measured
        return IB.int8_attnout_mlp_ln(
            ctx, p["attn_out"]["wq"]["q"], p["attn_out"]["wq"]["s"],
            p["attn_out"]["b"], p["ls1"], x,
            p["norm2"]["scale"], p["norm2"]["bias"],
            p["fc1"]["wq"]["q"], p["fc1"]["wq"]["s"], p["fc1"]["b"],
            p["fc2"]["wq"]["q"], p["fc2"]["wq"]["s"], p["fc2"]["b"],
            p["ls2"], eps=eps,
        )
    x = IB.int8_out_residual(
        ctx, p["attn_out"]["wq"]["q"], p["attn_out"]["wq"]["s"],
        p["attn_out"]["b"], p["ls1"], x,
    )

    x = IB.int8_mlp_ln(
        x, p["norm2"]["scale"], p["norm2"]["bias"],
        p["fc1"]["wq"]["q"], p["fc1"]["wq"]["s"], p["fc1"]["b"],
        p["fc2"]["wq"]["q"], p["fc2"]["wq"]["s"], p["fc2"]["b"],
        p["ls2"], eps=eps,
    )
    return x


# ------------------------------------------------------- token filtering ----
def _layer_qk_weights(lp, cfg: DinoV2Config):
    """Extract float (Wq, bq, Wk, bk) from whichever parameter layout the
    (possibly transformed) layer stack uses: separate q/k, fused qkv_w, or
    the int8-quantized qkv_i8 {q: int8 [D, 3D], s: f32 [3D]}."""
    D = cfg.hidden_size
    if "qkv_i8" in lp:
        w = lp["qkv_i8"]["wq"]["q"].astype(jnp.float32) * lp["qkv_i8"]["wq"]["s"]
        b = lp["qkv_i8"]["b"]
        return w[:, :D], b[:D], w[:, D:2 * D], b[D:2 * D]
    if "qkv_w" in lp:
        w, b = lp["qkv_w"], lp["qkv_b"]
        return w[:, :D], b[:D], w[:, D:2 * D], b[D:2 * D]

    def _unq(p):
        if "wq" in p:
            return p["wq"]["q"].astype(jnp.float32) * p["wq"]["s"], p.get("b")
        return p["w"], p.get("b")

    wq, bq = _unq(lp["q"])
    wk, bk = _unq(lp["k"])
    return wq, bq, wk, bk


def _cls_importance(lp, x, cfg: DinoV2Config, return_keys: bool = False):
    """Patch-token importance [B, P]: the CLS row of the NEXT layer's
    attention (EViT-style, arXiv:2506.01519 pattern), averaged over heads.
    Costs one [B, N, D] x [D, D] key projection plus a [B, 1, N] score row —
    ~0.5% of a full forward; the layer then recomputes q/k for the kept set.

    With return_keys=True also returns the full key projection [B, N, D]
    (f32, heads flattened) — the merge-mode filter reuses it as the token
    similarity embedding (ToMe, arXiv:2210.09461, uses attention keys for
    exactly this), so assignment costs no extra projection.
    """
    H, hd = cfg.num_heads, cfg.head_dim
    h = L.layernorm_apply(
        jax.tree.map(lambda a: a.astype(jnp.float32), lp["norm1"]),
        x.astype(jnp.float32), cfg.layer_norm_eps,
    )
    wq, bq, wk, bk = _layer_qk_weights(lp, cfg)
    q_cls = h[:, 0] @ wq.astype(jnp.float32)
    if bq is not None:
        q_cls = q_cls + bq
    k = h @ wk.astype(jnp.float32)
    if bk is not None:
        k = k + bk
    B, N, D = k.shape
    q_cls = q_cls.reshape(B, H, hd)
    kh = k.reshape(B, N, H, hd)
    scores = jnp.einsum("bhd,bnhd->bhn", q_cls, kh) * (hd ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    imp = probs.mean(axis=1)[:, 1:]  # patch columns
    if return_keys:
        return imp, k
    return imp


def _group_fused(x_tokens, w, groups, n_groups: int, w_fallback=None):
    """[n_groups] context tokens: per-group importance-weighted means of
    the weighted (dropped) tokens. groups: [B, T] int32 group id per
    token; w: [B, T] weights (importance x dropped-mask). The per-group
    reduction is a masked sum — no [B, T, G] materialization, G is a
    small static constant (1/4/9/16). w_fallback ([B, T] or None): used
    for a group whose w-mass is zero (e.g. a guided quadrant that was
    fully KEPT has no dropped tokens) — the group's context token then
    becomes its importance-weighted mean over ALL its tokens instead of
    a zero-vector artifact."""
    dt = x_tokens.dtype
    outs = []
    for g in range(n_groups):
        gmask = (groups == g).astype(dt)
        wg = w * gmask
        den = wg.sum(axis=1, keepdims=True)
        if w_fallback is not None:
            use_fb = (den <= 0).astype(dt)
            wg = wg + use_fb * (w_fallback * gmask)
            den = wg.sum(axis=1, keepdims=True)
        outs.append((x_tokens * wg[..., None]).sum(axis=1, keepdims=True)
                    / (den[..., None] + jnp.asarray(1e-9, dt)))
    return jnp.concatenate(outs, axis=1)


def _keep_indices(importance, keep_weights, k_keep: int,
                  ctx_frac: float = 0.0):
    """Kept-set selection shared by every filter variant.

    Priority = CLS attention + 10 * (guidance weight - 1), so guided-region
    tokens outrank background (see _filter_tokens for the tier arithmetic).
    ctx_frac > 0 ('@cF') reserves round(ctx_frac * k_keep) slots of the
    keep budget for the top tokens by RAW importance — scene context
    chosen by what the CLS token actually attends to, immune to the
    guidance boost. Without it, a small keep budget is spent entirely
    inside the guided disc (at 518² the boosted tiers cover ~452 tokens,
    so k <= 452 keeps ZERO background): the kept tokens then run the
    remaining blocks with no scene context, and on weights whose guided
    answer genuinely depends on scene structure (the concentrated-
    attention regime, docs/PERF.md round-4 section) the guided output
    collapses toward a global prior. On an unguided row (keep_weights
    None or all-ones) the reserve is an exact no-op: both top_k calls
    read the same ranking, and their union is top_k(importance, k_keep).
    Returns [B, k_keep] ascending patch indices."""
    prio = importance
    if keep_weights is not None:
        prio = prio + 10.0 * (keep_weights.astype(jnp.float32) - 1.0)
    k_ctx = int(round(k_keep * ctx_frac)) if keep_weights is not None else 0
    if k_ctx <= 0:
        _, idx = jax.lax.top_k(prio, k_keep)
        return jnp.sort(idx, axis=1)
    B, P = importance.shape
    _, idx_g = jax.lax.top_k(prio, k_keep - k_ctx)
    taken = jnp.zeros((B, P), jnp.float32).at[
        jnp.arange(B)[:, None], idx_g
    ].set(1.0)
    # mask out the already-kept tokens; importance is in [0, 1] so the
    # -1e9 offset can't collide with any live value
    _, idx_c = jax.lax.top_k(importance - 1e9 * taken, k_ctx)
    return jnp.sort(jnp.concatenate([idx_g, idx_c], axis=1), axis=1)


def _filter_tokens(x, importance, keep_weights, k_keep: int,
                   fuse: bool = False, fuse_groups=None,
                   fuse_n_groups: int = 0, ctx_frac: float = 0.0):
    """Keep CLS + the k_keep highest-priority patch tokens.

    Priority = CLS attention + 10 * (guidance weight - 1): guided-region
    tokens (mask weight > 1, models/guidance.py tiers 5/3/2/1.5) always
    outrank background, core outranks mid tier, and within a tier the CLS
    attention decides. The multiplier must stay small enough that the tier
    offsets (>= 5 here, tiers separated by >= 0.5) don't swamp f32
    precision against the <= 1.0 importances — an earlier 1e5 offset
    rounded the importance away entirely and degraded within-tier
    selection to lowest-index order. With fuse=True an extra token — the
    CLS-attention-weighted mean of the DROPPED tokens (EViT-style) — is
    appended so the kept set retains aggregate global context through the
    remaining blocks. fuse_groups (host [P] int32 spatial group ids with
    fuse_n_groups consecutive values, or None) stratifies that into one
    context token PER GROUP (quadrants
    etc.): global aggregates — exactly what adversarially-global depth
    laws read — survive the drop as G regional means instead of one
    scalar summary. Returns ([B, 1+k(+G), D] filtered stream, [B, k]
    patch indices, ascending so the kept sub-sequence preserves spatial
    order)."""
    idx = _keep_indices(importance, keep_weights, k_keep, ctx_frac)
    kept = jnp.take_along_axis(x[:, 1:], idx[..., None], axis=1)
    parts = [x[:, :1], kept]
    if fuse:
        B, P = importance.shape
        kept_mask = jnp.zeros((B, P), x.dtype).at[
            jnp.arange(B)[:, None], idx
        ].set(1.0)
        w = importance.astype(x.dtype) * (1.0 - kept_mask)
        if fuse_groups is not None:
            n_groups = fuse_n_groups or int(fuse_groups.max()) + 1
            groups = jnp.broadcast_to(jnp.asarray(fuse_groups)[None], (B, P))
            parts.append(_group_fused(
                x[:, 1:], w, groups, n_groups,
                w_fallback=importance.astype(x.dtype)))
        else:
            denom = w.sum(axis=1, keepdims=True) + jnp.asarray(1e-9, x.dtype)
            fused = (x[:, 1:] * w[..., None]).sum(axis=1, keepdims=True) / (
                denom[..., None]
            )
            parts.append(fused)
    return jnp.concatenate(parts, axis=1), idx


def _refilter_tokens(x, imp_all, k_prev: int, keep_w_gathered, k_keep: int,
                     fuse: bool = False, groups_gathered=None,
                     n_groups: int = 1, ctx_frac: float = 0.0):
    """Progressive-filtering stage 2+: the stream is already filtered to
    [B, 1 + k_prev (+G fused), D]. Keep the k_keep highest-priority of the
    k_prev patch tokens (same priority formula as _filter_tokens, with the
    guidance weights pre-gathered at the surviving indices) and re-fuse the
    newly dropped tokens into the context token(s): each new fused token is
    the importance-weighted mean of (dropped patches [of its group] + the
    group's old fused token), so aggregate global context accumulates
    across stages instead of being discarded at each drop. groups_gathered:
    [B, k_prev] spatial group ids of the surviving tokens (required when
    n_groups > 1). Returns (filtered stream, [B, k_keep] LOCAL indices
    into the previous kept set, ascending)."""
    B = x.shape[0]
    n_fused_in = x.shape[1] - 1 - k_prev
    imp_p = imp_all[:, :k_prev]
    idx = _keep_indices(imp_p, keep_w_gathered, k_keep, ctx_frac)
    patches = x[:, 1:1 + k_prev]
    kept = jnp.take_along_axis(patches, idx[..., None], axis=1)
    parts = [x[:, :1], kept]
    if fuse:
        kept_mask = jnp.zeros((B, k_prev), x.dtype).at[
            jnp.arange(B)[:, None], idx
        ].set(1.0)
        w = imp_p.astype(x.dtype) * (1.0 - kept_mask)
        if n_groups > 1:
            if n_fused_in not in (0, n_groups):
                raise ValueError(
                    f"fused-context token count mismatch: stream carries "
                    f"{n_fused_in} context tokens but n_groups={n_groups} "
                    f"(stage disagreement — a bug in the caller)")
            x_in, w_in, g_in = patches, w, groups_gathered
            fb = imp_p.astype(x.dtype)
            if n_fused_in:
                # old context tokens join their own group's reduction,
                # weighted by their CLS importances — regional context
                # accumulates across stages
                gids = jnp.broadcast_to(
                    jnp.arange(n_groups)[None], (B, n_groups))
                x_in = jnp.concatenate(
                    [patches, x[:, 1 + k_prev:1 + k_prev + n_groups]], axis=1)
                w_f = imp_all[:, k_prev:k_prev + n_groups].astype(x.dtype)
                w_in = jnp.concatenate([w, w_f], axis=1)
                g_in = jnp.concatenate([groups_gathered, gids], axis=1)
                fb = jnp.concatenate([fb, w_f], axis=1)
            parts.append(_group_fused(x_in, w_in, g_in, n_groups,
                                      w_fallback=fb))
        else:
            num = (patches * w[..., None]).sum(axis=1, keepdims=True)
            den = w.sum(axis=1, keepdims=True)
            if n_fused_in >= 1:
                w_f = imp_all[:, k_prev:k_prev + 1].astype(x.dtype)
                num = num + x[:, 1 + k_prev:2 + k_prev] * w_f[..., None]
                den = den + w_f
            fused = num / (den[..., None] + jnp.asarray(1e-9, x.dtype))
            parts.append(fused)
    return jnp.concatenate(parts, axis=1), idx


def _scatter_tokens(x_full, x_filtered, idx):
    """Write the updated CLS + kept patch tokens back into the full-length
    stream (dropped tokens keep their filter-point values). Any trailing
    fused-context token beyond the k kept patches is discarded."""
    k = idx.shape[1]
    patches = jax.vmap(lambda p, i, v: p.at[i].set(v))(
        x_full[:, 1:], idx, x_filtered[:, 1:1 + k]
    )
    return jnp.concatenate([x_filtered[:, :1], patches], axis=1)


def _complement_indices(idx, n_total: int, n_drop: int):
    """Dropped-index set as the EXACT complement of the kept set `idx`
    [B, k]. Deriving it independently via top_k(-prio) is wrong on an
    exact priority tie at the keep boundary: both top_k calls prefer the
    same lowest index, so one token lands in both sets and another in
    neither (its rep/slot entry silently stays 0). All complement entries
    share the mask value 1.0, so this top_k has no cross-set tie to get
    wrong; returned ascending."""
    B = idx.shape[0]
    mask = jnp.ones((B, n_total), jnp.float32).at[
        jnp.arange(B)[:, None], idx
    ].set(0.0)
    _, idx_drop = jax.lax.top_k(mask, n_drop)
    return jnp.sort(idx_drop, axis=1)


def _filter_tokens_merge(x, importance, keys, keep_weights, k_keep: int,
                         ctx_frac: float = 0.0):
    """Merge-mode filtering (ToMe-style, arXiv:2210.09461): keep the same
    top-k_keep priority tokens as _filter_tokens, but ABSORB each dropped
    token into its most similar kept token (cosine similarity over the
    attention keys already computed for the importance ranking) instead of
    freezing it at its filter-point value.

    Two differences from drop mode, both aimed at prediction parity:
      1. a dropped token's evidence stays live — its features are averaged
         into a kept representative that keeps evolving through the
         remaining blocks (drop mode loses everything but one fused
         context token);
      2. at un-filter time the dropped POSITION reads its representative's
         FINAL-layer feature (see the rep map) instead of a stale early-
         layer one — the downstream focal/ambient streams never see frozen
         features.

    The assignment is a [P-k, k] cosine-argmax in f32 plus a one-hot
    einsum (MXU-friendly; ~0.5 GFLOP/image at 518² — <0.2% of a forward).

    Returns (x_filtered [B, 1+k, D], idx [B, k] kept patch indices,
    rep [B, P] slot map: patch position -> row of the filtered patch block
    whose final feature should stand for it, sizes [B, k] merged-group
    sizes for multi-stage size-weighted re-merging)."""
    B, P = importance.shape
    idx = _keep_indices(importance, keep_weights, k_keep, ctx_frac)
    n_drop = P - k_keep
    patches = x[:, 1:]
    kept = jnp.take_along_axis(patches, idx[..., None], axis=1)
    if n_drop == 0:
        rep = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None], (B, P))
        return (jnp.concatenate([x[:, :1], kept], axis=1), idx, rep,
                jnp.ones((B, k_keep), jnp.float32))
    idx_drop = _complement_indices(idx, P, n_drop)
    dropped = jnp.take_along_axis(patches, idx_drop[..., None], axis=1)
    kp = keys[:, 1:]  # patch rows of the key projection
    kn = kp * jax.lax.rsqrt(
        jnp.sum(kp * kp, axis=-1, keepdims=True) + 1e-12)
    k_kept = jnp.take_along_axis(kn, idx[..., None], axis=1)
    k_drop = jnp.take_along_axis(kn, idx_drop[..., None], axis=1)
    sim = jnp.einsum("bjd,bkd->bjk", k_drop, k_kept)
    assign = jnp.argmax(sim, axis=-1).astype(jnp.int32)  # [B, P-k]
    onehot = jax.nn.one_hot(assign, k_keep, dtype=jnp.float32)
    absorbed = jnp.einsum("bjk,bjd->bkd", onehot,
                          dropped.astype(jnp.float32))
    cnt = onehot.sum(axis=1)  # [B, k]
    merged = ((kept.astype(jnp.float32) + absorbed)
              / (1.0 + cnt)[..., None]).astype(x.dtype)
    brow = jnp.arange(B)[:, None]
    rep = jnp.zeros((B, P), jnp.int32)
    rep = rep.at[brow, idx].set(
        jnp.broadcast_to(jnp.arange(k_keep, dtype=jnp.int32)[None],
                         (B, k_keep)))
    rep = rep.at[brow, idx_drop].set(assign)
    return (jnp.concatenate([x[:, :1], merged], axis=1), idx, rep,
            1.0 + cnt)


def _assign_dropped(importance, keys, keep_weights, idx, k_keep: int):
    """Delta-correction helper: for the SAME kept set as _filter_tokens
    (idx), return (idx_drop [B, P-k] sorted dropped patch indices — the
    exact complement of idx, see _complement_indices; keep_weights is
    retained in the signature for call-site symmetry but no longer enters
    the set derivation — assign [B, P-k] index into the kept set of each
    dropped token's most-similar kept token by key cosine). Used by '@d'
    mode to transplant each kept representative's accumulated
    residual-stream update onto its dropped neighbours at un-filter
    time."""
    del keep_weights  # kept set fully determines the complement
    B, P = importance.shape
    idx_drop = _complement_indices(idx, P, P - k_keep)
    kp = keys[:, 1:]
    kn = kp * jax.lax.rsqrt(
        jnp.sum(kp * kp, axis=-1, keepdims=True) + 1e-12)
    k_kept = jnp.take_along_axis(kn, idx[..., None], axis=1)
    k_drop = jnp.take_along_axis(kn, idx_drop[..., None], axis=1)
    sim = jnp.einsum("bjd,bkd->bjk", k_drop, k_kept)
    return idx_drop, jnp.argmax(sim, axis=-1).astype(jnp.int32)


def _refilter_tokens_merge(x, imp_all, keys, k_prev: int, keep_w_gathered,
                           k_keep: int, sizes, ctx_frac: float = 0.0):
    """Progressive merge stage 2+: the stream is [B, 1 + k_prev, D] with
    per-token merged-group sizes [B, k_prev]. Keep the k_keep highest-
    priority slots (same formula as _refilter_tokens) and absorb each
    dropped SLOT into its most similar kept slot, size-weighted so a slot
    already standing for m positions counts m-fold in the new average.

    Returns (x_filtered [B, 1+k_keep, D], idx_local [B, k_keep] indices
    into the previous kept set, slot_map [B, k_prev] old slot -> new slot,
    new sizes [B, k_keep])."""
    B = imp_all.shape[0]
    imp_p = imp_all[:, :k_prev]
    idx_local = _keep_indices(imp_p, keep_w_gathered, k_keep, ctx_frac)
    n_drop = k_prev - k_keep
    slots = x[:, 1:1 + k_prev]
    kept = jnp.take_along_axis(slots, idx_local[..., None], axis=1)
    drop_local = _complement_indices(idx_local, k_prev, n_drop)
    dropped = jnp.take_along_axis(slots, drop_local[..., None], axis=1)
    kp = keys[:, 1:1 + k_prev]
    kn = kp * jax.lax.rsqrt(
        jnp.sum(kp * kp, axis=-1, keepdims=True) + 1e-12)
    k_kept = jnp.take_along_axis(kn, idx_local[..., None], axis=1)
    k_drop = jnp.take_along_axis(kn, drop_local[..., None], axis=1)
    sim = jnp.einsum("bjd,bkd->bjk", k_drop, k_kept)
    assign = jnp.argmax(sim, axis=-1).astype(jnp.int32)
    onehot = jax.nn.one_hot(assign, k_keep, dtype=jnp.float32)
    s_kept = jnp.take_along_axis(sizes, idx_local, axis=1)
    s_drop = jnp.take_along_axis(sizes, drop_local, axis=1)
    absorbed = jnp.einsum("bjk,bjd->bkd", onehot,
                          dropped.astype(jnp.float32)
                          * s_drop[..., None])
    s_add = jnp.einsum("bjk,bj->bk", onehot, s_drop)
    new_sizes = s_kept + s_add
    merged = ((kept.astype(jnp.float32) * s_kept[..., None] + absorbed)
              / new_sizes[..., None]).astype(x.dtype)
    brow = jnp.arange(B)[:, None]
    slot_map = jnp.zeros((B, k_prev), jnp.int32)
    slot_map = slot_map.at[brow, idx_local].set(
        jnp.broadcast_to(jnp.arange(k_keep, dtype=jnp.int32)[None],
                         (B, k_keep)))
    slot_map = slot_map.at[brow, drop_local].set(assign)
    return (jnp.concatenate([x[:, :1], merged], axis=1), idx_local,
            slot_map, new_sizes)


def _embed(params, images, cfg: DinoV2Config, compute_dtype):
    """Patchify + patch embedding + CLS + interpolated position embedding.

    The patch contraction is one einsum over the unflattened
    [B, gh, p, gw, p, C] view — handing XLA the transpose unfused lets it
    fold the (p_row, p_col, C) gather into the matmul instead of
    materializing the [B, N, p*p*C] relayout (measured 1.01 vs 1.57 ms at
    B=16 @518², scripts/probe_round2b.py). Same math and weight layout as
    patchify() + matmul."""
    B, H, W, _ = images.shape
    p = cfg.patch_size
    gh, gw = H // p, W // p
    pe = params["patch_embed"]
    w4 = pe["w"].astype(compute_dtype).reshape(p, p, 3, -1)
    x = images.astype(compute_dtype).reshape(B, gh, p, gw, p, 3)
    x = jnp.einsum("bhpwqc,pqcd->bhwd", x, w4)
    x = x.reshape(B, gh * gw, -1) + pe["b"].astype(compute_dtype)
    cls = jnp.broadcast_to(
        params["cls_token"].astype(compute_dtype), (B, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    pos = interpolate_pos_embed(params["pos_embed"], cfg, gh, gw)
    return x + pos.astype(compute_dtype)


def apply(
    params,
    images,
    cfg: DinoV2Config,
    *,
    compute_dtype=jnp.float32,
    attn_impl: str = "xla",
    fuse_qkv: bool = True,
    unroll: int = 1,
    remat: bool = False,
    filter_layer: int = 0,
    filter_keep: float = 1.0,
    filter_fuse: bool = True,
    filter_fuse_k: int = 1,
    filter_schedule=(),
    filter_rollout: float = 0.0,
    filter_merge: bool = False,
    filter_delta_correct: bool = False,
    filter_strat_stride: int = 0,
    filter_prop_attn: bool = False,
    filter_ctx_frac: float = 0.0,
    keep_weights=None,
) -> jnp.ndarray:
    """Forward pass.

    Args:
      images: [B, H, W, 3] normalized pixels (NHWC; the io layer converts
        from the reference's NCHW convention).
      filter_layer / filter_keep: opt-in token-filtering fast path (OFF by
        default — exact reference numerics): after `filter_layer` full
        blocks, keep CLS + the `filter_keep` fraction of patch tokens ranked
        by next-layer CLS attention (+ guidance priority via keep_weights,
        a [B, P] mask-weight array); remaining blocks run on the short
        stream; dropped tokens re-enter frozen at their filter-point values
        before the final norm, so the output keeps the full [B, 1+N, D]
        shape and token order. Approximate — see docs/PERF.md for measured
        throughput/δ-depth tradeoffs.
      filter_schedule: PROGRESSIVE variant — ((layer, keep), ...) with
        strictly increasing layers and decreasing keep fractions; each stage
        drops further tokens (re-ranked by fresh CLS attention at that
        depth) and re-fuses the newly dropped ones into the context token.
        Spreading one cliff-drop over several smaller ones keeps more
        tokens alive through the early layers where attention is still
        deciding what matters. Overrides filter_layer/filter_keep.
      filter_fuse_k: number of fused context tokens (perfect square; 1 =
        the single EViT token). At k>1 the patch grid is split into
        sqrt(k) x sqrt(k) spatial cells and each context token aggregates
        only ITS cell's dropped tokens — global structure (regional
        means, gradients) survives the drop as k regional summaries
        instead of one scalar. Drop mode only.
      filter_rollout: 0..1 — at stage 2+ blend the surviving tokens'
        accumulated importance from earlier stages into the fresh ranking
        (rollout-style multi-layer evidence instead of a single layer's
        CLS row): rank by (1-r)*fresh + r*carried. 0 = fresh only.
      filter_strat_stride: stratified keep ('@sN'): every (N,N)-strided
        grid position gets a priority bonus that sits ABOVE plain
        background but BELOW every guided tier, so ~1/N² of the patch
        tokens are a spatially uniform sample regardless of attention.
        Keeps the kept set an (approximately) unbiased spatial sample of
        the image — aggregate/peripheral evidence (anything the ambient
        stream or a mean-like statistic needs) survives the filter even
        when CLS attention ignores it. 0 = off.
      filter_delta_correct: delta-corrected drop mode ('@d'): the backbone
        runs EXACTLY like drop mode (kept tokens unpolluted, identical
        throughput), but at un-filter time each dropped position reads its
        filter-point feature PLUS its most-similar kept token's accumulated
        residual-stream update (final - filter-point). Strictly refines
        drop-mode reconstruction when nearby tokens' updates correlate —
        which they do in a ViT's residual stream. Single-stage only.
      filter_prop_attn: proportional attention ('@p'): in post-filter
        blocks, tokens representing several source tokens — fused context
        tokens (drop mode) or merged kept tokens ('@m') — get a
        +log(#represented) attention-logit bias, so the softmax assigns
        them their sources' aggregate mass instead of renormalizing all
        mass onto the kept subsample. EXACT when the represented tokens
        are identical (tests/test_kernels.py proportional-bias exactness);
        in general a first-order correction to the CLS-row drift that
        carries the certification tail (docs/PERF.md round-4 section).
      filter_ctx_frac: context reserve ('@cF'): reserve fraction F of the
        keep budget for the top tokens by RAW CLS importance, bypassing
        the guidance priority boost (see _keep_indices). Exact no-op when
        unguided; under guidance it guarantees the kept set carries scene
        context even when the boosted guided tiers alone would exhaust
        the budget — the failure mode of small keep rates in the
        concentrated-attention regime (docs/PERF.md round-4 section).
      filter_merge: merge mode ('@m' in CLI specs): same keep set, but
        dropped tokens are ABSORBED into their most-similar kept token
        (ToMe-style) instead of frozen, and at un-filter time each dropped
        position reads its representative's final-layer feature. Costs
        ~0.2% throughput over drop mode; substantially tighter prediction
        parity because no stale features ever reach the focal/ambient
        streams (docs/PERF.md merge-vs-drop δ table).
    Returns:
      last_hidden_state [B, 1 + N, D] after the final layernorm, matching
      Dinov2Model.forward().last_hidden_state (ref:src/model.py:973-975 reads
      [:, 0] as CLS and [:, 1:] as patch tokens).
    """
    if unroll == 1:
        # CAIM_SCAN_UNROLL: unroll the layer scan N-fold so XLA can
        # pipeline DMA across adjacent layers' kernel launches — a ViT-L
        # retune knob (more, smaller kernel programs at D=1024 pay
        # per-program overhead; see docs/PERF.md ViT-L ceiling). A/B via
        # scripts/bench_vitl_sweep.py --env CAIM_SCAN_UNROLL=2.
        # ViT-L (D>=1024) defaults to 2: the round-4 sweep measured
        # unroll2 + flash qb352 at 155.4 vs 152.6 img/s — unrolling is
        # what converts the larger flash block from a VMEM-scheduling
        # loss into the best point (docs/PERF.md round-4 ViT-L sweep).
        import os as _os

        default = "2" if cfg.hidden_size >= 1024 else "1"
        unroll = int(_os.environ.get("CAIM_SCAN_UNROLL", default))
    x = _embed(params, images, cfg, compute_dtype)

    def _cast(a):
        # int8 weights and their f32 scales pass through untouched
        if a.dtype == jnp.int8:
            return a
        return a.astype(compute_dtype)

    layers = jax.tree_util.tree_map_with_path(
        lambda path, a: a
        if any(getattr(p, "key", None) == "wq" for p in path)
        else _cast(a),
        params["layers"],
    )
    quantized = _has_wq(params["layers"])
    if fuse_qkv and not quantized:
        # concatenate q/k/v into one [L, D, 3D] weight — same math, one MXU
        # call instead of three narrow ones
        layers = dict(layers)
        layers["qkv_w"] = jnp.concatenate(
            [layers["q"]["w"], layers["k"]["w"], layers["v"]["w"]], axis=-1
        )
        layers["qkv_b"] = jnp.concatenate(
            [layers["q"]["b"], layers["k"]["b"], layers["v"]["b"]], axis=-1
        )
        for key in ("q", "k", "v"):
            del layers[key]

    block = _block
    if (
        quantized
        and attn_impl.startswith("pallas_packed")
        and "qkv_i8" in layers
        and cfg.gelu_approx  # exact erf GELU can't lower in Pallas TPU
        and not (cfg.use_lora
                 and any(k.startswith("lora") for k in layers))
    ):
        block = _block_int8_chained
    if remat:
        # recompute activations in the backward pass — trades ~30% FLOPs for
        # O(layers) activation memory (jax.checkpoint per block; SURVEY.md
        # HBM-bandwidth note). Enables batch-128 @518^2 training on one chip.
        block = jax.checkpoint(
            _block, static_argnums=(2, 3),
            policy=jax.checkpoint_policies.nothing_saveable,
        )

    def body(carry, layer_params):
        return block(layer_params, carry, cfg, attn_impl), None

    def run_seg(xx, seg, bias):
        """Scan a layer segment; bias ([B, T] f32 or None) is the
        proportional-attention key-side logit bias for the CURRENT
        (possibly filtered) token stream."""
        if bias is None:
            return jax.lax.scan(body, xx, seg, unroll=unroll)[0]

        def body_b(carry, lp):
            return block(lp, carry, cfg, attn_impl, bias), None

        return jax.lax.scan(body_b, xx, seg, unroll=unroll)[0]

    P = x.shape[1] - 1
    schedule = tuple(filter_schedule or ())
    if not schedule and 0 < filter_layer < cfg.num_layers \
            and 0.0 < filter_keep < 1.0:
        schedule = ((filter_layer, filter_keep),)
    # drop degenerate stages (keep >= 1 or layer out of range)
    schedule = tuple(
        (int(l), float(k)) for l, k in schedule
        if 0 < int(l) < cfg.num_layers and 0.0 < float(k) < 1.0
    )
    if schedule:
        ls = [l for l, _ in schedule]
        kf = [k for _, k in schedule]
        if ls != sorted(set(ls)):
            raise ValueError(f"filter schedule layers must be strictly "
                             f"increasing: {schedule}")
        if any(b >= a for a, b in zip(kf, kf[1:])):
            raise ValueError(f"filter schedule keep fractions must be "
                             f"strictly decreasing: {schedule}")
        if filter_delta_correct and (filter_merge or len(schedule) > 1):
            raise ValueError(
                "filter_delta_correct ('@d') is single-stage drop-mode "
                "only (not composable with '@m' or progressive schedules)")
        if not 0.0 <= filter_ctx_frac < 1.0:
            raise ValueError(
                f"filter_ctx_frac ('@cF') must be in [0, 1) — reserving "
                f"the WHOLE budget for context leaves no guided slots "
                f"(got {filter_ctx_frac})")
        if filter_prop_attn and not (filter_fuse or filter_merge):
            raise ValueError(
                "filter_prop_attn ('@p') weights tokens by how many "
                "source tokens they represent — it needs token_filter_fuse "
                "(drop mode) or merge mode to have any such tokens")
        fuse_groups = None
        n_groups = max(1, int(filter_fuse_k))
        if n_groups > 1:
            q = int(round(n_groups ** 0.5))
            if q * q != n_groups:
                raise ValueError(
                    f"filter_fuse_k must be a perfect square (got "
                    f"{filter_fuse_k})")
            if filter_merge or filter_delta_correct:
                raise ValueError(
                    "filter_fuse_k > 1 is drop-mode only ('@m'/'@d' have "
                    "no fused context tokens)")
            import numpy as _onp

            p_sz = cfg.patch_size
            gh, gw = images.shape[1] // p_sz, images.shape[2] // p_sz
            rows = _onp.arange(gh)[:, None] * q // gh
            cols = _onp.arange(gw)[None, :] * q // gw
            ids = (rows * q + cols).astype(_onp.int32).reshape(-1)
            # densify: on grids smaller than q per side some (row, col)
            # cells are empty and the raw ids are sparse — remap to
            # consecutive ids so every stage agrees on the token count
            uniq = _onp.unique(ids)
            fuse_groups = _onp.searchsorted(uniq, ids).astype(_onp.int32)
            n_groups = int(len(uniq))
        if filter_strat_stride > 1:
            # static stratified-sample bonus: +0.25 on the keep-weight
            # scale = +2.5 priority, above background (0) and below the
            # lowest guided tier (+5)
            import numpy as _onp

            p = cfg.patch_size
            gh, gw = images.shape[1] // p, images.shape[2] // p
            m = _onp.zeros((gh, gw), _onp.float32)
            off = filter_strat_stride // 2
            m[off::filter_strat_stride, off::filter_strat_stride] = 1.0
            bonus = jnp.asarray(0.25 * m.reshape(-1))[None]
            base = keep_weights if keep_weights is not None else 1.0
            keep_weights = jnp.broadcast_to(
                base + bonus, (x.shape[0], P)).astype(jnp.float32)
        ks = [max(1, int(round(k * P))) for k in kf]
        x_full = None
        idx_global = None
        imp_carry = None  # surviving tokens' accumulated importance
        rep = None   # merge mode: [B, P] position -> current slot
        sizes = None  # merge mode: [B, k] merged-group sizes
        dc = None    # @d mode: (idx_drop, assign) for the correction
        k_bias = None  # '@p' proportional-attention logit bias [B, T]

        def _prop_bias_drop(idxg):
            """[B, 1+k+G] bias: 0 for CLS/kept, +log(#dropped tokens each
            fused context token represents) — softmax then assigns the
            fused token its sources' aggregate mass instead of
            renormalizing everything onto the kept subsample (the CLS-row
            drift mechanism, docs/PERF.md round-4 section). A stratified
            group with nothing dropped (fallback summary token) gets
            log(1e-6) ≈ -14: its summary duplicates kept information, so
            full-attention parity wants it mass-less."""
            b_sz = idxg.shape[0]
            brow = jnp.arange(b_sz)[:, None]
            keptm = jnp.zeros((b_sz, P), jnp.float32).at[brow, idxg].set(1.0)
            dr = 1.0 - keptm
            if fuse_groups is not None:
                g = jnp.asarray(fuse_groups)[None]
                counts = jnp.stack(
                    [(dr * (g == gi)).sum(axis=1) for gi in range(n_groups)],
                    axis=1)
            else:
                counts = dr.sum(axis=1, keepdims=True)
            zeros = jnp.zeros((b_sz, 1 + idxg.shape[1]), jnp.float32)
            return jnp.concatenate(
                [zeros, jnp.log(jnp.maximum(counts, 1e-6))], axis=1)

        def _prop_bias_merge(szs):
            """[B, 1+k] bias: ToMe-style +log(group size) on every kept
            token (each represents itself + its absorbed tokens)."""
            z = jnp.zeros((szs.shape[0], 1), jnp.float32)
            return jnp.concatenate(
                [z, jnp.log(szs.astype(jnp.float32))], axis=1)

        r = float(filter_rollout)
        prev = 0
        for (boundary, _), k_i in zip(schedule, ks):
            seg = jax.tree.map(lambda a: a[prev:boundary], layers)
            x = run_seg(x, seg, k_bias)
            prev = boundary
            next_lp = jax.tree.map(lambda a: a[boundary], layers)
            if filter_merge or filter_delta_correct:
                imp, keys = _cls_importance(next_lp, x, cfg,
                                            return_keys=True)
            else:
                imp = _cls_importance(next_lp, x, cfg)
            if idx_global is None:
                if filter_merge:
                    x, idx_global, rep, sizes = _filter_tokens_merge(
                        x, imp, keys, keep_weights, k_i,
                        ctx_frac=filter_ctx_frac)
                else:
                    x_full = x
                    x, idx_global = _filter_tokens(
                        x, imp, keep_weights, k_i,
                        fuse=filter_fuse and k_i < P,
                        fuse_groups=fuse_groups, fuse_n_groups=n_groups,
                        ctx_frac=filter_ctx_frac,
                    )
                    if filter_delta_correct and k_i < P:
                        dc = _assign_dropped(imp, keys, keep_weights,
                                             idx_global, k_i)
                imp_carry = jnp.take_along_axis(imp, idx_global, axis=1)
            else:
                k_prev = idx_global.shape[1]
                if k_i >= k_prev:
                    continue  # nothing more to drop at this stage
                kw = None
                if keep_weights is not None:
                    kw = jnp.take_along_axis(
                        keep_weights, idx_global, axis=1)
                if r > 0.0:
                    imp_p = (1.0 - r) * imp[:, :k_prev] + r * imp_carry
                    imp = jnp.concatenate([imp_p, imp[:, k_prev:]], axis=1)
                if filter_merge:
                    x, idx_local, slot_map, sizes = _refilter_tokens_merge(
                        x, imp, keys, k_prev, kw, k_i, sizes,
                        ctx_frac=filter_ctx_frac)
                    rep = jnp.take_along_axis(slot_map, rep, axis=1)
                else:
                    # tokens dropped HERE freeze at their current values
                    x_full = _scatter_tokens(x_full.astype(x.dtype), x,
                                             idx_global)
                    gg = None
                    if fuse_groups is not None:
                        gg = jnp.asarray(fuse_groups)[idx_global]
                    x, idx_local = _refilter_tokens(
                        x, imp, k_prev, kw, k_i, fuse=filter_fuse,
                        groups_gathered=gg, n_groups=n_groups,
                        ctx_frac=filter_ctx_frac,
                    )
                imp_carry = jnp.take_along_axis(
                    imp[:, :k_prev], idx_local, axis=1)
                idx_global = jnp.take_along_axis(
                    idx_global, idx_local, axis=1)
            if filter_prop_attn:
                if filter_merge:
                    k_bias = _prop_bias_merge(sizes)
                elif filter_fuse and idx_global.shape[1] < P:
                    k_bias = _prop_bias_drop(idx_global)
        tail = jax.tree.map(lambda a: a[prev:], layers)
        x = run_seg(x, tail, k_bias)
        if filter_merge:
            # unmerge: every patch position reads its representative's
            # FINAL-layer feature — no position ever carries a stale value
            k_last = idx_global.shape[1]
            patches = jnp.take_along_axis(
                x[:, 1:1 + k_last], rep[..., None], axis=1)
            x = jnp.concatenate([x[:, :1], patches], axis=1)
        elif dc is not None:
            # @d: dropped position j = its own filter-point feature + its
            # nearest kept neighbour's accumulated update over the
            # remaining blocks (residual-stream transplant)
            idx_drop, assign = dc
            k_last = idx_global.shape[1]
            fp = x_full.astype(x.dtype)[:, 1:]
            final_kept = x[:, 1:1 + k_last]
            delta = final_kept - jnp.take_along_axis(
                fp, idx_global[..., None], axis=1)
            corrected = jnp.take_along_axis(
                fp, idx_drop[..., None], axis=1) + jnp.take_along_axis(
                delta, assign[..., None], axis=1)
            brow = jnp.arange(x.shape[0])[:, None]
            patches = fp.at[brow, idx_global].set(final_kept)
            patches = patches.at[brow, idx_drop].set(corrected)
            x = jnp.concatenate([x[:, :1], patches], axis=1)
        else:
            x = _scatter_tokens(x_full.astype(x.dtype), x, idx_global)
    else:
        x, _ = jax.lax.scan(body, x, layers, unroll=unroll)
    x = L.layernorm_apply(
        jax.tree.map(lambda a: a.astype(compute_dtype), params["final_norm"]),
        x,
        cfg.layer_norm_eps,
    )
    return x


def apply_pipelined(
    params,
    images,
    cfg: DinoV2Config,
    mesh,
    *,
    n_micro: int = 4,
    compute_dtype=jnp.float32,
    attn_impl: str = "xla",
    remat: bool = False,
):
    """Pipeline-parallel forward: the layer stack is sharded over the mesh's
    `pipe` axis and driven by the GPipe schedule (parallel/pipeline.py);
    embedding and final norm run data-parallel. Numerically identical to
    apply() — the multi-chip latency option for the 24-layer `large`
    backbone (the reference is single-device, SURVEY.md §2.6). Training
    differentiates straight through the schedule (pipelined_scan docstring);
    `remat` enables the per-stage GPipe memory discipline."""
    from cognitive_aim_tpu.parallel.pipeline import pipelined_scan

    x = _embed(params, images, cfg, compute_dtype)
    layers = jax.tree.map(lambda a: a.astype(compute_dtype), params["layers"])
    x = pipelined_scan(
        mesh, layers, x,
        lambda lp, c: _block(lp, c, cfg, attn_impl), n_micro,
        remat=remat,
    )
    return L.layernorm_apply(
        jax.tree.map(lambda a: a.astype(compute_dtype), params["final_norm"]),
        x,
        cfg.layer_norm_eps,
    )

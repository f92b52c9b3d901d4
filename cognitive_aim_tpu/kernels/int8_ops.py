"""Int8 quantized matmul path for the ViT backbone.

v5e's MXU runs int8 at 2x bf16 throughput (394 vs 197 TOP/s). The dense
projections carry ~77% of backbone FLOPs (qkv/attn_out/fc1/fc2), so an int8
dense path lifts the speed-of-light for 518^2 guided inference from ~590
toward ~900+ img/s/chip. Scheme (standard ViT PTQ, chosen to keep AbsRel
parity within the 1% budget):

  * weights: static per-output-channel symmetric int8
    (scale = max|w_col| / 127), quantized once at load time;
  * activations: dynamic per-row symmetric int8 (scale = max|x_row| / 127),
    quantized on the VPU right before each matmul;
  * accumulation in int32, dequantized to f32 with s_x * s_w, bias in f32.

Attention (q.k^T, p.v) stays bf16 flash attention; layernorm/softmax/GELU
stay bf16/f32. Opt-in via Policy/CLI ("int8"); parity tests bound the error
vs the f32 path (tests/test_int8.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray) -> dict:
    """[K, N] float -> {'q': int8 [K, N], 's': f32 [N]} per-out-channel."""
    w = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w), axis=0) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def quantize_activations(x: jnp.ndarray):
    """[..., K] -> (int8 [..., K], f32 scale [..., 1]) per-row dynamic."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def int8_matmul_prequant(xq, sx, wq: dict, b, out_dtype):
    """int8 GEMM on pre-quantized activations (share one quantization across
    q/k/v — the reference-architecture MHSA projects the same input 3x)."""
    acc = jax.lax.dot_general(
        xq, wq["q"],
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * wq["s"]
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out_dtype)


def int8_linear(x: jnp.ndarray, wq: dict, b: jnp.ndarray | None, out_dtype=None):
    """y = dequant(quant(x) @ wq) + b; int32 accumulation on the MXU."""
    out_dtype = out_dtype or x.dtype
    xq, sx = quantize_activations(x)
    return int8_matmul_prequant(xq, sx, wq, b, out_dtype)


def quantize_backbone_layers(layer_params: dict, fuse_qkv: bool = True) -> dict:
    """Stacked dinov2 layer pytree -> same tree with dense weights replaced by
    int8 {'q','s'} pairs (vmapped over the layer axis). Biases / norms /
    layerscales stay float.

    fuse_qkv additionally emits a concatenated 'qkv_i8' [L, D, 3D] weight
    (per-output-channel scales concatenate exactly) consumed by the chained
    Pallas block path (kernels/int8_block.py) as one [D, 3D] GEMM."""

    def quant_stacked(w):  # [L, K, N]
        return jax.vmap(quantize_weight)(w)

    out = dict(layer_params)
    if fuse_qkv and all(n in out for n in ("q", "k", "v")):
        wcat = jnp.concatenate([out[n]["w"] for n in ("q", "k", "v")], axis=-1)
        bcat = jnp.concatenate([out[n]["b"] for n in ("q", "k", "v")], axis=-1)
        out["qkv_i8"] = {"wq": quant_stacked(wcat), "b": bcat}
    for name in ("q", "k", "v", "attn_out", "fc1", "fc2"):
        if name in out:
            lin = dict(out[name])
            lin["wq"] = quant_stacked(lin.pop("w"))
            out[name] = lin
    return out

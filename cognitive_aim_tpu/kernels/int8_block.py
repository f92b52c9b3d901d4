"""Chained int8 transformer-block GEMMs (Pallas, TPU) — inference fast path.

Round 1 measured two individually-negative results that together point at
the winning design:

  * a standalone fused int8 GEMM (int8_gemm.py) lost end-to-end (332 vs 407
    img/s) because swapping one opaque custom call into the middle of XLA's
    graph broke the surrounding elementwise fusions — GELU, requantize and
    residual adds each became separate HBM passes;
  * the XLA int8 chain keeps those fusions but runs the GEMMs slower than
    the Pallas GEMM at fc1/fc2 shapes, and still pays ~2.3 ms/step of
    convert/quantize fusions at 518^2 B=8.

So: fuse the whole dense chain of a block into the kernels and never hand
XLA a bare intermediate. The kernels:

  qkv_proj : x bf16 -> quant(VMEM) -> int8 dot [D,3D] -> dequant+bias -> bf16
  fc1_gelu : x bf16 -> quant(VMEM) -> int8 dot -> dequant+bias -> tanh-GELU
             -> requant(VMEM) -> int8 out + f32 row scales   (HBM halved)
  out_res  : (h int8 + scales | h bf16) -> int8 dot -> dequant+bias
             -> * layerscale + residual add -> bf16
  *_ln     : qkv_proj / fc1_gelu variants with the pre-layernorm computed
             in-VMEM (f32) before quantization — the normalized activation
             never exists in HBM (saves a [B,N,D] write+read per LN; both
             block layernorms use these in the chained path)

All kernels keep the natural [B, N, K] activation layout with (1, n_block, K)
blocks — flattening to [B*N, K] forces a physical relayout on TPU whenever N
is not a multiple of the 8-row sublane tile (measured ~1.6 ms/step of
reshape copies at N=1371, B=8). Weights stay VMEM-resident across the grid
(constant index map); each activation tile is read once. Inference-only:
these run when the params carry int8 weights (policy "int8"); training uses
the float path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cognitive_aim_tpu.kernels.flash_attention import _pick_q_block


def _quant_rows_f32(xf):
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _gelu_tanh(x):
    # matches jax.nn.gelu(approximate=True)
    c = jnp.sqrt(2.0 / jnp.pi).astype(x.dtype)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x**3)))


def _ln_f32(xf, g, b, eps):
    # row layernorm in f32; K is fully resident in the block so the
    # reduction is local to the tile
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * g + b


def _wspec(K, N):
    return pl.BlockSpec((K, N), lambda b, i: (0, 0), memory_space=pltpu.VMEM)


def _rowspec(N):
    return pl.BlockSpec((1, N), lambda b, i: (0, 0), memory_space=pltpu.VMEM)


def _xspec(nb, K):
    return pl.BlockSpec((1, nb, K), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)


# --------------------------------------------------------------- qkv_proj ---
def _qkv_kernel(x_ref, wq_ref, ws_ref, b_ref, o_ref):
    xq, sx = _quant_rows_f32(x_ref[0].astype(jnp.float32))
    acc = jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[0] = (acc.astype(jnp.float32) * sx * ws_ref[...]
                + b_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_block", "out_dtype"))
def int8_proj(x, wq, ws, b, n_block: int = 0, out_dtype=jnp.bfloat16):
    """x [B, N, K] -> [B, N, Nout] bf16: in-VMEM quant + int8 GEMM +
    dequant/bias."""
    B, N, K = x.shape
    Nout = wq.shape[1]
    nb = n_block or _pick_q_block(N)
    return pl.pallas_call(
        _qkv_kernel,
        grid=(B, pl.cdiv(N, nb)),
        in_specs=[_xspec(nb, K), _wspec(K, Nout), _rowspec(Nout),
                  _rowspec(Nout)],
        out_specs=_xspec(nb, Nout),
        out_shape=jax.ShapeDtypeStruct((B, N, Nout), out_dtype),
    )(x, wq, ws.reshape(1, Nout), b.reshape(1, Nout))


def _qkv_split_kernel(x_ref, wq_ref, ws_ref, b_ref, q_ref, k_ref, v_ref):
    xq, sx = _quant_rows_f32(x_ref[0].astype(jnp.float32))
    acc = jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * ws_ref[...] + b_ref[...]
    D = q_ref.shape[-1]
    q_ref[0] = y[:, :D].astype(q_ref.dtype)
    k_ref[0] = y[:, D:2 * D].astype(k_ref.dtype)
    v_ref[0] = y[:, 2 * D:].astype(v_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_block", "out_dtype"))
def int8_qkv_proj(x, wq, ws, b, n_block: int = 0, out_dtype=jnp.bfloat16):
    """x [B, N, D] -> (q, k, v) each [B, N, D] bf16 via one fused int8 GEMM
    over the concatenated [D, 3D] weight. The in-kernel lane split (768-
    aligned, tile-exact) replaces an XLA jnp.split that would copy the whole
    [B, N, 3D] tensor."""
    B, N, D = x.shape
    assert wq.shape[1] == 3 * D
    nb = n_block or _pick_q_block(N)
    out = jax.ShapeDtypeStruct((B, N, D), out_dtype)
    return pl.pallas_call(
        _qkv_split_kernel,
        grid=(B, pl.cdiv(N, nb)),
        in_specs=[_xspec(nb, D), _wspec(D, 3 * D), _rowspec(3 * D),
                  _rowspec(3 * D)],
        out_specs=[_xspec(nb, D), _xspec(nb, D), _xspec(nb, D)],
        out_shape=[out, out, out],
    )(x, wq, ws.reshape(1, 3 * D), b.reshape(1, 3 * D))


def _qkv_ln_split_kernel(eps, x_ref, g_ref, be_ref, wq_ref, ws_ref, b_ref,
                         q_ref, k_ref, v_ref):
    xn = _ln_f32(x_ref[0].astype(jnp.float32), g_ref[...], be_ref[...], eps)
    xq, sx = _quant_rows_f32(xn)
    acc = jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * ws_ref[...] + b_ref[...]
    D = q_ref.shape[-1]
    q_ref[0] = y[:, :D].astype(q_ref.dtype)
    k_ref[0] = y[:, D:2 * D].astype(k_ref.dtype)
    v_ref[0] = y[:, 2 * D:].astype(v_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "n_block", "out_dtype"))
def int8_qkv_proj_ln(x, g, be, wq, ws, b, eps: float = 1e-6,
                     n_block: int = 0, out_dtype=jnp.bfloat16):
    """Pre-LN fused into the qkv GEMM: x [B, N, D] -> LN(VMEM, f32) ->
    quant -> int8 dot [D, 3D] -> (q, k, v). The layernormed activation never
    exists in HBM (saves one write + one read of [B, N, D] per layer)."""
    B, N, D = x.shape
    assert wq.shape[1] == 3 * D
    nb = (n_block or int(os.environ.get("CAIM_QKV_NB", "0"))
          or _pick_q_block(N, 704 if D <= 768 else 256))
    out = jax.ShapeDtypeStruct((B, N, D), out_dtype)
    return pl.pallas_call(
        functools.partial(_qkv_ln_split_kernel, eps),
        grid=(B, pl.cdiv(N, nb)),
        in_specs=[_xspec(nb, D), _rowspec(D), _rowspec(D),
                  _wspec(D, 3 * D), _rowspec(3 * D), _rowspec(3 * D)],
        out_specs=[_xspec(nb, D), _xspec(nb, D), _xspec(nb, D)],
        out_shape=[out, out, out],
    )(x, g.astype(jnp.float32).reshape(1, D),
      be.astype(jnp.float32).reshape(1, D),
      wq, ws.reshape(1, 3 * D), b.reshape(1, 3 * D))


# --------------------------------------------------------------- fc1+gelu ---
def _fc1_kernel(x_ref, wq_ref, ws_ref, b_ref, h8_ref, sh_ref):
    xq, sx = _quant_rows_f32(x_ref[0].astype(jnp.float32))
    acc = jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # exact (erf) GELU is not lowerable in Pallas TPU (no erf/erfc
    # primitive); the dispatch in nn/dinov2.py only routes gelu_approx
    # configs here
    h = _gelu_tanh(acc.astype(jnp.float32) * sx * ws_ref[...] + b_ref[...])
    h8, sh = _quant_rows_f32(h)
    h8_ref[0] = h8
    sh_ref[0] = sh


@functools.partial(jax.jit, static_argnames=("n_block",))
def int8_fc1_gelu(x, wq, ws, b, n_block: int = 0):
    """x [B, N, K] -> (h8 [B, N, F] int8, sh [B, N, 1] f32): GEMM + tanh-GELU
    + requantize in one pass; the [B, N, F] intermediate never hits HBM in
    float."""
    B, N, K = x.shape
    F = wq.shape[1]
    nb = n_block or _pick_q_block(N)
    return pl.pallas_call(
        _fc1_kernel,
        grid=(B, pl.cdiv(N, nb)),
        in_specs=[_xspec(nb, K), _wspec(K, F), _rowspec(F), _rowspec(F)],
        out_specs=[_xspec(nb, F), _xspec(nb, 1)],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, F), jnp.int8),
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
        ],
    )(x, wq, ws.reshape(1, F), b.reshape(1, F))


def _fc1_ln_kernel(eps, x_ref, g_ref, be_ref, wq_ref, ws_ref, b_ref,
                   h8_ref, sh_ref):
    xn = _ln_f32(x_ref[0].astype(jnp.float32), g_ref[...], be_ref[...], eps)
    xq, sx = _quant_rows_f32(xn)
    acc = jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = _gelu_tanh(acc.astype(jnp.float32) * sx * ws_ref[...] + b_ref[...])
    h8, sh = _quant_rows_f32(h)
    h8_ref[0] = h8
    sh_ref[0] = sh


@functools.partial(jax.jit, static_argnames=("eps", "n_block"))
def int8_fc1_gelu_ln(x, g, be, wq, ws, b, eps: float = 1e-6,
                     n_block: int = 0):
    """Pre-LN fused into fc1: x [B, N, K] -> LN -> quant -> GEMM ->
    tanh-GELU -> requantize, one HBM read of x and one int8 write of h."""
    B, N, K = x.shape
    F = wq.shape[1]
    nb = n_block or _pick_q_block(N)
    return pl.pallas_call(
        functools.partial(_fc1_ln_kernel, eps),
        grid=(B, pl.cdiv(N, nb)),
        in_specs=[_xspec(nb, K), _rowspec(K), _rowspec(K),
                  _wspec(K, F), _rowspec(F), _rowspec(F)],
        out_specs=[_xspec(nb, F), _xspec(nb, 1)],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, F), jnp.int8),
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
        ],
    )(x, g.astype(jnp.float32).reshape(1, K),
      be.astype(jnp.float32).reshape(1, K),
      wq, ws.reshape(1, F), b.reshape(1, F))


# --------------------------------------------------- fc2 / attn_out + res ---
def _out_res_prequant_kernel(h8_ref, sh_ref, wq_ref, ws_ref, b_ref, ls_ref,
                             res_ref, o_ref):
    acc = jax.lax.dot_general(
        h8_ref[0], wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sh_ref[0] * ws_ref[...] + b_ref[...]
    o_ref[0] = (res_ref[0].astype(jnp.float32)
                + ls_ref[...] * y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_block",))
def int8_out_residual_prequant(h8, sh, wq, ws, b, ls, res, n_block: int = 0):
    """(h8 int8 [B, N, F], sh f32 [B, N, 1]) ->
    res + ls * (dequant(h8 @ wq) + b).

    Consumes fc1's int8 output directly and folds the LayerScale multiply and
    residual add into the epilogue — the whole MLP runs HBM-minimal."""
    B, N, F = h8.shape
    Nout = wq.shape[1]
    nb = n_block or _pick_q_block(N)
    return pl.pallas_call(
        _out_res_prequant_kernel,
        grid=(B, pl.cdiv(N, nb)),
        in_specs=[
            _xspec(nb, F), _xspec(nb, 1), _wspec(F, Nout), _rowspec(Nout),
            _rowspec(Nout), _rowspec(Nout), _xspec(nb, Nout),
        ],
        out_specs=_xspec(nb, Nout),
        out_shape=jax.ShapeDtypeStruct((B, N, Nout), res.dtype),
    )(h8, sh, wq, ws.reshape(1, Nout), b.reshape(1, Nout),
      ls.reshape(1, Nout), res)


# ------------------------------------------------------------ fused MLP -----
def _mlp_nb_cap(K: int, F: int, Nout: int) -> int:
    """Largest row-block cap that keeps the fused-MLP kernel's VMEM
    residents under a ~12 MB budget (16 MB Mosaic scoped limit minus
    headroom — the accounting shifts with surrounding fusions, see
    flash_attention.py). Residents: both int8 weights (K*F + F*Nout), the
    f32 [nb, F] hidden, and double-buffered bf16 x/out tiles. ViT-B
    (768/3072) resolves to the tuned 352; ViT-L (1024/4096) would OOM at
    352 (8.4 MB of weights alone) and resolves to ~160."""
    budget = 12 * 1024 * 1024
    weights = K * F + F * Nout
    per_row = 4 * F + 4 * (K + Nout)  # f32 hidden + 2x bf16 x/out tiles
    cap = (budget - weights) // per_row
    if K >= 1024:
        # the budget formula alone admits 160 at ViT-L; mid-round-2 the
        # COMPOSED 24-layer graph crashed the compiler there and 128 was
        # the safe point, but the round-3 kernel-chain state compiles and
        # wins at 160 (with flash qb288: 152.4 vs 144.4 img/s @518^2 B8,
        # scripts/bench_vitl_sweep.py)
        cap = min(cap, 160)
    return max(32, min(352, (cap // 32) * 32))

def _mlp_ln_kernel(eps, x_ref, g_ref, be_ref, w1_ref, s1_ref, b1_ref,
                   w2_ref, s2_ref, b2_ref, ls_ref, o_ref):
    xf = x_ref[0].astype(jnp.float32)
    xn = _ln_f32(xf, g_ref[...], be_ref[...], eps)
    xq, sx = _quant_rows_f32(xn)
    acc1 = jax.lax.dot_general(
        xq, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = _gelu_tanh(acc1.astype(jnp.float32) * sx * s1_ref[...] + b1_ref[...])
    hq, sh = _quant_rows_f32(h)
    acc2 = jax.lax.dot_general(
        hq, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc2.astype(jnp.float32) * sh * s2_ref[...] + b2_ref[...]
    o_ref[0] = (xf + ls_ref[...] * y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "n_block"))
def int8_mlp_ln(x, g, be, w1q, w1s, b1, w2q, w2s, b2, ls,
                eps: float = 1e-6, n_block: int = 0):
    """The whole transformer MLP in ONE kernel:

        x + ls * fc2(quant(gelu(fc1(quant(LN(x))))))

    The [nb, F] hidden lives only in VMEM — fc1's output never reaches HBM
    in ANY dtype (the split fc1/fc2 kernels still wrote+read an int8
    [B, N, F] + scales, ~1 ms/step of HBM at 518^2 B16). Block rows default
    to 352 so the f32 hidden tile (4.3 MB) plus both resident int8 weights
    (4.5 MB) fit VMEM."""
    B, N, K = x.shape
    F = w1q.shape[1]
    Nout = w2q.shape[1]
    nb = (n_block or int(os.environ.get("CAIM_MLP_NB", "0"))
          or _pick_q_block(N, _mlp_nb_cap(K, F, Nout)))
    return pl.pallas_call(
        functools.partial(_mlp_ln_kernel, eps),
        grid=(B, pl.cdiv(N, nb)),
        in_specs=[
            _xspec(nb, K), _rowspec(K), _rowspec(K),
            _wspec(K, F), _rowspec(F), _rowspec(F),
            _wspec(F, Nout), _rowspec(Nout), _rowspec(Nout), _rowspec(Nout),
        ],
        out_specs=_xspec(nb, Nout),
        out_shape=jax.ShapeDtypeStruct((B, N, Nout), x.dtype),
    )(x, g.astype(jnp.float32).reshape(1, K),
      be.astype(jnp.float32).reshape(1, K),
      w1q, w1s.reshape(1, F), b1.reshape(1, F),
      w2q, w2s.reshape(1, Nout), b2.reshape(1, Nout), ls.reshape(1, Nout))


# ------------------------------------------- attn_out + residual + MLP -----
def _attnout_mlp_kernel(eps, ctx_ref, wo_ref, so_ref, bo_ref, ls1_ref,
                        res_ref, g_ref, be_ref, w1_ref, s1_ref, b1_ref,
                        w2_ref, s2_ref, b2_ref, ls2_ref, o_ref):
    cq, sc = _quant_rows_f32(ctx_ref[0].astype(jnp.float32))
    acc0 = jax.lax.dot_general(
        cq, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    yo = acc0.astype(jnp.float32) * sc * so_ref[...] + bo_ref[...]
    xf = res_ref[0].astype(jnp.float32) + ls1_ref[...] * yo
    xn = _ln_f32(xf, g_ref[...], be_ref[...], eps)
    xq, sx = _quant_rows_f32(xn)
    acc1 = jax.lax.dot_general(
        xq, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = _gelu_tanh(acc1.astype(jnp.float32) * sx * s1_ref[...] + b1_ref[...])
    hq, sh = _quant_rows_f32(h)
    acc2 = jax.lax.dot_general(
        hq, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc2.astype(jnp.float32) * sh * s2_ref[...] + b2_ref[...]
    o_ref[0] = (xf + ls2_ref[...] * y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "n_block"))
def int8_attnout_mlp_ln(ctx, wo, so, bo, ls1, res, g, be,
                        w1q, w1s, b1, w2q, w2s, b2, ls2,
                        eps: float = 1e-6, n_block: int = 0):
    """The ENTIRE post-attention half of a transformer block in one kernel:

        x  = res + ls1 * attn_out(quant(ctx))
        out = x + ls2 * fc2(quant(gelu(fc1(quant(LN2(x))))))

    vs the out_residual -> mlp_ln pair this deletes the post-attention
    residual's HBM round-trip ([B, N, K] bf16 write+read per layer —
    ~1 ms/step @518^2 B16). VMEM residents: attn_out + fc1 + fc2 int8
    weights (5.2 MB at ViT-B) + the f32 hidden; n_block defaults a step
    below the MLP-only cap to cover the extra weight."""
    B, N, K = ctx.shape
    F = w1q.shape[1]
    nb = (n_block or int(os.environ.get("CAIM_AOMLP_NB", "0"))
          or _pick_q_block(N, max(32, _mlp_nb_cap(K, F, K) - 96)))
    return pl.pallas_call(
        functools.partial(_attnout_mlp_kernel, eps),
        grid=(B, pl.cdiv(N, nb)),
        in_specs=[
            _xspec(nb, K), _wspec(K, K), _rowspec(K), _rowspec(K),
            _rowspec(K), _xspec(nb, K), _rowspec(K), _rowspec(K),
            _wspec(K, F), _rowspec(F), _rowspec(F),
            _wspec(F, K), _rowspec(K), _rowspec(K), _rowspec(K),
        ],
        out_specs=_xspec(nb, K),
        out_shape=jax.ShapeDtypeStruct((B, N, K), res.dtype),
    )(ctx, wo, so.reshape(1, K), bo.reshape(1, K), ls1.reshape(1, K), res,
      g.astype(jnp.float32).reshape(1, K),
      be.astype(jnp.float32).reshape(1, K),
      w1q, w1s.reshape(1, F), b1.reshape(1, F),
      w2q, w2s.reshape(1, K), b2.reshape(1, K), ls2.reshape(1, K))


def _out_res_kernel(x_ref, wq_ref, ws_ref, b_ref, ls_ref, res_ref, o_ref):
    xq, sx = _quant_rows_f32(x_ref[0].astype(jnp.float32))
    acc = jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * ws_ref[...] + b_ref[...]
    o_ref[0] = (res_ref[0].astype(jnp.float32)
                + ls_ref[...] * y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_block",))
def int8_out_residual(x, wq, ws, b, ls, res, n_block: int = 0):
    """x bf16 [B, N, K] -> res + ls * (dequant(quant(x) @ wq) + b)."""
    B, N, K = x.shape
    Nout = wq.shape[1]
    nb = n_block or _pick_q_block(N)
    return pl.pallas_call(
        _out_res_kernel,
        grid=(B, pl.cdiv(N, nb)),
        in_specs=[
            _xspec(nb, K), _wspec(K, Nout), _rowspec(Nout), _rowspec(Nout),
            _rowspec(Nout), _xspec(nb, Nout),
        ],
        out_specs=_xspec(nb, Nout),
        out_shape=jax.ShapeDtypeStruct((B, N, Nout), res.dtype),
    )(x, wq, ws.reshape(1, Nout), b.reshape(1, Nout), ls.reshape(1, Nout), res)

"""Pallas flash attention for the ViT backbone (TPU).

Online-softmax attention that never materializes the [N, N] score matrix in
HBM. Shapes here are ViT-scale: N = 257 (224^2) or 1370 (518^2), head_dim 64,
12 heads — so the kernel tiles queries into VMEM blocks and keeps K/V for one
(batch, head) resident, streaming blocks of K/V through the MXU with masking
for the padded tail (1370 -> 1408, SURVEY.md §7 hard part 3).

Grid: (batch*heads, num_q_blocks); block sizes tuned for v5e VMEM (16 MB):
q_block 256 x 64, k_block 512 x 64 — ~0.4 MB resident per step.

Ships with an XLA reference (`attention_reference`) and interpret-mode tests
(tests/test_kernels.py). Used by nn/dinov2.py when attn_impl="pallas".
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x, m):
    return (x + m - 1) // m * m


def attention_reference(q, k, v, scale: float):
    """[B, N, H, D] inputs; f32 softmax; returns [B, N, H, D]."""
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qt, kt) * scale
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bqhd", probs, vt)
    return out


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, k_block, n_valid, n_pad):
    """One (batch*head, q_block) program: online softmax over k blocks.
    Refs carry a leading block dim of 1: q_ref [1, Bq, D], k/v_ref [1, Np, D]."""
    q = q_ref[0]  # [Bq, D] in storage dtype (bf16 fast path)
    bq, d = q.shape
    num_kb = n_pad // k_block

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * k_block, k_block), :]  # [Bk, D]
        v = v_ref[0, pl.ds(i * k_block, k_block), :]
        # q·k^T on the MXU in storage dtype, f32 accumulation
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        # mask padded keys
        kidx = i * k_block + jax.lax.broadcasted_iota(
            jnp.int32, (bq, k_block), dimension=1
        )
        s = jnp.where(kidx < n_valid, s, NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * alpha + pv
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "q_block", "k_block"))
def flash_attention(q, k, v, scale: float, q_block: int = 256, k_block: int = 512):
    """q, k, v: [B, N, H, D] -> [B, N, H, D] (layout matches dinov2._mhsa)."""
    B, N, H, D = q.shape
    n_pad = _round_up(N, max(q_block, k_block))

    def reshape(x):
        x = x.transpose(0, 2, 1, 3).reshape(B * H, N, D)
        return jnp.pad(x, ((0, 0), (0, n_pad - N), (0, 0)))

    qf, kf, vf = reshape(q), reshape(k), reshape(v)

    grid = (B * H, n_pad // q_block)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, k_block=k_block, n_valid=N, n_pad=n_pad
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, n_pad, D), q.dtype),
    )(qf, kf, vf)

    out = out[:, :N, :].reshape(B, H, N, D).transpose(0, 2, 1, 3)
    return out


# ------------------------------------------------ proportional-attention ----
def attention_reference_bias(q, k, v, bias, scale: float):
    """XLA reference with an additive key-side logit bias.

    bias: [B, N] f32, added to every query row's scores before softmax —
    the proportional-attention form (a token representing s merged/fused
    source tokens gets +log(s), so softmax assigns it their aggregate
    mass; EViT/ToMe-style size weighting)."""
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qt, kt) * scale
    scores = scores + bias[:, None, None, :].astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bqhd", probs, vt)
    return out


def _packed_reference_bias(q, k, v, bias, scale, num_heads):
    B, N, HD = q.shape
    D = HD // num_heads
    out = attention_reference_bias(
        q.reshape(B, N, num_heads, D),
        k.reshape(B, N, num_heads, D),
        v.reshape(B, N, num_heads, D),
        bias,
        scale,
    )
    return out.reshape(B, N, HD)


def _flash_packed_bias_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale,
                              num_heads, head_dim, n_valid):
    """_flash_packed_kernel + a per-key additive logit bias row
    (b_ref [1, 1, Nk] f32) folded into the padding mask — one extra VMEM
    row per program, zero extra MXU work."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    nk = k.shape[0]
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, nk), dimension=1)
    kbias = jnp.where(kidx < n_valid, b_ref[0].astype(jnp.float32), NEG_INF)

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + kbias
        m = s.max(axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        r = 1.0 / e.sum(axis=-1, keepdims=True)
        p = (e * r).astype(vh.dtype)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention_packed_bias(q, k, v, k_bias, scale: float, num_heads: int,
                                q_block: int = 0):
    """Packed attention with a key-side additive logit bias [B, N] f32.

    Proportional attention for the token filter: fused context tokens get
    +log(#tokens they represent), merge-mode kept tokens +log(group size),
    so the post-filter softmax approximates the full-token-set attention
    distribution instead of renormalizing all mass onto the subsample —
    the CLS-row drift mechanism localized in docs/PERF.md (round-4
    section). Backward differentiates the XLA reference."""
    return _flash_packed_bias_fwd_only(q, k, v, k_bias, scale, num_heads,
                                       q_block)


def _flash_packed_bias_vjp_fwd(q, k, v, k_bias, scale, num_heads, q_block):
    return (
        flash_attention_packed_bias(q, k, v, k_bias, scale, num_heads,
                                    q_block),
        (q, k, v, k_bias),
    )


def _flash_packed_bias_vjp_bwd(scale, num_heads, q_block, res, g):
    q, k, v, k_bias = res
    _, vjp = jax.vjp(
        lambda a, b, c, d: _packed_reference_bias(a, b, c, d, scale,
                                                  num_heads),
        q, k, v, k_bias)
    return vjp(g)


flash_attention_packed_bias.defvjp(_flash_packed_bias_vjp_fwd,
                                   _flash_packed_bias_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "num_heads", "q_block"))
def _flash_packed_bias_fwd_only(q, k, v, k_bias, scale: float, num_heads: int,
                                q_block: int = 0):
    B, N, HD = q.shape
    D = HD // num_heads
    if HD >= 1024:
        # follows the dinov2 scan's ViT-L unroll default — see the
        # rationale at the packed (no-bias) call site below
        cap = 288 if os.environ.get("CAIM_SCAN_UNROLL") == "1" else 352
    else:
        cap = 480 if B <= 8 else 352
    q_block = (q_block or int(os.environ.get("CAIM_FLASH_QB", "0"))
               or _pick_q_block(N, max_block=cap))
    grid = (B, pl.cdiv(N, q_block))
    bias3 = k_bias.astype(jnp.float32).reshape(B, 1, N)
    return pl.pallas_call(
        functools.partial(
            _flash_packed_bias_kernel, scale=scale, num_heads=num_heads,
            head_dim=D, n_valid=N,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, HD), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, HD), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, HD), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, HD), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, HD), v.dtype),
    )(q, k, v, bias3)


def _flash_packed_i8qk_bias_kernel(q_ref, sq_ref, k_ref, sk_ref, v_ref,
                                   b_ref, o_ref, *, num_heads, head_dim,
                                   n_valid):
    """_flash_packed_i8qk_kernel + per-key additive logit bias row."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    sq = sq_ref[0]
    sk = sk_ref[0]
    nk = k.shape[0]
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, nk), dimension=1)
    kbias = jnp.where(kidx < n_valid, b_ref[0].astype(jnp.float32), NEG_INF)

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s32 = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s = s32.astype(jnp.float32) * sq * sk + kbias
        m = s.max(axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        r = 1.0 / e.sum(axis=-1, keepdims=True)
        p = (e * r).astype(v.dtype)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention_packed_i8qk_bias(q, k, v, k_bias, scale: float,
                                     num_heads: int, q_block: int = 0):
    """int8-QK^T packed attention with a key-side logit bias (see
    flash_attention_packed_bias). Backward differentiates the
    full-precision XLA reference (straight-through past quantization)."""
    return _i8qk_bias_fwd_only(q, k, v, k_bias, scale, num_heads, q_block)


def _i8qk_bias_vjp_fwd(q, k, v, k_bias, scale, num_heads, q_block):
    return (
        flash_attention_packed_i8qk_bias(q, k, v, k_bias, scale, num_heads,
                                         q_block),
        (q, k, v, k_bias),
    )


def _i8qk_bias_vjp_bwd(scale, num_heads, q_block, res, g):
    q, k, v, k_bias = res
    _, vjp = jax.vjp(
        lambda a, b, c, d: _packed_reference_bias(a, b, c, d, scale,
                                                  num_heads),
        q, k, v, k_bias)
    return vjp(g)


flash_attention_packed_i8qk_bias.defvjp(_i8qk_bias_vjp_fwd,
                                        _i8qk_bias_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "num_heads", "q_block"))
def _i8qk_bias_fwd_only(q, k, v, k_bias, scale: float, num_heads: int,
                        q_block: int = 0):
    B, N, HD = q.shape
    D = HD // num_heads
    q_block = q_block or _pick_q_block(N, max_block=480 if B <= 8 else 352)
    q8, sq = quantize_rows(q)
    k8, sk = quantize_rows(k)
    sq = sq * scale
    sk_t = sk.transpose(0, 2, 1)
    bias3 = k_bias.astype(jnp.float32).reshape(B, 1, N)
    grid = (B, pl.cdiv(N, q_block))
    return pl.pallas_call(
        functools.partial(
            _flash_packed_i8qk_bias_kernel, num_heads=num_heads, head_dim=D,
            n_valid=N,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, HD), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_block, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, HD), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, HD), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, HD), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, HD), v.dtype),
    )(q8, sq, k8, sk_t, v, bias3)


# ----------------------------------------------------- packed v2 (int8) -----
def _quant_rows(x):
    """per-row symmetric int8 in-VMEM quantization -> (int8, f32 scale)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
    return jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8), s


def _flash_packed_int8_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, num_heads,
                              head_dim, n_valid):
    """int8 QK^T (2x MXU rate on v5e): q/k quantized per row in VMEM; scores
    dequantized with the outer product of row scales. PV stays bf16 — the
    softmax weights are too diffuse at N~1.4k (mean ~1/N << 1/127) to
    quantize without losing mass. Fast-path only — opt-in via the int8
    policy."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    nk = k.shape[0]
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, nk), dimension=1)
    kbias = jnp.where(kidx < n_valid, 0.0, NEG_INF).astype(jnp.float32)

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        qq, sq = _quant_rows(qh)
        kq, sk = _quant_rows(kh)
        s = jax.lax.dot_general(
            qq, kq, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        s = s * (sq * scale) * sk[:, 0][None, :] + kbias
        m = s.max(axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        r = 1.0 / e.sum(axis=-1, keepdims=True)
        p = (e * r).astype(vh.dtype)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _flash_packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, num_heads,
                         head_dim, n_valid):
    """Packed-layout kernel: refs are [1, block_n, H*D] slices of the natural
    [B, N, H*D] activation layout — no transposes or pad ops in HBM. Heads
    are looped in-kernel; keys/values for the whole sequence stay resident in
    VMEM (ViT-scale N <= ~1.4k)."""
    q = q_ref[0]  # [bq, H*D]
    k = k_ref[0]  # [Nk, H*D] (edge-padded by Mosaic)
    v = v_ref[0]
    nk = k.shape[0]
    # additive key mask (one row, computed once): cheaper per-head than a
    # select over the full [bq, nk] score block
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, nk), dimension=1)
    kbias = jnp.where(kidx < n_valid, 0.0, NEG_INF).astype(jnp.float32)

    for h in range(num_heads):  # static unroll; lane-aligned 64-wide slices
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + kbias
        m = s.max(axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        r = 1.0 / e.sum(axis=-1, keepdims=True)
        p = (e * r).astype(vh.dtype)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _pick_q_block(n: int, max_block: int = 704) -> int:
    """Smallest-padding q block: round N up to a multiple of 32 (int8 sublane
    tile; also valid for bf16), split into the fewest blocks <= max_block.

    Round 1 used a fixed q_block=512, padding N=1370 to 1536 query rows — a
    12% MXU-FLOP tax on every QK^T and PV dot. N=1370 now picks 704 (2 blocks
    = 1408 rows, 2.8% — matching the lane padding of the key dimension).
    """
    n32 = _round_up(n, 32)
    nblocks = -(-n32 // max_block)
    return _round_up(-(-n // nblocks), 32)


# ------------------------------------------------- int8 QK^T (pre-quant) ----
def quantize_rows(x):
    """[B, N, HD] -> (int8 [B, N, HD], f32 scales [B, N, 1]).

    Symmetric per-row (joint across heads) quantization, done OUTSIDE the
    kernel so XLA fuses it into the qkv projection epilogue. Round 1's
    in-kernel variant re-quantized K for every q block on the VPU and
    measured slower end-to-end (364 vs 405 img/s). Per-(row, head) scales
    were also tried and lost: the [B, N, H, D] reshape + minor-dim-64 max
    forces a physical relayout on TPU (~0.19 ms/layer/tensor), swamping the
    precision benefit. Joint-row scales reduce over the natural 768-lane
    axis — free to fuse.
    """
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _flash_packed_i8qk_kernel(q_ref, sq_ref, k_ref, sk_ref, v_ref, o_ref, *,
                              num_heads, head_dim, n_valid):
    """Packed-layout kernel with int8 QK^T on pre-quantized q/k.

    q_ref [1, bq, H*D] int8, sq_ref [1, bq, 1] f32 (softmax scale folded in),
    k_ref [1, nk, H*D] int8, sk_ref [1, 1, nk] f32 (pre-transposed row),
    v_ref [1, nk, H*D] bf16.

    The int8 dot accumulates in int32 (no NaN/inf possible from Mosaic edge
    padding), dequantized by the outer product of row scales; the additive
    key mask then kills padded columns. PV stays bf16 — softmax rows are too
    diffuse at N~1.4k to survive per-row int8 (measured round 1)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    sq = sq_ref[0]  # [bq, 1]
    sk = sk_ref[0]  # [1, nk]
    nk = k.shape[0]
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, nk), dimension=1)
    kbias = jnp.where(kidx < n_valid, 0.0, NEG_INF).astype(jnp.float32)

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s32 = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s = s32.astype(jnp.float32) * sq * sk + kbias
        m = s.max(axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        r = 1.0 / e.sum(axis=-1, keepdims=True)
        p = (e * r).astype(v.dtype)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_packed_i8qk(q, k, v, scale: float, num_heads: int,
                                q_block: int = 0):
    """Packed attention with int8 QK^T: q, k, v [B, N, H*D] float in, float
    out. Quantization (per-row, per-head symmetric) runs in XLA where it
    fuses with the projection epilogue; the kernel consumes int8 directly.
    q_block=0 picks the minimal-padding block size. Backward differentiates
    the full-precision XLA reference (straight-through past quantization)."""
    return _i8qk_fwd_only(q, k, v, scale, num_heads, q_block)


def _i8qk_vjp_fwd(q, k, v, scale, num_heads, q_block):
    return flash_attention_packed_i8qk(q, k, v, scale, num_heads, q_block), (q, k, v)


def _i8qk_vjp_bwd(scale, num_heads, q_block, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _packed_reference(a, b, c, scale, num_heads),
                     q, k, v)
    return vjp(g)


flash_attention_packed_i8qk.defvjp(_i8qk_vjp_fwd, _i8qk_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "num_heads", "q_block"))
def _i8qk_fwd_only(q, k, v, scale: float, num_heads: int, q_block: int = 0):
    B, N, HD = q.shape
    D = HD // num_heads
    q_block = q_block or _pick_q_block(N, max_block=480 if B <= 8 else 352)
    q8, sq = quantize_rows(q)
    k8, sk = quantize_rows(k)
    sq = sq * scale  # fold the softmax scale into the row scales
    sk_t = sk.transpose(0, 2, 1)  # [B, 1, N] — one sublane row in-kernel
    grid = (B, pl.cdiv(N, q_block))
    return pl.pallas_call(
        functools.partial(
            _flash_packed_i8qk_kernel, num_heads=num_heads, head_dim=D,
            n_valid=N,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, HD), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_block, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, HD), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, HD), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, HD), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, HD), v.dtype),
    )(q8, sq, k8, sk_t, v)


def _packed_reference(q, k, v, scale, num_heads):
    """XLA reference on the packed layout (differentiable; used as the
    backward rule for the Pallas forward)."""
    B, N, HD = q.shape
    D = HD // num_heads
    out = attention_reference(
        q.reshape(B, N, num_heads, D),
        k.reshape(B, N, num_heads, D),
        v.reshape(B, N, num_heads, D),
        scale,
    )
    return out.reshape(B, N, HD)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention_packed(q, k, v, scale: float, num_heads: int,
                           q_block: int = 0, int8_dots: bool = False):
    """q, k, v: [B, N, H*D] packed activations -> [B, N, H*D].

    Reads/writes the natural dense-projection layout directly (the v1 kernel
    required a [B*H, N, D] transpose + pad, ~4ms/step of HBM copies at
    518^2). Edge blocks are handled by Mosaic's automatic block padding, so
    N need not divide q_block; q_block=0 (default) picks the
    minimal-padding block via _pick_q_block.

    Differentiable via custom_vjp: the forward runs the Pallas kernel; the
    backward differentiates the XLA reference (recompute, flash-style — the
    score matrix is never saved as a residual)."""
    return _flash_packed_fwd_only(q, k, v, scale, num_heads, q_block, int8_dots)


def _flash_packed_vjp_fwd(q, k, v, scale, num_heads, q_block, int8_dots):
    return (
        flash_attention_packed(q, k, v, scale, num_heads, q_block, int8_dots),
        (q, k, v),
    )


def _flash_packed_vjp_bwd(scale, num_heads, q_block, int8_dots, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _packed_reference(a, b, c, scale, num_heads),
                     q, k, v)
    return vjp(g)


flash_attention_packed.defvjp(_flash_packed_vjp_fwd, _flash_packed_vjp_bwd)


@functools.partial(
    jax.jit, static_argnames=("scale", "num_heads", "q_block", "int8_dots")
)
def _flash_packed_fwd_only(q, k, v, scale: float, num_heads: int,
                           q_block: int = 0, int8_dots: bool = False):
    B, N, HD = q.shape
    D = HD // num_heads
    # Mosaic's scoped-VMEM accounting tightens with batch and with what XLA
    # fuses around the call: block 704 at N=1370 sits ~16.1 MB against the
    # 16 MB scoped limit and started OOMing at B=8 once the fused-MLP kernel
    # landed; 480 (3 blocks, +2.3% row padding vs 704) leaves ~3 MB headroom.
    # At HD >= 1024 (ViT-L) the resident K/V double, so the cap drops.
    # 288 (5 blocks at N=1370) beats the earlier 256 (6 blocks) end-to-end
    # — fewer, larger programs pipeline better despite 5% vs 1.6% row
    # padding. 352 regresses on VMEM pressure at scan unroll 1 (122.6
    # img/s) but WINS at the ViT-L default unroll 2 (155.4 vs 152.6):
    # unrolling lets XLA pipeline the adjacent layer's DMAs over the
    # stall (scripts/bench_vitl_sweep.py, docs/PERF.md round-4 ViT-L
    # sweep). The default follows the dinov2 scan's unroll default
    # (2 at D>=1024); force CAIM_FLASH_QB=288 if running ViT-L with
    # CAIM_SCAN_UNROLL=1.
    if HD >= 1024:
        cap = 288 if os.environ.get("CAIM_SCAN_UNROLL") == "1" else 352
    else:
        cap = 480 if B <= 8 else 352
    q_block = (q_block or int(os.environ.get("CAIM_FLASH_QB", "0"))
               or _pick_q_block(N, max_block=cap))
    grid = (B, pl.cdiv(N, q_block))
    kernel = _flash_packed_int8_kernel if int8_dots else _flash_packed_kernel
    return pl.pallas_call(
        functools.partial(
            kernel, scale=scale, num_heads=num_heads, head_dim=D, n_valid=N,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, HD), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, HD), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, HD), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, HD), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, HD), q.dtype),
    )(q, k, v)


# --------------------------------------- fused attn_out + residual epilogue --
def _flash_packed_out_res_kernel(q_ref, k_ref, v_ref, wq_ref, ws_ref, b_ref,
                                 ls_ref, res_ref, o_ref, *, scale, num_heads,
                                 head_dim, n_valid):
    """Packed attention with the attn_out projection fused in: after the
    per-head context is assembled in VMEM it is row-quantized and pushed
    through the int8 [HD, HD] output projection, scaled by LayerScale and
    added to the residual — the [B, N, HD] context never reaches HBM
    (inference int8 path only)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    nk = k.shape[0]
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, nk), dimension=1)
    kbias = jnp.where(kidx < n_valid, 0.0, NEG_INF).astype(jnp.float32)

    parts = []
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + kbias
        m = s.max(axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        r = 1.0 / e.sum(axis=-1, keepdims=True)
        p = (e * r).astype(v.dtype)
        parts.append(jax.lax.dot_general(
            p, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    ctx = jnp.concatenate(parts, axis=-1)  # [bq, HD] f32, VMEM-resident
    cq, sc = _quant_rows(ctx)
    acc = jax.lax.dot_general(
        cq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sc * ws_ref[...] + b_ref[...]
    o_ref[0] = (res_ref[0].astype(jnp.float32)
                + ls_ref[...] * y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "num_heads", "q_block"))
def flash_attention_packed_out_res(q, k, v, wq, ws, b, ls, res,
                                   scale: float, num_heads: int,
                                   q_block: int = 0):
    """res + ls * attn_out(attention(q, k, v)) in one kernel.

    q, k, v: [B, N, H*D] packed; wq/ws: int8 attn_out weight + col scales;
    b: bias; ls: LayerScale; res: [B, N, H*D] residual (the pre-LN block
    input). Returns [B, N, H*D] in res.dtype. q_block capped at 352 — the
    extra VMEM residents (int8 weight, f32 context, residual tile) exceed
    Mosaic's scoped accounting at 704."""
    B, N, HD = q.shape
    D = HD // num_heads
    q_block = q_block or _pick_q_block(N, max_block=352)
    grid = (B, pl.cdiv(N, q_block))
    qspec = pl.BlockSpec((1, q_block, HD), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM)
    fullspec = pl.BlockSpec((1, N, HD), lambda b_, i: (b_, 0, 0),
                            memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((1, HD), lambda b_, i: (0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _flash_packed_out_res_kernel, scale=scale, num_heads=num_heads,
            head_dim=D, n_valid=N,
        ),
        grid=grid,
        in_specs=[
            qspec, fullspec, fullspec,
            pl.BlockSpec((HD, HD), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            rowspec, rowspec, rowspec, qspec,
        ],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((B, N, HD), res.dtype),
    )(q, k, v, wq, ws.reshape(1, HD), b.reshape(1, HD), ls.reshape(1, HD),
      res)

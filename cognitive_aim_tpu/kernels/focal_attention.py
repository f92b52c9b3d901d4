"""Fused focal-stream attention (Pallas, TPU).

The FocalStream (ref:src/model.py:128-313) computes a full NxN single-matrix
attention over patch tokens and then consumes FOUR different views of it:

  attended = attn @ v                      (ref:308-311 weighted patches)
  colmean  = attn.mean(axis=1)             (ref:233 per-patch aggregation)
  diag     = diagonal(attn)                (ref:242-244 fallback 1)
  rowmax   = attn.max(axis=-1)             (ref:247-249 fallback 2)

The XLA path materializes attn [B, N, N] f32 in HBM (60 MB/iteration at
518^2, batch 8) and re-reads it once per view — ~0.9 ms/step of pure HBM
traffic across the 3 iterations. This kernel tiles queries into VMEM blocks,
computes the exact row softmax in f32 (keys fit resident at ViT scale,
N <= ~1.4k — no online rescaling needed), and emits all four views directly;
the score matrix never leaves VMEM.

Unlike the ViT MHSA (head_dim 64, half-width MXU), the focal contraction is
the full patch dim (768) — both dots here run at full MXU width, so the
kernel is HBM-bound and fusion is the whole win.

Differentiable via custom_vjp: backward recomputes through the XLA reference
(flash-style — attn is never saved as a residual).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cognitive_aim_tpu.kernels.flash_attention import NEG_INF, _pick_q_block


def focal_attention_reference(q, k, v, scale: float):
    """XLA reference: returns (attended [B,N,D], colmean/diag/rowmax [B,N]).

    Matches models/streams.focal_apply's inline math: softmax in f32,
    attended in the compute dtype (ref:src/model.py:197-204, 233-249)."""
    scores = jnp.einsum("bnd,bmd->bnm", q, k) / scale
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    attended = jnp.einsum("bnm,bmd->bnd", attn.astype(q.dtype), v)
    colmean = attn.mean(axis=1)
    diag = jnp.diagonal(attn, axis1=-2, axis2=-1)
    rowmax = attn.max(axis=-1)
    return attended, colmean, diag, rowmax


def _focal_kernel(q_ref, k_ref, v_ref, att_ref, colsum_ref, diag_ref,
                  rowmax_ref, *, inv_scale, q_block, n_valid):
    """One (batch, q_block) program. colsum accumulates across q-block grid
    steps (TPU grid iterations are sequential)."""
    i = pl.program_id(1)
    q = q_ref[0]  # [bq, D]
    k = k_ref[0]  # [nk, D]
    v = v_ref[0]
    bq = q.shape[0]
    nk = k.shape[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * inv_scale
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, nk), dimension=1)
    s = s + jnp.where(kidx < n_valid, 0.0, NEG_INF).astype(jnp.float32)

    m = s.max(axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = e.sum(axis=-1, keepdims=True)
    attn = e / denom  # [bq, nk] f32, rows are exact softmax

    att_ref[0] = jax.lax.dot_general(
        attn.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(att_ref.dtype)

    # row views: padded-query rows are masked out of colsum; their
    # diag/rowmax lanes fall outside the [B, N] output and are dropped by
    # Mosaic's masked store.
    qidx = i * q_block + jax.lax.broadcasted_iota(
        jnp.int32, (bq, 1), dimension=0
    )
    # where (not multiply): padded q rows may be NaN-filled, and NaN*0=NaN
    # would poison the accumulated column sum
    masked = jnp.where(qidx < n_valid, attn, 0.0)  # [bq, nk]
    colsum = jnp.sum(masked, axis=0, keepdims=True)  # [1, nk]
    colsum_ref[0] = jnp.where(i == 0, colsum, colsum_ref[0] + colsum)

    # diagonal: global column == global row
    is_diag = (kidx == qidx).astype(jnp.float32)  # [bq, nk] via broadcast
    diag_ref[0] = jnp.sum(attn * is_diag, axis=-1, keepdims=True)
    rowmax_ref[0] = attn.max(axis=-1, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def focal_attention_fused(q, k, v, scale: float, q_block: int = 0):
    """q, k, v: [B, N, D] -> (attended [B,N,D], colmean/diag/rowmax [B,N]).

    `scale` divides the scores (ref:src/model.py:69 uses sqrt(D//num_heads)
    as a DIVISOR). q_block=0 picks the minimal-padding block size."""
    return _focal_fused_fwd(q, k, v, scale, q_block)


def _focal_vjp_fwd(q, k, v, scale, q_block):
    return focal_attention_fused(q, k, v, scale, q_block), (q, k, v)


def _focal_vjp_bwd(scale, q_block, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda a, b, c: focal_attention_reference(a, b, c, scale), q, k, v
    )
    return vjp(g)


focal_attention_fused.defvjp(_focal_vjp_fwd, _focal_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "q_block"))
def _focal_fused_fwd(q, k, v, scale: float, q_block: int = 0):
    B, N, D = q.shape
    # max_block 352 (not 704): the f32 score block is the VMEM hog here
    # (704x1408 f32 = 4 MB) and 704 tips the kernel over the 16 MB scoped
    # limit at batch 16; 352 costs ~0.03 ms/iter and removes the cliff.
    # At D >= 1024 (ViT-L streams) the resident K/V alone are 5.6 MB, so
    # the cap drops to 224 to keep composed-graph headroom.
    q_block = q_block or _pick_q_block(N, max_block=352 if D <= 768 else 224)
    grid = (B, pl.cdiv(N, q_block))
    row_spec = pl.BlockSpec((1, q_block, 1), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)
    att, colsum, diag, rowmax = pl.pallas_call(
        functools.partial(
            _focal_kernel, inv_scale=1.0 / scale, q_block=q_block, n_valid=N,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, q_block, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
            row_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, D), q.dtype),
            jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
        ],
    )(q, k, v)
    return att, colsum[:, 0, :] / N, diag[:, :, 0], rowmax[:, :, 0]

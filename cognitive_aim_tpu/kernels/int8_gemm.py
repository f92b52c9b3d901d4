"""Fused int8 GEMM Pallas kernel: dynamic per-row activation quantization
in VMEM + int8 MXU dot + dequant/bias, in one HBM pass.

The XLA int8 path (int8_ops.int8_linear) pays separate HBM passes for the
activation max-reduce and the round/cast (measured ~0.09 ms just to quantize
fc2's [10960, 3072] input). Here the weight matrix stays VMEM-resident across
the M grid (constant index_map -> fetched once), each activation tile is read
once, quantized in-registers, and the int8 dot accumulates in int32:

    grid (M / m_block,)
    x    [m_block, K] bf16   (tile)
    wq   [K, N]       int8   (resident)
    ws   [1, N]       f32    (resident)
    b    [1, N]       f32    (resident)
    out  [m_block, N] bf16

K, N are backbone-sized (768..3072): whole-N weight tiles fit VMEM
(<= 2.25 MB int8). Edge M blocks are auto-padded by Mosaic; zero rows
quantize to zero via the scale floor."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wq_ref, ws_ref, b_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)  # [mb, K]
    ax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    sx = jnp.maximum(ax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * ws_ref[...] + b_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("m_block", "out_dtype"))
def int8_gemm_fused(x, wq, ws, b, m_block: int = 256, out_dtype=jnp.bfloat16):
    """x [M, K] float -> [M, N] out_dtype; wq [K, N] int8, ws [N] f32 scales,
    b [N] f32 bias (pass zeros if none)."""
    M, K = x.shape
    N = wq.shape[1]
    grid = (pl.cdiv(M, m_block),)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_block, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_block, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
    )(x, wq, ws.reshape(1, N), b.reshape(1, N))


def int8_linear_fused(x, wq: dict, b, out_dtype=None):
    """[..., K] wrapper over int8_gemm_fused (flattens leading dims)."""
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = wq["q"].shape[1]
    bias = b if b is not None else jnp.zeros((N,), jnp.float32)
    y = int8_gemm_fused(
        x.reshape(-1, K), wq["q"], wq["s"], bias.astype(jnp.float32),
        out_dtype=out_dtype,
    )
    return y.reshape(*lead, N)

"""Round-2 micro-probes for the last ~1.5 ms/step @518^2 (see docs/PERF.md):

  1. patchify: reshape/transpose/reshape + matmul (current, 0.39 ms) vs an
     einsum that hands XLA the contraction with the transpose unfused;
  2. fc1 kernel activation: tanh GELU (current) vs sigmoid GELU
     (x * sigmoid(1.702 x)) — exp measured 1714 Gelem/s vs tanh-gelu 450;
  3. LN-fused vs unfused int8 qkv kernel (sanity check on the fusion win).

Usage: python scripts/probe_round2b.py   (real TPU; ~2 min)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cognitive_aim_tpu.kernels import int8_block as IB
from cognitive_aim_tpu.kernels import int8_ops as I8
from cognitive_aim_tpu.utils.profiling import chain_throughput

B, S, P, D, F = 16, 518, 14, 768, 3072
G = S // P
N = G * G + 1


def probe(name, fn, carry):
    t = chain_throughput(fn, carry)
    print(f"{name}: {t*1e3:.3f} ms/step", flush=True)
    return t


rng = np.random.RandomState(0)
img = jnp.asarray(rng.randn(B, S, S, 3).astype(np.float32), jnp.bfloat16)
w = jnp.asarray(rng.randn(P * P * 3, D).astype(np.float32) * 0.02, jnp.bfloat16)
w4 = w.reshape(P, P, 3, D)

# --- 1. patchify + embed ---
def patchify_current(c):
    x = c.reshape(B, G, P, G, P, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, G * G, P * P * 3)
    y = x @ w
    return c + (y.mean() * 1e-12).astype(c.dtype)


def patchify_einsum(c):
    x = c.reshape(B, G, P, G, P, 3)
    y = jnp.einsum("bhpwqc,pqcd->bhwd", x, w4,
                   preferred_element_type=jnp.float32)
    return c + (y.mean() * 1e-12).astype(c.dtype)


probe("patchify+embed current (transpose+matmul)", patchify_current, img)
probe("patchify+embed einsum (XLA-fused contraction)", patchify_einsum, img)

# --- 2. fc1 activation variants ---
x = jnp.asarray(rng.randn(B, N, D).astype(np.float32) * 0.5, jnp.bfloat16)
wq1 = I8.quantize_weight(jnp.asarray(rng.randn(D, F) * 0.05, jnp.float32))
b1 = jnp.zeros((F,), jnp.float32)
g1 = jnp.ones((D,), jnp.float32)
be1 = jnp.zeros((D,), jnp.float32)


def fc1_tanh(c):
    h8, sh = IB.int8_fc1_gelu_ln(c, g1, be1, wq1["q"], wq1["s"], b1)
    return c + (h8[..., :D].astype(jnp.float32) * sh * 1e-12).astype(c.dtype)


def _fc1_sig_kernel(eps, x_ref, g_ref, be_ref, wq_ref, ws_ref, b_ref,
                    h8_ref, sh_ref):
    xn = IB._ln_f32(x_ref[0].astype(jnp.float32), g_ref[...], be_ref[...], eps)
    xq, sx = IB._quant_rows_f32(xn)
    acc = jax.lax.dot_general(xq, wq_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * ws_ref[...] + b_ref[...]
    h = y * jax.nn.sigmoid(1.702 * y)
    h8, sh = IB._quant_rows_f32(h)
    h8_ref[0] = h8
    sh_ref[0] = sh


@functools.partial(jax.jit, static_argnames=("eps", "n_block"))
def fc1_sigmoid_ln(xx, g, be, wqq, ws, b, eps=1e-6, n_block=0):
    from cognitive_aim_tpu.kernels.flash_attention import _pick_q_block
    Bb, Nn, K = xx.shape
    Ff = wqq.shape[1]
    nb = n_block or _pick_q_block(Nn)
    return pl.pallas_call(
        functools.partial(_fc1_sig_kernel, eps),
        grid=(Bb, pl.cdiv(Nn, nb)),
        in_specs=[IB._xspec(nb, K), IB._rowspec(K), IB._rowspec(K),
                  IB._wspec(K, Ff), IB._rowspec(Ff), IB._rowspec(Ff)],
        out_specs=[IB._xspec(nb, Ff), IB._xspec(nb, 1)],
        out_shape=[jax.ShapeDtypeStruct((Bb, Nn, Ff), jnp.int8),
                   jax.ShapeDtypeStruct((Bb, Nn, 1), jnp.float32)],
    )(xx, g.reshape(1, K), be.reshape(1, K), wqq, ws.reshape(1, Ff),
      b.reshape(1, Ff))


def fc1_sig(c):
    h8, sh = fc1_sigmoid_ln(c, g1, be1, wq1["q"], wq1["s"], b1)
    return c + (h8[..., :D].astype(jnp.float32) * sh * 1e-12).astype(c.dtype)


t_tanh = probe("fc1 LN+GEMM+tanh-gelu+requant", fc1_tanh, x)
t_sig = probe("fc1 LN+GEMM+sigmoid-gelu+requant", fc1_sig, x)
print(f"  sigmoid saves {(t_tanh - t_sig)*1e3*12:.2f} ms/step over 12 layers")

# accuracy of sigmoid vs tanh GELU on the actual activation distribution
h_ref = jax.nn.gelu(
    I8.int8_linear(x.astype(jnp.float32), wq1, b1), approximate=True)
h8s, shs = fc1_sigmoid_ln(x, g1, be1, wq1["q"], wq1["s"], b1)
h_sig = h8s.astype(np.float32) * shs
rel = np.abs(np.asarray(h_sig) - np.asarray(h_ref))
print(f"  sigmoid-vs-tanh abs err: mean {rel.mean():.5f} max {rel.max():.4f} "
      f"(vs activation std {float(np.asarray(h_ref).std()):.3f})")

# --- 3. qkv LN fusion sanity ---
wqkv = I8.quantize_weight(jnp.asarray(rng.randn(D, 3 * D) * 0.05, jnp.float32))
bqkv = jnp.zeros((3 * D,), jnp.float32)


def qkv_fused(c):
    q, k, v = IB.int8_qkv_proj_ln(c, g1, be1, wqkv["q"], wqkv["s"], bqkv)
    return c + ((q.mean() + k.mean() + v.mean()) * 1e-12).astype(c.dtype)


def qkv_unfused(c):
    from cognitive_aim_tpu.nn import layers as L
    h = L.layernorm_apply({"scale": g1, "bias": be1}, c, 1e-6)
    q, k, v = IB.int8_qkv_proj(h, wqkv["q"], wqkv["s"], bqkv)
    return c + ((q.mean() + k.mean() + v.mean()) * 1e-12).astype(c.dtype)


t_f = probe("qkv int8 GEMM with LN fused", qkv_fused, x)
t_u = probe("qkv int8 GEMM with separate LN", qkv_unfused, x)
print(f"  LN fusion saves {(t_u - t_f)*1e3*12:.2f} ms/step over 12 layers")

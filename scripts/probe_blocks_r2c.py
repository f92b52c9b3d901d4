"""Block-size tuning probe for the round-2c kernel chain @518^2.

  1. int8_mlp_ln n_block: 256 / 352 / 480 (hidden f32 tile is nb x 3072;
     480 => 5.9 MB + 4.6 MB resident int8 weights — near the scoped limit);
  2. flash_attention_packed q_block at B in {16, 24}: 352 vs 480.

Usage: python scripts/probe_blocks_r2c.py   (real TPU; ~3 min)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from cognitive_aim_tpu.kernels import int8_block as IB
from cognitive_aim_tpu.kernels import int8_ops as I8
from cognitive_aim_tpu.kernels.flash_attention import flash_attention_packed
from cognitive_aim_tpu.utils.profiling import chain_throughput

N, D, F, H = 1370, 768, 3072, 12

rng = np.random.RandomState(0)


def probe(name, fn, carry):
    try:
        t = chain_throughput(fn, carry)
        print(f"{name}: {t*1e3:.3f} ms/step", flush=True)
    except Exception as e:
        print(f"{name} FAILED: {str(e)[:140]}", flush=True)


def mlp_case(B, nb):
    x = jnp.asarray(rng.randn(B, N, D).astype(np.float32) * 0.5, jnp.bfloat16)
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)
    w1 = I8.quantize_weight(jnp.asarray(rng.randn(D, F) * 0.05, jnp.float32))
    w2 = I8.quantize_weight(jnp.asarray(rng.randn(F, D) * 0.05, jnp.float32))
    b1 = jnp.zeros((F,), jnp.float32)
    b2 = jnp.zeros((D,), jnp.float32)
    ls = jnp.full((D,), 0.9, jnp.float32)

    def step(c):
        return IB.int8_mlp_ln(c, g, be, w1["q"], w1["s"], b1,
                              w2["q"], w2["s"], b2, ls, n_block=nb)

    probe(f"int8_mlp_ln B={B} nb={nb}", step, x)


def flash_case(B, qb):
    q = jnp.asarray(rng.randn(B, N, D).astype(np.float32), jnp.bfloat16)

    def step(c):
        return flash_attention_packed(c, c, c, 0.125, H, q_block=qb)

    probe(f"flash B={B} qb={qb}", step, q)


if __name__ == "__main__":
    nbs = [int(v) for v in os.environ.get(
        "PROBE_NB", "128,192,224,256,288,352").split(",") if v]
    qbs = [int(v) for v in os.environ.get(
        "PROBE_QB", "288,352,480").split(",") if v]
    for B in (16, 24):
        for nb in nbs:
            mlp_case(B, nb)
    for B in (16, 24):
        for qb in qbs:
            flash_case(B, qb)

"""Initializers matching torch semantics.

The reference initializes cognitive modules with specific torch initializers
(xavier_uniform gain=0.8 ref:src/model.py:101, xavier_normal gain=2.0
ref:src/model.py:116-118, uniform biases ref:src/model.py:122-124, plus
torch's nn.Linear default kaiming-uniform). We reproduce the *distributions*
(not the bit streams — torch and JAX PRNGs differ); parity tests transplant
torch-sampled weights instead of comparing init draws.

Weight layout convention: linear weights are stored as (in_features,
out_features) so application is ``x @ w + b``; the torch->JAX checkpoint
converter transposes torch's (out, in) layout.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_uniform(key, in_dim, out_dim, gain=1.0, dtype=jnp.float32):
    a = gain * math.sqrt(6.0 / (in_dim + out_dim))
    return jax.random.uniform(key, (in_dim, out_dim), dtype, -a, a)


def xavier_normal(key, in_dim, out_dim, gain=1.0, dtype=jnp.float32):
    std = gain * math.sqrt(2.0 / (in_dim + out_dim))
    return std * jax.random.normal(key, (in_dim, out_dim), dtype)


def kaiming_uniform_linear(key, in_dim, out_dim, dtype=jnp.float32):
    """torch nn.Linear default weight init: kaiming_uniform_(a=sqrt(5)),
    which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(in_dim)
    return jax.random.uniform(key, (in_dim, out_dim), dtype, -bound, bound)


def linear_bias_default(key, in_dim, out_dim, dtype=jnp.float32):
    """torch nn.Linear default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(in_dim)
    return jax.random.uniform(key, (out_dim,), dtype, -bound, bound)


def uniform(key, shape, low, high, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, low, high)


def normal(key, shape, std=1.0, mean=0.0, dtype=jnp.float32):
    return mean + std * jax.random.normal(key, shape, dtype)


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    """torch trunc_normal_ (±2 std), used by HF Dinov2 init."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

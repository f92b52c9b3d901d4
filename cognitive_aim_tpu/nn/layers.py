"""Functional NN layers: pure functions over parameter pytrees.

No module objects hold state — parameters are nested dicts of jnp arrays,
applied by pure functions. This is what makes pjit sharding, checkpoint
conversion, and jax.grad straightforward.

Naming: ``*_init(key, ...) -> params`` and ``*_apply(params, x, ...) -> y``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from cognitive_aim_tpu.nn import init as tinit


# ---------------------------------------------------------------- linear ----
def linear_init(key, in_dim, out_dim, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    return {
        "w": tinit.kaiming_uniform_linear(kw, in_dim, out_dim, dtype),
        "b": tinit.linear_bias_default(kb, in_dim, out_dim, dtype),
    }


def linear_apply(params, x):
    return x @ params["w"] + params["b"]


# ------------------------------------------------------------------- mlp ----
def mlp_init(key, dims: Sequence[int], dtype=jnp.float32):
    """Chain of linears; dims = [in, h1, ..., out]."""
    keys = jax.random.split(key, len(dims) - 1)
    return {
        f"fc{i}": linear_init(k, dims[i], dims[i + 1], dtype)
        for i, k in enumerate(keys)
    }


def mlp_apply(params, x, *, act=jax.nn.relu, final_act=None,
              dropout_rate=0.0, dropout_after: Sequence[int] = (),
              rng=None, train=False):
    """Apply linears with `act` between them (not after the last unless
    final_act). `dropout_after` lists hidden-layer indices (0-based) after
    whose activation a Dropout sits, mirroring nn.Sequential layouts."""
    n = len(params)
    for i in range(n):
        x = linear_apply(params[f"fc{i}"], x)
        if i < n - 1:
            x = act(x)
            if train and dropout_rate > 0.0 and i in dropout_after and rng is not None:
                rng, sub = jax.random.split(rng)
                x = dropout(sub, x, dropout_rate)
    if final_act is not None:
        x = final_act(x)
    return x


# --------------------------------------------------------------- dropout ----
def dropout(key, x, rate):
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ------------------------------------------------------------- layernorm ----
def layernorm_init(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layernorm_apply(params, x, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * params["scale"] + params["bias"]


# ------------------------------------------------------------- embedding ----
def embedding_init(key, num, dim, dtype=jnp.float32):
    # torch nn.Embedding default: N(0, 1)
    return {"table": jax.random.normal(key, (num, dim), dtype)}


def embedding_apply(params, idx):
    return jnp.take(params["table"], idx, axis=0)


# ---------------------------------------------------------------- gelu ------
def gelu(x):
    # HF Dinov2 uses exact (erf) GELU
    return jax.nn.gelu(x, approximate=False)


def softplus(x):
    return jax.nn.softplus(x)


# -------------------------------------------------------------- variance ----
def torch_var(x):
    """torch.Tensor.var(): unbiased sample variance over all elements
    (used by the attention-uniformity fallbacks ref:src/model.py:242-257)."""
    n = x.size
    mean = jnp.mean(x)
    return jnp.sum((x - mean) ** 2) / jnp.maximum(n - 1, 1)

"""Explicit RNG threading.

The reference relies on torch's global RNG; notably its *eval-mode* inference
still samples (VAE reparameterization ref:src/model.py:608-610, local-curiosity
perturbation ref:src/model.py:742-744, attention-uniformity noise fallback
ref:src/model.py:256). JAX is functional, so every stochastic site takes an
explicit key. ``NoiseMode`` selects between sampling with a key (mirrors torch
eval) and deterministic zeros (reproducible inference; also used for parity
tests against the reference with torch.randn_like monkeypatched to zeros).
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp


class NoiseMode(str, enum.Enum):
    SAMPLE = "sample"  # draw from N(0, I) with the provided key (torch-eval-like)
    ZEROS = "zeros"  # deterministic: all stochastic draws are 0


def normal_like(key, shape, dtype, mode: NoiseMode):
    if mode == NoiseMode.ZEROS or key is None:
        return jnp.zeros(shape, dtype)
    return jax.random.normal(key, shape, dtype)


def split_tree(key, names):
    """Split a key into a dict of named keys (stable order)."""
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))

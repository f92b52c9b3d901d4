"""Variational-Bayesian curiosity module (VAE uncertainty estimator).

Pure-function re-implementation of ref:src/model.py:521-793. Note eval-mode
semantics of the reference: the reparameterization trick samples even under
`model.eval()` (ref:608-610), and the local-curiosity path perturbs features
under no_grad (ref:741-751). Stochastic draws here take explicit keys, with
NoiseMode.ZEROS available for deterministic inference / parity testing.

The reference's stateful exploration-history circular buffer
(ref:src/model.py:582-584, 760-793) is replaced by the explicit
`ExplorationHistory` host-side tracker (JAX params stay pure).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cognitive_aim_tpu.core.rng import NoiseMode, normal_like
from cognitive_aim_tpu.nn import layers as L


def curiosity_init(
    key, feature_dim: int, hidden_dim: int = 128, enable_hierarchical: bool = True,
    dtype=jnp.float32,
):
    """ref:src/model.py:524-584; latent_dim = feature_dim // 4; torch default
    inits; curiosity_weights initialized to [0.4, 0.3, 0.3]."""
    latent = feature_dim // 4
    ks = jax.random.split(key, 6)
    p = {
        "encoder_mean": L.mlp_init(ks[0], [feature_dim, feature_dim // 2, latent], dtype),
        "encoder_logvar": L.mlp_init(ks[1], [feature_dim, feature_dim // 2, latent], dtype),
        "decoder": L.mlp_init(ks[2], [latent, feature_dim // 2, latent], dtype),
        "uncertainty_head": L.mlp_init(ks[3], [feature_dim, feature_dim // 4, 1], dtype),
    }
    if enable_hierarchical:
        p["geometric_curiosity"] = L.mlp_init(ks[4], [feature_dim + 4, hidden_dim, 1], dtype)
        p["local_curiosity"] = L.mlp_init(ks[5], [feature_dim, hidden_dim // 2, 1], dtype)
        p["curiosity_weights"] = jnp.asarray([0.4, 0.3, 0.3], dtype)
    return p


def curiosity_apply(
    params,
    features,
    exif_data=None,
    *,
    loss_type: str = "robust",
    uncertainty_weight: float = 0.1,
    kl_weight=0.1,  # ref hardcodes 0.1 (ref:646); configs declare a beta
    # schedule (variational_params.beta_schedule) honored by the trainer
    rng=None,
    train=False,
    noise_mode: NoiseMode = NoiseMode.SAMPLE,
):
    """ref:src/model.py:586-688. Returns (curiosity_reward [B],
    uncertainty_score [B], components dict)."""
    mu = L.mlp_apply(params["encoder_mean"], features, dropout_rate=0.1,
                     dropout_after=(0,), rng=rng, train=train)
    logvar = L.mlp_apply(params["encoder_logvar"], features, dropout_rate=0.1,
                         dropout_after=(0,), rng=rng, train=train)

    std = jnp.exp(0.5 * logvar)
    k_eps = k_local = None
    if rng is not None:
        k_eps, k_local = jax.random.split(jax.random.fold_in(rng, 7))
    eps = normal_like(k_eps, std.shape, std.dtype, noise_mode)
    z = mu + eps * std
    recon = L.mlp_apply(params["decoder"], z, dropout_rate=0.1, dropout_after=(0,),
                        rng=rng, train=train)

    target = jax.lax.stop_gradient(features[:, : recon.shape[1]])
    diff = recon - target
    if loss_type == "simple":
        rec_err = jnp.mean(diff**2, axis=1)
    elif loss_type == "robust":
        rec_err = jnp.sqrt(jnp.sum(diff**2, axis=1) + 1e-8)
        rec_err = rec_err / (1.0 + rec_err)
    elif loss_type == "huber":
        ad = jnp.abs(diff)
        delta = 1.0
        hl = jnp.where(ad <= delta, 0.5 * diff**2, delta * ad - 0.5 * delta**2)
        rec_err = jnp.mean(hl, axis=1)
    else:
        raise ValueError(f"Unknown loss_type: {loss_type}")

    kl = -0.5 * jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar), axis=1)
    unc = L.mlp_apply(params["uncertainty_head"], features,
                      final_act=jax.nn.softplus)[:, 0]

    rec_err = jnp.clip(rec_err, 0.0)
    kl = jnp.clip(kl, 0.0)
    unc = jnp.clip(unc, 0.0, 10.0)
    basic = rec_err + kl_weight * kl + uncertainty_weight * unc

    components = {
        "reconstruction_error": rec_err,
        "kl_divergence": kl,
        "uncertainty_estimate": unc,
        "basic_uncertainty": basic,
        "latent_mean": mu,
        "latent_logvar": logvar,
    }

    if "geometric_curiosity" in params:
        geo = _geometric(params, features, exif_data)
        loc = _local(params, features, k_local, noise_mode)
        w = jax.nn.softmax(params["curiosity_weights"])
        reward = w[0] * geo + w[1] * loc + w[2] * basic
        components.update(
            {"geometric_uncertainty": geo, "local_uncertainty": loc, "weights": w}
        )
    else:
        reward = basic

    reward = jnp.clip(reward, 0.0, 100.0)
    uncertainty_score = jnp.clip(basic, 0.0, 100.0)
    return reward, uncertainty_score, components


def _geometric(params, features, exif_data):
    """ref:src/model.py:690-729; exif absent -> constant 0.5."""
    B = features.shape[0]
    if exif_data is None:
        return jnp.full((B,), 0.5, features.dtype)
    zeros = jnp.zeros((B,), features.dtype)
    focal = exif_data.get("focal_length", zeros).reshape(-1)
    aperture = exif_data.get("aperture", zeros).reshape(-1)
    iso = exif_data.get("iso", zeros).reshape(-1)
    ef = jnp.stack(
        [
            jnp.clip(focal / 200.0, 0.0, 1.0),
            jnp.clip(aperture / 32.0, 0.0, 1.0),
            jnp.clip(iso / 6400.0, 0.0, 1.0),
            jnp.ones((B,), features.dtype),
        ],
        axis=1,
    )
    combined = jnp.concatenate([features, ef], axis=1)
    g = L.mlp_apply(params["geometric_curiosity"], combined,
                    final_act=jax.nn.sigmoid)[:, 0]
    return jnp.clip(g, 0.0, 1.0)


def _local(params, features, key, noise_mode: NoiseMode):
    """ref:src/model.py:731-758: perturbation-sensitivity test. The torch
    version computes sensitivity inside no_grad, so it is a constant wrt
    gradients — mirrored with stop_gradient."""
    base = L.mlp_apply(params["local_curiosity"], features,
                       final_act=jax.nn.sigmoid)[:, 0]
    noise = normal_like(key, features.shape, features.dtype, noise_mode) * 0.01
    noisy = L.mlp_apply(params["local_curiosity"], features + noise,
                        final_act=jax.nn.sigmoid)[:, 0]
    sensitivity = jax.lax.stop_gradient(jnp.abs(base - noisy))
    return jnp.clip(base + sensitivity * 0.2, 0.0, 1.0)


# ------------------------------------------------- exploration history ------
@dataclasses.dataclass
class ExplorationHistory:
    """Host-side replacement for the reference's registered circular buffer
    (ref:src/model.py:582-584, 760-793). Same capacity (1000), same pointer
    arithmetic, same statistics (valid = entries > 0)."""

    capacity: int = 1000

    def __post_init__(self):
        self.buffer = np.zeros(self.capacity, np.float32)
        self.pointer = 0

    def update(self, rewards):
        rewards = np.asarray(rewards).reshape(-1)
        for r in rewards:
            self.buffer[self.pointer % self.capacity] = float(r)
            self.pointer = (self.pointer + 1) % self.capacity

    def statistics(self) -> dict:
        valid = self.buffer[self.buffer > 0]
        if valid.size == 0:
            return {"mean": 0.0, "std": 0.0, "max": 0.0, "samples": 0}
        return {
            "mean": float(valid.mean()),
            "std": float(valid.std(ddof=1)) if valid.size > 1 else 0.0,
            "max": float(valid.max()),
            "min": float(valid.min()),
            "samples": int(valid.size),
        }

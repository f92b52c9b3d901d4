"""Training losses (ref:train.py:26-58 and config-declared extras)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scale_invariant_loss(pred, target, lambda_reg: float = 0.5):
    """Eigen-style SILog (ref:train.py:26-45):
    mean(d^2) - lambda * mean(d)^2, d = log(pred+1e-8) - log(target+1e-8).
    Computed over all elements like the reference's `.numel()`."""
    diff = jnp.log(pred + 1e-8) - jnp.log(target + 1e-8)
    n = diff.size
    return jnp.sum(diff**2) / n - lambda_reg * (jnp.sum(diff) ** 2) / (n**2)


def curiosity_loss(curiosity_scores, prediction_error):
    """ref:train.py:48-58: MSE(mean-over-dim1(curiosity), sigmoid(detached
    prediction error)). When curiosity is [B] the mean is a no-op."""
    target = jax.nn.sigmoid(jax.lax.stop_gradient(prediction_error))
    scores = curiosity_scores
    if scores.ndim > 1:
        scores = scores.mean(axis=1)
    return jnp.mean((scores - target) ** 2)


def huber_loss(pred, target, delta: float = 0.5):
    """config-declared loss_type 'huber' (configs/experiment_B.yaml
    training.loss_type/huber_delta)."""
    diff = pred - target
    ad = jnp.abs(diff)
    return jnp.mean(
        jnp.where(ad <= delta, 0.5 * diff**2, delta * ad - 0.5 * delta**2)
    )


def attention_entropy_loss(entropy):
    """Positive attention entropy as loss — encourages concentration
    (ref:src/model.py:286-293; weight from training.attention_entropy_weight)."""
    return entropy


def global_norm_clip(grads, max_norm: float = 1.0):
    """torch clip_grad_norm_ equivalent (ref:train.py:169)."""
    leaves = jax.tree_util.tree_leaves(grads)
    gn = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (gn + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), gn

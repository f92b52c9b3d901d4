"""Precision policy: bf16 compute on the MXU-heavy backbone, f32 params.

The reference runs everything in torch float32. On TPU the MXU natively
consumes bfloat16, so the default policy computes the ViT backbone in bf16
and keeps the small cognitive heads in f32 (the parity gate — AbsRel within
1% of the PyTorch checkpoint — is dominated by the scalar heads, which stay
f32). A strict-f32 policy is available for parity testing.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    backbone_compute_dtype: jnp.dtype = jnp.bfloat16
    head_compute_dtype: jnp.dtype = jnp.float32
    # int8 dense projections in the backbone (kernels/int8_ops.py): 2x MXU
    # throughput on v5e; apply via CognitiveAimModel.prepare_params
    quantize_backbone: bool = False
    # tanh-approx GELU in the backbone (6x VPU speedup, ~3e-4 deviation)
    fast_gelu: bool = True

    def cast_backbone(self, x):
        return x.astype(self.backbone_compute_dtype)

    def cast_head(self, x):
        return x.astype(self.head_compute_dtype)


DEFAULT_POLICY = Policy()
STRICT_F32 = Policy(backbone_compute_dtype=jnp.float32, fast_gelu=False)
BF16_EVERYWHERE = Policy(
    backbone_compute_dtype=jnp.bfloat16, head_compute_dtype=jnp.bfloat16
)
INT8_BACKBONE = Policy(quantize_backbone=True)


def policy_from_name(name: str) -> Policy:
    return {
        "default": DEFAULT_POLICY,
        "bf16": DEFAULT_POLICY,
        "f32": STRICT_F32,
        "strict_f32": STRICT_F32,
        "bf16_all": BF16_EVERYWHERE,
        "int8": INT8_BACKBONE,
    }[name]

"""Parity gate: run the executed reference (torch, monkeypatched random
backbone, zeroed sampling) against this framework with transplanted weights
and report depth/confidence/attention deltas across all 9 instructions.

This is the same machinery as tests/test_model_parity.py exposed as a CLI so
the parity claim can be reproduced in one command:

    python scripts/check_parity.py [--image-size 84] [--policy f32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=84)
    ap.add_argument("--policy", type=str, default="f32")
    ap.add_argument("--layers", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    import numpy as np
    import torch

    from conftest import import_reference_model

    ref = import_reference_model()

    from transformers import Dinov2Config, Dinov2Model

    import jax.numpy as jnp

    from cognitive_aim_tpu.core.precision import policy_from_name
    from cognitive_aim_tpu.core.rng import NoiseMode
    from cognitive_aim_tpu.io import checkpoint_torch as ct
    from cognitive_aim_tpu.models import guidance as G
    from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
    from cognitive_aim_tpu.models.config import resolve_model_config

    S = args.image_size
    torch.manual_seed(0)
    backbone = Dinov2Model(
        Dinov2Config(hidden_size=768, num_hidden_layers=args.layers,
                     num_attention_heads=12, intermediate_size=3072,
                     patch_size=14, image_size=S)
    )
    orig = Dinov2Model.from_pretrained
    Dinov2Model.from_pretrained = classmethod(lambda cls, n, **kw: backbone)
    try:
        raw = {"cognitive_modules": ["ambient_stream", "iterative_focal_stream",
                                     "exif_prior_database"]}
        tm = ref.CognitiveAimModel(raw, camera_info={"num_cameras": 5}).eval()
    finally:
        Dinov2Model.from_pretrained = orig

    arch = resolve_model_config(raw, {"num_cameras": 5})
    jm = CognitiveAimModel(arch, policy=policy_from_name(args.policy))
    sd = tm.state_dict()
    params = jax.tree.map(jnp.asarray, {
        "backbone": ct.convert_backbone(sd, "backbone."),
        "ambient_stream": ct.convert_ambient(sd, "ambient_stream"),
        "focal_stream": ct.convert_iterative_focal(sd, "focal_stream"),
        "exif_prior": ct.convert_exif_prior(sd, "exif_prior"),
        "curiosity_module": ct.convert_curiosity(sd, "curiosity_module"),
        **ct.convert_heads(sd),
        "guided_projection": {"w": np.zeros((768, 64), np.float32),
                              "b": np.zeros(64, np.float32)},
    })

    torch.randn_like_orig = torch.randn_like
    torch.randn_like = lambda t, **kw: torch.zeros_like(t)
    x = torch.randn(1, 3, S, S)
    exif_t = {"camera_idx": torch.zeros(1, dtype=torch.long),
              "focal_length": torch.full((1,), 50.0),
              "aperture": torch.full((1,), 2.8),
              "iso": torch.full((1,), 100.0)}
    exif_j = {k: jnp.asarray(v.numpy()) for k, v in exif_t.items()}
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))

    with torch.no_grad():
        want_d, want_c = tm(x, exif_t)
    out = jm.apply(params, xj, exif_j, noise_mode=NoiseMode.ZEROS)
    dd = abs(float(out.depth[0, 0]) - float(want_d[0, 0]))
    dc = abs(float(out.confidence[0, 0]) - float(want_c[0, 0]))
    rel = dd / (abs(float(want_d[0, 0])) + 1e-9)
    print(f"unguided: |Δdepth|={dd:.2e} (rel {rel:.2e})  |Δconf|={dc:.2e}")
    assert rel < 0.01, "unguided depth outside 1% parity budget"

    print(f"{'instruction':>13s}  max|Δattention|")
    worst = 0.0
    for name in G.INSTRUCTIONS:
        with torch.no_grad():
            _, _, want_a = tm.forward_with_guidance(x, exif_t, name,
                                                    return_attention=True)
        o = jm.apply(params, xj, exif_j, guidance=G.instruction_index(name),
                     noise_mode=NoiseMode.ZEROS)
        da = float(np.abs(np.asarray(o.attention) - want_a.numpy()).max())
        worst = max(worst, da)
        print(f"{name:>13s}  {da:.2e}")
    assert worst < 1e-4, "guided attention mismatch"
    print(f"\nPARITY OK: depth within 1 percent, attention maps match across "
          f"all 9 instructions (policy={args.policy})")


if __name__ == "__main__":
    main()

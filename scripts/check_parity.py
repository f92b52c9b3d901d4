"""Parity gate: run the executed reference (torch, monkeypatched random
backbone, zeroed sampling) against this framework with transplanted weights
and report depth/confidence/attention deltas across all 9 instructions.

This is the same machinery as tests/test_model_parity.py exposed as a CLI so
the parity claim can be reproduced in one command:

    python scripts/check_parity.py [--image-size 84] [--policy f32]

Golden run against the real checkpoint (ref:checkpoints/README.md:7 names a
568 MB cognitive_aim_model.pth — not retrievable in this zero-egress
environment; this is the one command to run the moment it is obtainable):

    python scripts/check_parity.py --checkpoint cognitive_aim_model.pth \
        [--config configs/experiment_B.yaml] [--image photo.jpg]

Loads the .pth into BOTH the executed torch reference and this framework
(via the converter's shape-filter/skip semantics) and prints per-instruction
depth AbsRel deltas + attention deltas.
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
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="real .pth checkpoint for the golden run")
    ap.add_argument("--config", type=str, default="configs/experiment_B.yaml",
                    help="model config used with --checkpoint")
    ap.add_argument("--image", type=str, default=None,
                    help="real image for --checkpoint mode (default synthetic)")
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

    if args.checkpoint:
        # golden run: real checkpoint into both implementations
        import yaml

        with open(args.config) as f:
            raw = yaml.safe_load(f)
        container = torch.load(args.checkpoint, map_location="cpu",
                               weights_only=False)
        sd_real = None
        for key in ("model_state_dict", "main_model"):  # ref:demo.py:97-106
            if isinstance(container, dict) and key in container:
                sd_real = container[key]
                break
        if sd_real is None:
            sd_real = container
        cam_w = sd_real.get("exif_prior.camera_embedding.weight")
        num_cameras = int(cam_w.shape[0]) if cam_w is not None else 71
        S = int(raw.get("dataset", {}).get("image_size", 224))
        layers = 12
        torch.manual_seed(0)
        backbone = Dinov2Model(
            Dinov2Config(hidden_size=768, num_hidden_layers=layers,
                         num_attention_heads=12, intermediate_size=3072,
                         patch_size=14, image_size=518)
        )
        orig = Dinov2Model.from_pretrained
        Dinov2Model.from_pretrained = classmethod(lambda cls, n, **kw: backbone)
        try:
            tm = ref.CognitiveAimModel(
                raw, camera_info={"num_cameras": num_cameras}
            ).eval()
        finally:
            Dinov2Model.from_pretrained = orig
        # the reference loads non-strictly with shape filtering
        # (ref:demo.py:108-146); mirror it for the torch side
        live = tm.state_dict()
        filtered = {k: v for k, v in sd_real.items()
                    if k in live and live[k].shape == v.shape}
        missing = [k for k in live if k not in filtered]
        tm.load_state_dict(filtered, strict=False)
        print(f"golden: loaded {len(filtered)}/{len(live)} tensors "
              f"({len(missing)} left at init)")
        sd = tm.state_dict()  # post-load — both sides see identical weights
        arch = resolve_model_config(raw, {"num_cameras": num_cameras})
    else:
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
            raw = {"cognitive_modules": ["ambient_stream",
                                         "iterative_focal_stream",
                                         "exif_prior_database"]}
            tm = ref.CognitiveAimModel(raw, camera_info={"num_cameras": 5}).eval()
        finally:
            Dinov2Model.from_pretrained = orig
        arch = resolve_model_config(raw, {"num_cameras": 5})
        sd = tm.state_dict()

    jm = CognitiveAimModel(arch, policy=policy_from_name(args.policy))
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
    if args.image:
        from cognitive_aim_tpu.io.preprocess import preprocess_paths

        xn = preprocess_paths([args.image], S)  # [1, H, W, 3] normalized
        x = torch.from_numpy(np.asarray(xn).transpose(0, 3, 1, 2))
    else:
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

    iterative = arch.use_iterative
    note = (" (ref guided depth flows through a FRESH RANDOM Linear per call"
            " with IterativeFocalStream, ref:src/model.py:1419-1422 — its"
            " AbsRel is vs one sample of that randomness)" if iterative else "")
    print(f"{'instruction':>13s}  max|Δattention|  depth AbsRel{note}")
    worst = 0.0
    for name in G.INSTRUCTIONS:
        with torch.no_grad():
            gd, _, want_a = tm.forward_with_guidance(x, exif_t, name,
                                                     return_attention=True)
        o = jm.apply(params, xj, exif_j, guidance=G.instruction_index(name),
                     noise_mode=NoiseMode.ZEROS)
        da = float(np.abs(np.asarray(o.attention) - want_a.numpy()).max())
        absrel = abs(float(o.depth[0, 0]) - float(gd[0, 0])) / (
            abs(float(gd[0, 0])) + 1e-9)
        worst = max(worst, da)
        print(f"{name:>13s}  {da:.2e}         {absrel:.4f}")
    assert worst < 1e-4, "guided attention mismatch"
    print(f"\nPARITY OK: unguided depth within 1 percent, attention maps "
          f"match across all 9 instructions (policy={args.policy})")


if __name__ == "__main__":
    main()

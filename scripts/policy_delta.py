"""Quantify the fast-path accuracy cost: int8 + tanh-GELU + Pallas attention
vs the f32 reference path of THIS framework, per guidance instruction.

The north-star parity gate (BASELINE.json) is AbsRel vs the PyTorch
checkpoint; the real .pth is not retrievable here (zero egress), so this
script answers the adjacent question the fast path raises: how much do the
serving optimizations (dynamic int8 dense, tanh GELU, fused Pallas kernels)
move the outputs relative to the framework's own f32 path, on a synthetic
validation set at the full 518^2 serving shape. AbsRel(int8 depth, f32
depth) per instruction is directly comparable to the 1% parity budget.

    python scripts/policy_delta.py [--n 64] [--image-size 518] [--batch 8]

Runs on whatever backend JAX selects (the TPU under axon; CPU works but is
slow at 518^2 — use --image-size 224 --layers 2 there).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synth_images(n, size, seed=0):
    """Structured scenes (gradients, blobs, occluders), not white noise —
    exercises non-uniform attention and depth-ish statistics."""
    import numpy as np

    rng = np.random.RandomState(seed)
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32) / size
    imgs = np.empty((n, size, size, 3), np.float32)
    for i in range(n):
        base = (
            rng.rand() * ys + rng.rand() * xs
            + 0.3 * np.sin(2 * np.pi * (rng.rand() * 3 + 1) * xs + rng.rand())
        )
        img = np.stack([base * rng.rand(), base * rng.rand(), base * rng.rand()], -1)
        for _ in range(rng.randint(2, 6)):  # elliptical "objects"
            cy, cx = rng.rand(2) * size
            ry, rx = (0.05 + 0.2 * rng.rand(2)) * size
            mask = (((np.arange(size)[:, None] - cy) / ry) ** 2
                    + ((np.arange(size)[None, :] - cx) / rx) ** 2) < 1.0
            img[mask] = rng.rand(3)
        lo, hi = img.min(), img.max()
        imgs[i] = (img - lo) / (hi - lo + 1e-9)
    return imgs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--image-size", type=int, default=518)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--layers", type=int, default=0,
                    help="override backbone depth (0 = full ViT-B)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="optional .npz/.pth loaded into every engine — use "
                         "scripts/train_synth_ckpt.py output to measure the "
                         "deltas on TRAINED weights instead of random init")
    ap.add_argument("--token-filter", type=str, default="",
                    help="LAYER:KEEP or progressive 'L1:K1,L2:K2,...' — "
                         "also measure the int8 + token-filter "
                         "fast path (nn/dinov2.py) vs f32. NOTE: random-init "
                         "weights give near-uniform CLS attention, so the "
                         "measured delta is a PESSIMISTIC bound relative to "
                         "trained weights (whose CLS attention concentrates "
                         "on depth-relevant structure).")
    args = ap.parse_args()

    import numpy as np
    import yaml

    import jax
    import jax.numpy as jnp

    from cognitive_aim_tpu.api import CognitiveAimInference
    from cognitive_aim_tpu.io.preprocess import IMAGENET_MEAN, IMAGENET_STD
    from cognitive_aim_tpu.models import guidance as G

    cfg = {
        "cognitive_modules": ["ambient_stream", "iterative_focal_stream",
                              "exif_prior_database"],
        "dataset": {"image_size": args.image_size},
        "exif_config": {"num_cameras": 71},
        "focal_config": {"num_iterations": 6},
    }
    cfg_path = "/tmp/policy_delta_cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    vit = None
    if args.layers:
        from cognitive_aim_tpu.nn.dinov2 import BASE
        import dataclasses

        vit = dataclasses.replace(BASE, num_layers=args.layers)

    engines = {
        "f32": CognitiveAimInference(
            cfg_path, args.checkpoint, policy="f32", attn_impl="xla",
            noise_mode="zeros", save_images=False, seed=args.seed, vit_cfg=vit,
        ),
    }
    # share the float weights so only the numeric path differs
    engines["int8"] = CognitiveAimInference(
        cfg_path, args.checkpoint, policy="int8", attn_impl="pallas_packed",
        noise_mode="zeros", save_images=False, seed=args.seed, vit_cfg=vit,
    )
    if args.token_filter:
        engines["int8+tf"] = CognitiveAimInference(
            cfg_path, args.checkpoint, policy="int8",
            attn_impl="pallas_packed", noise_mode="zeros", save_images=False,
            seed=args.seed, vit_cfg=vit, token_filter=args.token_filter,
        )

    imgs = synth_images(args.n, args.image_size, args.seed)
    norm = ((imgs - np.asarray(IMAGENET_MEAN, np.float32))
            / np.asarray(IMAGENET_STD, np.float32)).astype(np.float32)
    # NORMALIZED exif (model contract: io/exif.py divides raw by 200/22/
    # 6400); also the constants train_synth_ckpt trains --checkpoint
    # weights with, so the δ is measured on the trained manifold
    exif = {
        "camera_idx": np.zeros(args.batch, np.int32),
        "focal_length": np.full(args.batch, 0.25, np.float32),
        "aperture": np.full(args.batch, 0.127, np.float32),
        "iso": np.full(args.batch, 0.016, np.float32),
    }
    exif_j = {k: jnp.asarray(v) for k, v in exif.items()}
    key = jax.random.PRNGKey(0)

    preds = {name: {g: [] for g in G.INSTRUCTIONS} for name in engines}
    confs = {name: {g: [] for g in G.INSTRUCTIONS} for name in engines}
    for gi, gname in enumerate(G.INSTRUCTIONS):
        for name, eng in engines.items():
            fwd = eng._guided
            for s in range(0, args.n, args.batch):
                xb = jnp.asarray(norm[s : s + args.batch])
                out = fwd(eng.params, xb,
                          exif_j, jnp.full((xb.shape[0],), gi, jnp.int32), key)
                preds[name][gname].append(np.asarray(out.depth[:, 0], np.float64))
                confs[name][gname].append(np.asarray(out.confidence[:, 0], np.float64))

    for name in engines:
        if name == "f32":
            continue
        print(f"\n{name} fast path vs f32, n={args.n} @ {args.image_size}^2 "
              f"(per-instruction AbsRel of depth, |dconf|):")
        worst = 0.0
        for gname in G.INSTRUCTIONS:
            a = np.concatenate(preds["f32"][gname])
            b = np.concatenate(preds[name][gname])
            ca = np.concatenate(confs["f32"][gname])
            cb = np.concatenate(confs[name][gname])
            absrel = float(np.mean(np.abs(b - a) / np.maximum(np.abs(a), 1e-6)))
            dconf = float(np.mean(np.abs(cb - ca)))
            worst = max(worst, absrel)
            print(f"  {gname:>13s}: AbsRel={absrel:.5f}  |dconf|={dconf:.5f}")
        print(f"  worst-instruction AbsRel delta: {worst:.5f} "
              f"({'within' if worst < 0.01 else 'EXCEEDS'} the 1% parity budget)")


if __name__ == "__main__":
    main()

"""Train the full model (backbone unfrozen) on synthetic structured scenes
with a deterministic depth law, and save an engine-format .npz checkpoint.

Purpose: give `scripts/policy_delta.py --checkpoint` a set of TRAINED
weights so the token-filter delta is measured against CLS attention that
actually concentrates on scene structure (random init is near-uniform — a
pessimistic bound; the real DINOv2 .pth is unreachable in this zero-egress
environment, ref:/root/reference/checkpoints/README.md:7).

Depth law (learnable from pixels alone): d = 0.5 + 2*mean_luma(center 1/3
crop) + 0.5*vertical_gradient. The model must attend the center region and
the global tilt to fit it — structure a token filter should preserve.

    python scripts/train_synth_ckpt.py --out /tmp/synth_ft.npz \
        [--steps 400] [--batch 32] [--image-size 224] [--lr 1e-4]

Runs on the TPU; ~5 min at the defaults (device-staged batches, no
per-step H2D).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from policy_delta import synth_images  # noqa: E402


def depth_law(imgs_01: np.ndarray) -> np.ndarray:
    """[N, S, S, 3] in [0,1] -> scalar depth per image (center-dominant)."""
    s = imgs_01.shape[1]
    lo, hi = s // 3, 2 * s // 3
    luma = imgs_01.mean(-1)
    center = luma[:, lo:hi, lo:hi].mean((1, 2))
    tilt = luma[:, hi:, :].mean((1, 2)) - luma[:, :lo, :].mean((1, 2))
    return (0.5 + 2.0 * center + 0.5 * tilt).astype(np.float32)


def depth_law_ring(imgs_01: np.ndarray) -> np.ndarray:
    """Depth signal lives OFF-center (border ring + horizontal gradient) —
    adversarial to any center-biased token selection, so the filter must
    keep peripheral tokens to fit it."""
    s = imgs_01.shape[1]
    lo, hi = s // 3, 2 * s // 3
    luma = imgs_01.mean(-1)
    total = luma.sum((1, 2))
    center = luma[:, lo:hi, lo:hi].sum((1, 2))
    ring = (total - center) / (s * s - (hi - lo) ** 2)
    hgrad = luma[:, :, hi:].mean((1, 2)) - luma[:, :, :lo].mean((1, 2))
    return (0.5 + 2.0 * ring + 0.5 * hgrad).astype(np.float32)


LAWS = {"center": depth_law, "ring": depth_law_ring}


def stage_batches(tr, norm, depths, batch, n_stage_max=12):
    """Pre-stage device batches (no per-step H2D through the relay)."""
    import numpy as np

    n = norm.shape[0]
    staged = []
    for i in range(max(1, min(n // batch, n_stage_max))):
        sl = slice(i * batch, (i + 1) * batch)
        staged.append(tr._device_batch({
            "images": norm[sl],
            "depths": depths[sl],
            "exif": {
                "camera_idx": np.zeros(batch, np.int32),
                "focal_length": np.full(batch, 0.25, np.float32),
                "aperture": np.full(batch, 0.127, np.float32),
                "iso": np.full(batch, 0.016, np.float32),
            },
        }))
    return staged


def run_training(tr, staged, steps, log_every=50):
    """Drive the trainer's compiled step over the staged batches; returns
    the trained params (device tree). Reusable across checkpoints in one
    process — the step stays compiled when only params change."""
    import jax
    import jax.numpy as jnp

    p, o = tr.params, tr.opt_state
    cur_on = jnp.asarray(True)
    kl_w = jnp.asarray(0.1, jnp.float32)
    first = last = None
    t0 = time.perf_counter()
    alt_fn = getattr(tr, "_alt_step_fn", None)
    for step in range(steps):
        key = jax.random.PRNGKey(step)
        # honor the trainer's alternating-variant schedule (sandwich
        # filter-on/filter-off training) — this loop drives the compiled
        # steps directly, so it must replicate Trainer.train_step's choice
        fn = alt_fn if (alt_fn is not None and step % 2 == 1) else tr._step_fn
        p, o, lg = fn(p, o, staged[step % len(staged)], key, cur_on, kl_w)
        if step == 0 or step == steps - 1 or step % log_every == 0:
            loss = float(lg["loss"])
            if first is None:
                first = loss
            last = loss
            print(f"step {step}: loss={loss:.4f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    print(f"loss {first:.4f} -> {last:.4f} "
          f"({'DECREASED' if last < first else 'did NOT decrease'})")
    return p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="/tmp/synth_ft.npz")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--n-images", type=int, default=512)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--law", type=str, default="center", choices=sorted(LAWS))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cognitive_aim_tpu.api import flatten_tree
    from cognitive_aim_tpu.io.preprocess import IMAGENET_MEAN, IMAGENET_STD
    from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
    from cognitive_aim_tpu.models.config import ModelArchConfig
    from cognitive_aim_tpu.train.trainer import TrainConfig, Trainer

    # must match the arch policy_delta.py resolves from its config (module
    # set, num_iterations=6, num_cameras=71) so the checkpoint merges clean
    arch = ModelArchConfig(
        num_iterations=6, image_size=args.image_size,
        freeze_backbone=False, use_lora=False,
    )
    model = CognitiveAimModel(arch, attn_impl="pallas_packed")
    params = model.init(jax.random.PRNGKey(args.seed))
    cfg = TrainConfig(
        epochs=1, batch_size=args.batch, steps_per_epoch=args.steps,
        learning_rate=args.lr, freeze_backbone=False,
    )
    tr = Trainer(model, params, cfg, output_dir="/tmp/train_synth_out")

    imgs01 = synth_images(args.n_images, args.image_size, args.seed)
    depths = LAWS[args.law](imgs01)
    norm = ((imgs01 - np.asarray(IMAGENET_MEAN, np.float32))
            / np.asarray(IMAGENET_STD, np.float32)).astype(np.float32)

    staged = stage_batches(tr, norm, depths, args.batch)
    p = run_training(tr, staged, args.steps)

    flat = flatten_tree(jax.device_get(p))
    np.savez(args.out, **flat)
    print(f"wrote {args.out} ({len(flat)} tensors)")


if __name__ == "__main__":
    main()

"""Per-layer CLS-attention concentration statistics for a checkpoint.

The token filter ranks patch tokens by the next layer's CLS-attention row
(nn/dinov2.py:_cls_importance). Its parity therefore depends on HOW
CONCENTRATED that distribution is: near-uniform attention (random init,
or 400-step memorizing cells) makes the kept set quasi-arbitrary — the
measured pessimistic regime — while attention that concentrates on scene
structure keeps what matters. This script MEASURES the regime instead of
asserting it (round-3 verdict item): for each layer l it computes, over a
batch of eval images, the CLS attention distribution that layer's q/k
would produce on its input stream, renormalized over patch columns, and
reports

  * normalized entropy  H/ln(P)  (1.0 = uniform, 0 = one-hot)
  * top-k mass for k = 1%, 5%, 10% of P (what fraction of attention the
    best 14/68/137 tokens at 518² capture — directly: how much of the
    ranking signal survives a keep-rate-k filter)
  * participation ratio (exp(H)/P — effective fraction of tokens used)

    python scripts/attention_stats.py --checkpoint a.npz [b.npz ...] \
        [--image-size 518] [--n 16] [--eval-source proc|synth] \
        [--out /tmp/attn_stats.json]

Pass several checkpoints to get a comparison table (random init is always
included as the first row). Used for docs/PERF.md's attention-regime
section: random vs 400-step memorizing cells vs the long procedural
pretrain (scripts/pretrain_procedural.py).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build_stats_fn(cfg):
    """jit((params_f32, images_norm) -> [L, 5] per-layer
    [entropy_norm, top1%, top5%, top10%, participation])."""
    import jax
    import jax.numpy as jnp

    from cognitive_aim_tpu.nn import dinov2 as D

    P = None  # resolved at trace time

    def stats(params, images):
        x = D._embed(params, images, cfg, jnp.float32)
        n_patches = x.shape[1] - 1
        ks = [max(1, round(n_patches * f)) for f in (0.01, 0.05, 0.10)]
        rows = []
        for i in range(cfg.num_layers):
            lp = jax.tree.map(lambda a: a[i], params["layers"])
            imp = D._cls_importance(lp, x, cfg)  # [B, P], sums to <1
            p = imp / imp.sum(axis=1, keepdims=True)
            ent = -(p * jnp.log(p + 1e-12)).sum(axis=1)  # [B] nats
            ent_norm = ent / np.log(n_patches)
            srt = jnp.sort(p, axis=1)[:, ::-1]
            masses = [srt[:, :k].sum(axis=1) for k in ks]
            part = jnp.exp(ent) / n_patches
            rows.append(jnp.stack(
                [ent_norm.mean(), *[m.mean() for m in masses],
                 part.mean()]))
            x = D._block(lp, x, cfg, "xla")
        return jnp.stack(rows)  # [L, 5]

    return jax.jit(stats)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", type=str, nargs="*", default=[])
    ap.add_argument("--image-size", type=int, default=518)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--eval-source", type=str, default="proc",
                    choices=["proc", "synth"],
                    help="proc = procedural scenes (the concentrated-regime "
                         "task); synth = the certification grid's eval "
                         "images (policy_delta.synth_images)")
    ap.add_argument("--seed", type=int, default=90001)
    ap.add_argument("--layers", type=int, default=0)
    ap.add_argument("--out", type=str, default="/tmp/attn_stats.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cognitive_aim_tpu.api import unflatten_npz
    from cognitive_aim_tpu.io.preprocess import IMAGENET_MEAN, IMAGENET_STD
    from cognitive_aim_tpu.nn.dinov2 import BASE

    cfg = BASE
    if args.layers:
        import dataclasses

        cfg = dataclasses.replace(BASE, num_layers=args.layers)

    if args.eval_source == "proc":
        from procedural_scenes import gen_procedural

        imgs01, _ = gen_procedural(args.n, args.image_size, args.seed)
    else:
        from policy_delta import synth_images

        imgs01 = synth_images(args.n, args.image_size, args.seed)
    norm = ((imgs01 - np.asarray(IMAGENET_MEAN, np.float32))
            / np.asarray(IMAGENET_STD, np.float32)).astype(np.float32)
    batches = [jnp.asarray(norm[s:s + args.batch])
               for s in range(0, args.n, args.batch)]

    stats_fn = build_stats_fn(cfg)

    def run(backbone_params):
        per = [np.asarray(stats_fn(backbone_params, xb)) for xb in batches]
        return np.mean(per, axis=0)  # [L, 5]

    def backbone_of(tree):
        # model param tree nests the backbone under 'backbone'
        return tree["backbone"] if "backbone" in tree else tree

    results = {}
    # random init always included: the measured pessimistic bound
    from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
    from cognitive_aim_tpu.models.config import ModelArchConfig

    model = CognitiveAimModel(
        ModelArchConfig(num_iterations=6, image_size=args.image_size,
                        freeze_backbone=False, use_lora=False),
        vit_cfg=cfg if args.layers else None)
    rnd = jax.device_put(model.init(jax.random.PRNGKey(0)))
    results["random_init"] = run(backbone_of(rnd)).tolist()
    del rnd

    for path in args.checkpoint:
        tree = jax.device_put(unflatten_npz(np.load(path)))
        name = os.path.basename(path)
        results[name] = run(backbone_of(tree)).tolist()
        del tree

    cols = "ent/lnP top1% top5% top10% partic"
    print(f"\nCLS-attention concentration @{args.image_size}² "
          f"({args.eval_source} eval images, n={args.n})")
    for name, rows in results.items():
        rows = np.asarray(rows)
        print(f"\n== {name} ==  (per-layer; layer 2 is the shipping "
              f"filter's ranking layer)")
        print(f"   layer  {cols}")
        for i, r in enumerate(rows):
            mark = " <- 2:0.25 ranks here" if i == 2 else ""
            print(f"   {i:>5d}  {r[0]:.3f}  {r[1]:.3f} {r[2]:.3f} "
                  f"{r[3]:.3f}  {r[4]:.3f}{mark}")
        print(f"   mean   {rows[:, 0].mean():.3f}  {rows[:, 1].mean():.3f} "
              f"{rows[:, 2].mean():.3f} {rows[:, 3].mean():.3f}  "
              f"{rows[:, 4].mean():.3f}")

    with open(args.out, "w") as f:
        json.dump({"image_size": args.image_size, "n": args.n,
                   "eval_source": args.eval_source,
                   "columns": cols.split(), "per_layer": results}, f,
                  indent=1)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()

"""Evaluation / ablation-sweep CLI.

Runs the full validation metric suite (rmse, mae, abs_rel, sq_rel, log10,
delta1/2/3, threshold_acc — the vocabulary configs declare but the reference
never wires, ref:src/utils.py:74-133, configs/*.yaml validation.metrics) over
a validation set for one config or the whole eval_configs/ ablation sweep
(BASELINE.json configs list). The ablation toggles (enable_ambient_stream
etc.) are functional here (models/config.py honor_ablation_toggles).

Usage:
  python evaluate.py --config eval_configs/full_cognitive_config.yaml \
      --data_dir dataset [--checkpoint ckpt.pth]
  python evaluate.py --sweep eval_configs/ --data_dir dataset
"""

import argparse
import json
import os
from pathlib import Path

import numpy as np
import yaml


def evaluate_config(config_path, data_dir, checkpoint, batch_size, lookup,
                    instructions=(None,), vit_cfg=None):
    """Evaluate one config under each instruction in `instructions` (None =
    unguided). One engine and ONE compiled graph serve the whole sweep: the
    guidance index is a traced argument, and tail batches are padded so every
    step hits the same jitted forward (the reference re-runs its Python mask
    loops per call, ref:src/model.py:1268-1379)."""
    import jax
    import jax.numpy as jnp

    from cognitive_aim_tpu.api import CognitiveAimInference
    from cognitive_aim_tpu.io.dataset import DepthDataset, DataLoader
    from cognitive_aim_tpu.train.metrics import calculate_depth_metrics
    from cognitive_aim_tpu.train.trainer import scalar_depth_target

    engine = CognitiveAimInference(
        config_path, checkpoint, lookup=lookup, save_images=False,
        noise_mode="zeros", vit_cfg=vit_cfg,
    )
    with open(config_path) as f:
        raw = yaml.safe_load(f)
    size = engine.image_size
    ds = DepthDataset(data_dir, "val", (size, size),
                      use_exif=engine.arch.use_exif, augment=False)
    if len(ds) == 0:
        return {i: {"error": f"no val data in {data_dir}", "n": 0}
                for i in instructions}
    wanted = raw.get("validation", {}).get("metrics")
    key = jax.random.PRNGKey(0)
    results = {}
    for instruction in instructions:
        guidance = None
        if instruction is not None:
            from cognitive_aim_tpu.models import guidance as G

            guidance = G.instruction_index(instruction)
        preds, targets, confs = [], [], []
        for batch in DataLoader(ds, batch_size):
            n = batch["images"].shape[0]
            pad = batch_size - n

            def _pad(a):
                return (np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
                        if pad else a)

            images = jnp.asarray(_pad(batch["images"]))
            exif = None
            if "exif" in batch:
                exif = {k: jnp.asarray(_pad(np.asarray(v)))
                        for k, v in batch["exif"].items()}
            if guidance is None:
                out = engine._unguided(engine.params, images, exif, key)
            else:
                gidx = jnp.full((images.shape[0],), guidance, jnp.int32)
                out = engine._guided(engine.params, images, exif, gidx, key)
            preds.append(np.asarray(out.depth[:n, 0]))
            confs.append(np.asarray(out.confidence[:n, 0]))
            targets.append(
                np.asarray(scalar_depth_target(jnp.asarray(batch["depths"])))
            )
        metrics = calculate_depth_metrics(
            np.concatenate(preds), np.concatenate(targets)
        )
        metrics["mean_confidence"] = float(np.concatenate(confs).mean())
        metrics["n"] = int(sum(p.size for p in preds))
        if wanted:
            metrics = {k: v for k, v in metrics.items()
                       if k in wanted or k in ("n", "mean_confidence")}
        results[instruction] = metrics
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str)
    ap.add_argument("--sweep", type=str, help="directory of eval configs")
    ap.add_argument("--data_dir", type=str, required=True)
    ap.add_argument("--checkpoint", type=str, default=None)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--lookup", type=str, default="reference",
                    choices=["reference", "nested"])
    ap.add_argument("--instruction", type=str, default=None,
                    help="evaluate under one guidance instruction, or "
                         "'all' for the per-instruction sweep")
    ap.add_argument("--output", type=str, default="eval_results.json")
    args = ap.parse_args()

    if not args.config and not args.sweep:
        raise SystemExit("need --config or --sweep")

    results = {}
    configs = (
        sorted(str(p) for p in Path(args.sweep).glob("*.yaml"))
        if args.sweep
        else [args.config]
    )
    for cfg in configs:
        name = os.path.basename(cfg)
        print(f"=== {name} ===")
        instructions = [args.instruction]
        if args.instruction == "all":
            from cognitive_aim_tpu.models.guidance import INSTRUCTIONS

            instructions = list(INSTRUCTIONS)
        try:
            per_instr = evaluate_config(cfg, args.data_dir, args.checkpoint,
                                        args.batch_size, args.lookup,
                                        tuple(instructions))
        except Exception as e:
            per_instr = {i: {"error": f"{type(e).__name__}: {e}"}
                         for i in instructions}
        for instr, m in per_instr.items():
            key = name if instr is None else f"{name}[{instr}]"
            results[key] = m
            print(f"  -- {instr or 'unguided'}")
            for k, v in m.items():
                print(f"     {k}: {v}")

    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\nResults written to {args.output}")


if __name__ == "__main__":
    main()

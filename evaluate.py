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
                    instruction=None):
    import jax
    import jax.numpy as jnp

    from cognitive_aim_tpu.api import CognitiveAimInference
    from cognitive_aim_tpu.io.dataset import DepthDataset, DataLoader
    from cognitive_aim_tpu.train.metrics import calculate_depth_metrics
    from cognitive_aim_tpu.train.trainer import scalar_depth_target

    engine = CognitiveAimInference(
        config_path, checkpoint, lookup=lookup, save_images=False,
        noise_mode="zeros",
    )
    with open(config_path) as f:
        raw = yaml.safe_load(f)
    size = engine.image_size
    ds = DepthDataset(data_dir, "val", (size, size),
                      use_exif=engine.arch.use_exif, augment=False)
    if len(ds) == 0:
        return {"error": f"no val data in {data_dir}", "n": 0}
    loader = DataLoader(ds, batch_size)
    preds, targets, confs = [], [], []
    for batch in loader:
        exif = None
        if "exif" in batch:
            exif = {k: jnp.asarray(v) for k, v in batch["exif"].items()}
        guidance = None
        if instruction is not None:
            from cognitive_aim_tpu.models import guidance as G

            guidance = G.instruction_index(instruction)
        out = engine.model.apply(
            engine.params, jnp.asarray(batch["images"]), exif,
            guidance=guidance, rng=jax.random.PRNGKey(0),
        )
        preds.append(np.asarray(out.depth[:, 0]))
        confs.append(np.asarray(out.confidence[:, 0]))
        targets.append(np.asarray(scalar_depth_target(jnp.asarray(batch["depths"]))))
    metrics = calculate_depth_metrics(np.concatenate(preds), np.concatenate(targets))
    metrics["mean_confidence"] = float(np.concatenate(confs).mean())
    metrics["n"] = int(sum(p.size for p in preds))
    wanted = raw.get("validation", {}).get("metrics")
    if wanted:
        metrics = {k: v for k, v in metrics.items()
                   if k in wanted or k in ("n", "mean_confidence")}
    return metrics


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
        for instr in instructions:
            key = name if instr in (None, "all") else f"{name}[{instr}]"
            try:
                m = evaluate_config(cfg, args.data_dir, args.checkpoint,
                                    args.batch_size, args.lookup, instr)
            except Exception as e:
                m = {"error": f"{type(e).__name__}: {e}"}
            results[key] = m
            print(f"  -- {instr or 'unguided'}")
            for k, v in m.items():
                print(f"     {k}: {v}")

    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\nResults written to {args.output}")


if __name__ == "__main__":
    main()

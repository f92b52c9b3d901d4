"""Training CLI for the cognitive-aim TPU framework.

Flag-compatible with the reference train.py (ref:train.py:296-340):
  --config --data_dir --output_dir --resume
plus TPU extras: --tensor-parallel, --policy, --attn, --lookup, --epochs.

Accepts the shipped YAML configs verbatim (configs/experiment_B.yaml and
eval_configs/*) — the config-key crashes of the reference trainer are
resolved in TrainConfig.from_raw (SURVEY.md §2.4).
"""

import argparse
import os
import random

import numpy as np
import yaml


def main():
    parser = argparse.ArgumentParser(description="Cognitive-Aim TPU Training")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="./outputs")
    parser.add_argument("--resume", type=str, help="checkpoint to resume from")
    parser.add_argument("--epochs", type=int, default=None, help="override epochs")
    parser.add_argument("--batch_size", type=int, default=None, help="override batch size")
    parser.add_argument("--tensor-parallel", action="store_true")
    parser.add_argument("--policy", type=str, default="default")
    parser.add_argument("--attn", type=str, default="pallas_packed", choices=["xla", "pallas", "pallas_packed"])
    parser.add_argument("--lookup", type=str, default="nested",
                        choices=["reference", "nested"],
                        help="config lookup semantics; training defaults to "
                             "'nested' (the YAML authors' intent)")
    args = parser.parse_args()

    with open(args.config, "r", encoding="utf-8") as f:
        config = yaml.safe_load(f)

    # determinism block (ref:train.py:309-317)
    seed = 42
    if "reproduction" in config and config["reproduction"].get("deterministic"):
        seed = int(config["reproduction"].get("seed", 42))
    random.seed(seed)
    np.random.seed(seed)

    import jax

    from cognitive_aim_tpu.core.precision import policy_from_name
    from cognitive_aim_tpu.io.dataset import create_dataloaders
    from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
    from cognitive_aim_tpu.models.config import resolve_model_config
    from cognitive_aim_tpu.train.trainer import TrainConfig, Trainer
    from cognitive_aim_tpu.utils.logging import (
        setup_experiment_directory,
        setup_logging,
    )

    # checkpoints/logs/predictions/tensorboard subdirs + config.yaml snapshot
    # (ref:src/utils.py:276-288)
    setup_experiment_directory(args.output_dir, config)
    logger = setup_logging(args.output_dir)
    writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(os.path.join(args.output_dir, "tensorboard"))
    except Exception:
        logger.warning("tensorboard unavailable; scalar logging disabled")

    arch = resolve_model_config(config, lookup=args.lookup)
    model = CognitiveAimModel(
        arch, policy=policy_from_name(args.policy), attn_impl=args.attn
    )
    params = model.init(jax.random.PRNGKey(seed))

    train_loader, val_loader = create_dataloaders(
        args.data_dir, config, batch_size=args.batch_size, seed=seed
    )
    if len(train_loader.dataset) == 0:
        raise SystemExit(
            f"No training data found under {args.data_dir} "
            "(need train_annotations.json or images/ + depths/)"
        )

    tcfg = TrainConfig.from_raw(config, steps_per_epoch=max(1, len(train_loader)))
    tcfg.tensor_parallel = args.tensor_parallel
    tcfg.seed = seed
    tcfg.freeze_backbone = arch.freeze_backbone
    if args.epochs is not None:
        tcfg.epochs = args.epochs
    if args.batch_size is not None:
        tcfg.batch_size = args.batch_size

    from cognitive_aim_tpu.utils.logging import count_parameters, get_model_size_mb

    total, _ = count_parameters(params)
    logger.info(f"Model: {total:,} parameters, {get_model_size_mb(params):.1f} MB "
                f"(backbone {'frozen' if arch.freeze_backbone else 'trainable'}, "
                f"lora={'on' if arch.use_lora else 'off'})")
    # training summary report (ref:src/utils.py:209-249, real schema)
    with open(os.path.join(args.output_dir, "training_summary.md"), "w") as f:
        f.write(
            f"# Training Summary\n\n"
            f"- Backbone: dinov2-{arch.backbone_size} "
            f"({'frozen' if arch.freeze_backbone else 'trainable'}, "
            f"LoRA {'on' if arch.use_lora else 'off'})\n"
            f"- Cognitive modules: ambient={arch.use_ambient} "
            f"focal={arch.use_focal}(iter={arch.num_iterations}) "
            f"exif={arch.use_exif} curiosity={arch.use_curiosity}\n"
            f"- Parameters: {total:,} ({get_model_size_mb(params):.1f} MB)\n"
            f"- Epochs: {tcfg.epochs}, batch {tcfg.batch_size} "
            f"(accum {tcfg.accumulation_steps}), lr {tcfg.learning_rate}, "
            f"wd {tcfg.weight_decay}, scheduler {tcfg.scheduler}\n"
            f"- Image size: {arch.image_size}\n"
            f"- Mesh: {jax.device_count()} device(s), "
            f"tp={'on' if tcfg.tensor_parallel else 'off'}\n"
            f"- Seed: {seed}\n"
        )

    trainer = Trainer(model, params, tcfg, output_dir=args.output_dir, writer=writer)
    if args.resume:
        trainer.load_checkpoint(args.resume)
        logger.info(f"Resumed from epoch {trainer.epoch - 1}")
    elif config.get("checkpoint", {}).get("auto_resume"):
        # checkpoint.auto_resume — declared by every shipped YAML but read by
        # no reference code; honored here: pick up output_dir/checkpoint.npz
        auto = os.path.join(args.output_dir, "checkpoint.npz")
        if os.path.exists(auto):
            trainer.load_checkpoint(auto)
            logger.info(f"Auto-resumed from {auto} (epoch {trainer.epoch - 1})")

    logger.info(f"Starting training for {tcfg.epochs} epochs")
    history = trainer.fit(train_loader, val_loader)
    for h in history[-3:]:
        logger.info(str(h))
    logger.info(f"Training completed. Best validation loss: {trainer.best_val_loss:.6f}")
    if writer:
        writer.close()


if __name__ == "__main__":
    main()

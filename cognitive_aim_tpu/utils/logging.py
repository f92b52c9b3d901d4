"""Logging setup (ref:src/utils.py:17-43): file + console handlers writing
training.log, same format string."""

from __future__ import annotations

import logging
import os


def setup_logging(output_dir: str, log_level: int = logging.INFO) -> logging.Logger:
    os.makedirs(output_dir, exist_ok=True)
    log_file = os.path.join(output_dir, "training.log")
    formatter = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
    )
    root = logging.getLogger()
    root.setLevel(log_level)
    # avoid duplicate handlers on repeated setup
    root.handlers = [
        h for h in root.handlers
        if not isinstance(h, (logging.FileHandler, logging.StreamHandler))
    ]
    fh = logging.FileHandler(log_file)
    fh.setLevel(log_level)
    fh.setFormatter(formatter)
    ch = logging.StreamHandler()
    ch.setLevel(log_level)
    ch.setFormatter(formatter)
    root.addHandler(fh)
    root.addHandler(ch)
    return logging.getLogger("cognitive_aim_tpu")


def setup_experiment_directory(output_dir: str, config: dict) -> str:
    """Create the reference's experiment layout (ref:src/utils.py:276-288):
    checkpoints/ logs/ predictions/ tensorboard/ subdirs plus a config.yaml
    snapshot of the resolved config."""
    import yaml

    for subdir in ("checkpoints", "logs", "predictions", "tensorboard"):
        os.makedirs(os.path.join(output_dir, subdir), exist_ok=True)
    with open(os.path.join(output_dir, "config.yaml"), "w") as f:
        yaml.dump(config, f, default_flow_style=False)
    return output_dir


def count_parameters(params) -> tuple[int, int]:
    """(total, total) — all params in a pytree; trainability is an optimizer
    property here (ref:src/utils.py:187-191 counts requires_grad)."""
    import jax

    total = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    return total, total


def get_model_size_mb(params) -> float:
    import jax
    import numpy as np

    return sum(
        x.size * np.dtype(x.dtype).itemsize for x in jax.tree_util.tree_leaves(params)
    ) / 1024 / 1024

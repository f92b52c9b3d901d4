"""cognitive_aim_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework with the
capabilities of the `cognitive-aim-depth-estimation` reference system.

Monocular single-value depth estimation ("how far is the thing I'm aiming at")
from one RGB photo, with a frozen-or-finetuned DINOv2 ViT backbone, three
parallel cognitive streams (ambient / iterative-focal / EXIF-prior), a
VAE-based curiosity module, and 9-way spatial guidance instructions.

Layer map (bottom-up):
  core/      mesh construction, precision policy, RNG threading
  nn/        functional layers + the DINOv2 ViT (pure functions over pytrees)
  kernels/   Pallas TPU kernels (flash attention, fused guidance) + XLA refs
  models/    cognitive streams, curiosity VAE, guidance masks, full model
  io/        dataset, EXIF extraction, preprocessing, torch->JAX checkpoints
  train/     losses, metrics, pjit-sharded training loop, orbax checkpoints
  parallel/  sharding rules (DP/TP) over jax.sharding.Mesh
  utils/     logging, visualization (3-panel PNGs, nine-grid figure)

Reference behavior citations use ``ref:`` prefixes, e.g. ``ref:src/model.py:128``
meaning /root/reference/src/model.py line 128.
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy to keep `import cognitive_aim_tpu` light
    if name == "resolve_model_config":
        from cognitive_aim_tpu.models.config import resolve_model_config

        return resolve_model_config
    if name == "CognitiveAimModel":
        from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel

        return CognitiveAimModel
    raise AttributeError(name)

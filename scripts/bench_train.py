"""Training-step throughput on TPU (frozen-backbone LoRA-style step, 224^2)."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax
from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
from cognitive_aim_tpu.models.config import ModelArchConfig
from cognitive_aim_tpu.train.trainer import TrainConfig, Trainer

B, S = int(os.environ.get("TB_B", 32)), int(os.environ.get("TB_S", 224))
frozen = os.environ.get("TB_FROZEN", "1") == "1"
# TB_FILTER: token-filter spec (e.g. '2:0.25' or '1:0.5,3:0.35,5:0.25') —
# filter-active TRAINING: fewer tokens in fwd+bwd for every layer past the
# drop point, and the deployment regime when serving runs the filter.
from cognitive_aim_tpu.models.config import parse_token_filter
arch = ModelArchConfig(num_iterations=3, image_size=S, freeze_backbone=frozen,
                       use_lora=frozen,
                       **parse_token_filter(os.environ.get("TB_FILTER", "")))
model = CognitiveAimModel(arch, attn_impl="pallas_packed")
params = model.init(jax.random.PRNGKey(0))
cfg = TrainConfig(epochs=1, batch_size=B, steps_per_epoch=100,
                  freeze_backbone=frozen)
tr = Trainer(model, params, cfg, output_dir="/tmp/bench_train")
rng = np.random.RandomState(0)
batch = {
    "images": rng.randn(B, S, S, 3).astype(np.float32) * 0.5,
    "depths": np.abs(rng.randn(B).astype(np.float32)) + 0.5,
    "exif": {"camera_idx": np.zeros(B, np.int32),
             "focal_length": np.full(B, 0.25, np.float32),
             "aperture": np.full(B, 0.127, np.float32),
             "iso": np.full(B, 0.016, np.float32)},
}
# warm
logs = tr.train_step(batch, jax.random.PRNGKey(0))
# chain N steps; params update creates the data dependence; fetch loss
t0 = time.perf_counter()
N = 20
for i in range(N):
    logs = tr.train_step(batch, jax.random.PRNGKey(i), fetch_logs=False)
# force completion via host fetch of updated params leaf
_ = np.asarray(jax.tree_util.tree_leaves(tr.params)[0])[..., :1]
dt = time.perf_counter() - t0
print(f"train step B={B} S={S} frozen={frozen}: {dt/N*1e3:.1f} ms/step "
      f"({B*N/dt:.0f} img/s) loss={float(logs['loss']):.4f}", flush=True)

# device-only step time (batch pre-staged; isolates compute from the relay's
# slow host->device transfers)
import jax.numpy as jnp
db = tr._device_batch(batch)
cur_on = jnp.asarray(True)
kl_w = jnp.asarray(0.1, jnp.float32)
p, o = tr.params, tr.opt_state
key = jax.random.PRNGKey(0)
p, o, lg = tr._step_fn(p, o, db, key, cur_on, kl_w)  # warm (already compiled)
t0 = time.perf_counter()
N2 = 30
for i in range(N2):
    p, o, lg = tr._step_fn(p, o, db, jax.random.PRNGKey(i), cur_on, kl_w)
_ = float(lg["loss"])
dt2 = time.perf_counter() - t0
print(f"device-only train step: {dt2/N2*1e3:.1f} ms/step ({B*N2/dt2:.0f} img/s)",
      flush=True)

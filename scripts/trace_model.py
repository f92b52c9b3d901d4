import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
from cognitive_aim_tpu.models.config import ModelArchConfig
from cognitive_aim_tpu.core.precision import policy_from_name

arch = ModelArchConfig(num_iterations=3, image_size=518)
model = CognitiveAimModel(arch, policy=policy_from_name('int8'), attn_impl='pallas_packed')
params = model.prepare_params(model.init(jax.random.PRNGKey(0)))
B, S = 8, 518
x = jnp.asarray(np.random.RandomState(0).randn(B, S, S, 3).astype(np.float32))
exif = {"camera_idx": jnp.zeros((B,), jnp.int32), "focal_length": jnp.full((B,), 50.0),
        "aperture": jnp.full((B,), 2.8), "iso": jnp.full((B,), 100.0)}
gidx = jnp.zeros((B,), jnp.int32)
key = jax.random.PRNGKey(0)
fn = jax.jit(lambda p, c: model.apply(p, c, exif, guidance=gidx, rng=key).depth.sum())
_ = np.asarray(fn(params, x))
jax.profiler.start_trace('/tmp/jtrace')
for _ in range(5):
    r = fn(params, x)
_ = np.asarray(r)
jax.profiler.stop_trace()
print("trace done")

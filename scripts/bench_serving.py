"""End-to-end serving throughput: JPEG files on disk -> native C++ decode ->
device -> depths. Includes host preprocessing, unlike bench.py (pure device).
Usage: python scripts/bench_serving.py [--n 512] [--size 224] [--batch 64]"""
import argparse, os, sys, time, tempfile
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=512)
ap.add_argument("--size", type=int, default=224)
ap.add_argument("--batch", type=int, default=64)
ap.add_argument("--policy", type=str, default="int8")
args = ap.parse_args()

from PIL import Image
tmp = tempfile.mkdtemp(prefix="serve_bench_")
rng = np.random.RandomState(0)
paths = []
base = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
for i in range(args.n):
    p = os.path.join(tmp, f"im{i}.jpg")
    if i == 0:
        Image.fromarray(base).save(p, quality=90)
    else:
        os.link(paths[0], p)
    paths.append(p)

import jax, jax.numpy as jnp
from cognitive_aim_tpu.core.precision import policy_from_name
from cognitive_aim_tpu.models.cognitive_aim import CognitiveAimModel
from cognitive_aim_tpu.models.config import ModelArchConfig
from cognitive_aim_tpu.io.native_loader import decode_resize_batch_u8 as decode_resize_batch, available, normalize_u8_on_device

print("native loader available:", available(), file=sys.stderr)
arch = ModelArchConfig(num_iterations=3, image_size=args.size)
model = CognitiveAimModel(arch, policy=policy_from_name(args.policy),
                          attn_impl="pallas_packed")
params = model.prepare_params(model.init(jax.random.PRNGKey(0)))
B = args.batch
exif = {"camera_idx": jnp.zeros((B,), jnp.int32), "focal_length": jnp.full((B,), 50.0),
        "aperture": jnp.full((B,), 2.8), "iso": jnp.full((B,), 100.0)}
gidx = jnp.zeros((B,), jnp.int32)
key = jax.random.PRNGKey(0)
fwd = jax.jit(lambda p, x: model.apply(p, normalize_u8_on_device(x), exif, guidance=gidx, rng=key).depth)

# warmup/compile
imgs, ok = decode_resize_batch(paths[:B], args.size, args.size)
d = fwd(params, jnp.asarray(imgs)); _ = np.asarray(d)

t0 = time.perf_counter()
outs = []
pending = None
for s in range(0, args.n, B):
    chunk = paths[s:s+B]
    if len(chunk) < B: break
    imgs, ok = decode_resize_batch(chunk, args.size, args.size)
    pending = fwd(params, jnp.asarray(imgs))
outs = np.asarray(pending)  # force completion of the last batch
dt = time.perf_counter() - t0
n_done = (args.n // B) * B
print(f"host decode only: ", file=sys.stderr, end="")
t1 = time.perf_counter()
for s in range(0, args.n, B):
    chunk = paths[s:s+B]
    if len(chunk) < B: break
    decode_resize_batch(chunk, args.size, args.size)
ddt = time.perf_counter() - t1
print(f"{n_done/ddt:.0f} img/s", file=sys.stderr)
print(f"end-to-end serving (decode+infer, overlap-free): {n_done/dt:.0f} img/s "
      f"@{args.size}^2 batch {B}", file=sys.stderr)

"""On-TPU numeric check: fused int8 GEMM path vs XLA int8 path vs f32."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from cognitive_aim_tpu.kernels.int8_gemm import int8_gemm_fused
from cognitive_aim_tpu.kernels.int8_ops import int8_linear, quantize_weight

rng = np.random.RandomState(0)
M, K, N = 1370, 768, 3072
x = jnp.asarray(rng.randn(M, K).astype(np.float32)).astype(jnp.bfloat16)
w = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.03)
b = jnp.asarray(rng.randn(N).astype(np.float32) * 0.01)
wq = quantize_weight(w)

want = np.asarray(x.astype(jnp.float32) @ w + b)
xla = np.asarray(int8_linear(x, wq, b, out_dtype=jnp.float32))
fused = np.asarray(int8_gemm_fused(x, wq["q"], wq["s"], b, out_dtype=jnp.float32))
for name, got in (("xla-int8", xla), ("pallas-fused-int8", fused)):
    rel = np.abs(got - want) / (np.abs(want) + 1e-2)
    print(f"{name}: median_rel={np.median(rel):.4f} max_abs={np.abs(got-want).max():.4f}", flush=True)
d = np.abs(fused - xla)
print(f"fused vs xla: max_abs={d.max():.5f}")
assert np.median(np.abs(fused - want) / (np.abs(want) + 1e-2)) < 0.02
print("int8 fused GEMM OK on TPU")

"""Numeric check of Pallas kernels against XLA reference on the real TPU."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from cognitive_aim_tpu.kernels import flash_attention as FA

B, N, H, D = 2, 1370, 12, 64
ks = jax.random.split(jax.random.PRNGKey(0), 3)
q, k, v = (jax.random.normal(kk, (B, N, H, D), jnp.bfloat16) for kk in ks)
scale = D ** -0.5

want = np.asarray(FA.attention_reference(q, k, v, scale)).astype(np.float32)
got_v1 = np.asarray(FA.flash_attention(q, k, v, scale=scale)).astype(np.float32)
qp, kp, vp = (t.reshape(B, N, H * D) for t in (q, k, v))
got_v2 = np.asarray(FA.flash_attention_packed(qp, kp, vp, scale=scale, num_heads=H)).astype(np.float32).reshape(B, N, H, D)

for name, got in (("v1", got_v1), ("v2_packed", got_v2)):
    err = np.abs(got - want).max()
    rel = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
    print(f"{name}: max_abs={err:.4f} mean_rel={rel:.5f}", flush=True)
    assert err < 0.05, f"{name} mismatch"
print("kernels OK on TPU")

"""Model-shape int8 vs bf16 linear timing + quantize overhead isolation."""
import sys, os, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from cognitive_aim_tpu.kernels.int8_ops import int8_linear, quantize_weight, quantize_activations

M, K, N = 10960, 3072, 768  # fc2 shape at 518^2, B=8
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (M, K), jnp.bfloat16)
w = jax.random.normal(key, (K, N), jnp.float32) * 0.05
wq = quantize_weight(w)
wbf = w.astype(jnp.bfloat16)
b = jnp.zeros((N,), jnp.float32)

def slope(f, k1=4, k2=20):
    @functools.partial(jax.jit, static_argnames='k')
    def chain(x, k):
        def body(c, _):
            y = f(c)
            return (c + (y.reshape(-1)[0] * 1e-24).astype(c.dtype)), ()
        c, _ = jax.lax.scan(body, x, None, length=k)
        return c.reshape(-1)[0].astype(jnp.float32)
    ts = {}
    for kk in (k1, k2):
        _ = np.asarray(chain(x, kk))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); _ = np.asarray(chain(x, kk)); best = min(best, time.perf_counter() - t0)
        ts[kk] = best
    return (ts[k2] - ts[k1]) / (k2 - k1)

FL = 2 * M * K * N
t = slope(lambda c: (c @ wbf))
print(f"bf16 linear {M}x{K}x{N}: {t*1e3:.3f} ms ({FL/t/1e12:.0f} TF/s)", flush=True)
t = slope(lambda c: int8_linear(c, wq, b, out_dtype=jnp.bfloat16))
print(f"int8 linear (dyn quant): {t*1e3:.3f} ms ({FL/t/1e12:.0f} TOP/s-equiv)", flush=True)
xq, sx = quantize_activations(x)
t = slope(lambda c: (jax.lax.dot_general((c.astype(jnp.int8)), wq['q'], (((1,),(0,)),((),())), preferred_element_type=jnp.int32).astype(jnp.float32) * wq['s']).astype(jnp.bfloat16), k1=4, k2=20)
print(f"int8 dot only (prequant): {t*1e3:.3f} ms ({FL/t/1e12:.0f} TOP/s)", flush=True)
t = slope(lambda c: quantize_activations(c)[0].astype(jnp.bfloat16))
print(f"quantize pass only: {t*1e3:.3f} ms", flush=True)

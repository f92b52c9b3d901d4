import sys, os, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from cognitive_aim_tpu.kernels.flash_attention import flash_attention_packed

B, N, HD, H = 8, 1370, 768, 12
ks = jax.random.split(jax.random.PRNGKey(0), 3)
q, k, v = (jax.random.normal(kk, (B, N, HD), jnp.bfloat16) for kk in ks)

def slope(qb, k1=6, k2=30):
    @functools.partial(jax.jit, static_argnames=('k', 'qb'))
    def chain(q, k_, v_, k, qb):
        def body(c, _):
            o = flash_attention_packed(c, k_, v_, scale=0.125, num_heads=H, q_block=qb)
            return o * 0.5 + c * 0.5, ()
        c, _ = jax.lax.scan(body, q, None, length=k)
        return c.reshape(-1)[0].astype(jnp.float32)
    ts = {}
    for kk in (k1, k2):
        _ = np.asarray(chain(q, k, v, kk, qb))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); _ = np.asarray(chain(q, k, v, kk, qb)); best = min(best, time.perf_counter()-t0)
        ts[kk] = best
    return (ts[k2]-ts[k1])/(k2-k1)

for qb in (176, 352, 512, 704, 1408):
    try:
        t = slope(qb)
        print(f"q_block={qb}: {t*1e3:.3f} ms/layer-equiv", flush=True)
    except Exception as e:
        print(f"q_block={qb} failed: {str(e)[:120]}", flush=True)

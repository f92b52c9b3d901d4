"""Measure int8 vs bf16 matmul throughput on this TPU (scan-slope)."""
import sys, os, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp

N = 4096
def slope(f, a, b, k1=4, k2=36):
    @functools.partial(jax.jit, static_argnames='k')
    def chain(a, b, k):
        def body(c, _):
            y = f(c, b)
            # feed back with requantization to keep dtype
            return (y & 127).astype(a.dtype) if a.dtype == jnp.int8 else y.astype(a.dtype), ()
        c, _ = jax.lax.scan(body, a, None, length=k)
        return c.reshape(-1)[0].astype(jnp.float32)
    ts = {}
    for k in (k1, k2):
        _ = np.asarray(chain(a, b, k))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); _ = np.asarray(chain(a, b, k)); best = min(best, time.perf_counter()-t0)
        ts[k] = best
    return (ts[k2]-ts[k1])/(k2-k1)

kb = jax.random.PRNGKey(0)
a8 = jax.random.randint(kb, (N, N), -127, 127, jnp.int8)
b8 = jax.random.randint(kb, (N, N), -127, 127, jnp.int8)
f8 = lambda a, b: jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
t = slope(f8, a8, b8)
print(f"int8 matmul {N}: {2*N**3/t/1e12:.1f} TOP/s ({t*1e3:.3f} ms)", flush=True)

abf = jax.random.normal(kb, (N, N), jnp.bfloat16)
bbf = jax.random.normal(kb, (N, N), jnp.bfloat16)
fbf = lambda a, b: (a @ b) * 1e-3
t = slope(fbf, abf, bbf)
print(f"bf16 matmul {N}: {2*N**3/t/1e12:.1f} TFLOP/s ({t*1e3:.3f} ms)", flush=True)

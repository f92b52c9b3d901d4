import sys, os, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp

x = jax.random.normal(jax.random.PRNGKey(0), (8, 1370, 3072), jnp.bfloat16)

def slope(f, k1=8, k2=40):
    @functools.partial(jax.jit, static_argnames='k')
    def chain(c, k):
        def body(c, _):
            return f(c) * 0.999, ()
        c, _ = jax.lax.scan(body, c, None, length=k)
        return c.reshape(-1)[0].astype(jnp.float32)
    ts = {}
    for kk in (k1, k2):
        _ = np.asarray(chain(x, kk))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); _ = np.asarray(chain(x, kk)); best = min(best, time.perf_counter()-t0)
        ts[kk] = best
    return (ts[k2]-ts[k1])/(k2-k1)

n = x.size
for name, f in [
    ("identity*2", lambda c: c * 2.0),
    ("gelu exact (erf)", lambda c: jax.nn.gelu(c, approximate=False)),
    ("gelu tanh", lambda c: jax.nn.gelu(c, approximate=True)),
    ("sigmoid-gelu x*sig(1.702x)", lambda c: c * jax.nn.sigmoid(1.702 * c)),
    ("exp", jnp.exp),
    ("exp2", jnp.exp2),
]:
    t = slope(f)
    print(f"{name:28s}: {t*1e3:.3f} ms ({n/t/1e9:.0f} Gelem/s)", flush=True)

"""Backbone throughput profiling on TPU (scan-slope methodology; see
utils/profiling.py). Usage: python scripts/profile_backbone.py"""
import sys, time, functools, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp
from cognitive_aim_tpu.nn import dinov2

cfg = dinov2.BASE
params = dinov2.init(jax.random.PRNGKey(0), cfg)
B, S = int(os.environ.get("PROF_B", 8)), int(os.environ.get("PROF_S", 518))
x = jnp.asarray(np.random.RandomState(0).randn(B, S, S, 3).astype(np.float32))
n = (S // 14) ** 2 + 1
FL = 12 * (4 * n * 768**2 + 2 * n * n * 768 + 16 * n * 768 * 768) * 2 * B

def slope(apply_fn, k1=2, k2=10):
    @functools.partial(jax.jit, static_argnames='k')
    def chain(params, c, k):
        def body(c, _):
            out = apply_fn(params, c)
            return c + (out.mean() * 1e-24).astype(c.dtype), ()
        c, _ = jax.lax.scan(body, c, None, length=k)
        return c.reshape(-1)[0].astype(jnp.float32)
    ts = {}
    for k in (k1, k2):
        _ = np.asarray(chain(params, x, k))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); _ = np.asarray(chain(params, x, k))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k2] - ts[k1]) / (k2 - k1)

for attn in ("xla", "pallas"):
    for fuse in (False, True):
        fn = lambda p, c: dinov2.apply(
            p, c, cfg, compute_dtype=jnp.bfloat16, attn_impl=attn, fuse_qkv=fuse
        ).astype(jnp.float32)
        try:
            t = slope(fn)
            print(f"backbone B={B} S={S} attn={attn} fuse_qkv={fuse}: "
                  f"{t*1e3:.2f} ms ({B/t:.0f} img/s, {FL/t/197e12*100:.0f}% MFU)",
                  flush=True)
        except Exception as e:
            print(f"attn={attn} fuse={fuse} failed: {type(e).__name__}: {str(e)[:150]}",
                  flush=True)

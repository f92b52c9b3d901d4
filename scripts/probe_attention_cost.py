"""Decompose packed-attention kernel cost: MXU-only vs +mask vs +softmax."""
import sys, os, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, HD, H, D = 8, 1370, 768, 12, 64
ks = jax.random.split(jax.random.PRNGKey(0), 3)
q, k, v = (jax.random.normal(kk, (B, N, HD), jnp.bfloat16) for kk in ks)

def make_kernel(mode):
    def kern(q_ref, k_ref, v_ref, o_ref):
        qq = q_ref[0]; kk_ = k_ref[0]; vv = v_ref[0]
        nk = kk_.shape[0]
        kidx = jax.lax.broadcasted_iota(jnp.int32, (1, nk), 1)
        kbias = jnp.where(kidx < N, 0.0, -1e30).astype(jnp.float32)
        for h in range(H):
            sl = slice(h*D, (h+1)*D)
            s = jax.lax.dot_general(qq[:, sl], kk_[:, sl], (((1,),(1,)),((),())),
                                    preferred_element_type=jnp.float32) * 0.125
            if mode >= 1:
                s = s + kbias
            if mode >= 2:
                m = s.max(-1, keepdims=True)
                e = jnp.exp(s - m)
                s = e * (1.0 / e.sum(-1, keepdims=True))
            p = s.astype(vv.dtype)
            o_ref[0, :, sl] = jax.lax.dot_general(p, vv[:, sl], (((1,),(0,)),((),())),
                                                  preferred_element_type=jnp.float32).astype(o_ref.dtype)
    return kern

def run(mode, qb=512):
    f = pl.pallas_call(
        make_kernel(mode), grid=(B, pl.cdiv(N, qb)),
        in_specs=[pl.BlockSpec((1, qb, HD), lambda b,i:(b,i,0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, N, HD), lambda b,i:(b,0,0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, N, HD), lambda b,i:(b,0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, qb, HD), lambda b,i:(b,i,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, HD), q.dtype),
    )
    @functools.partial(jax.jit, static_argnames='kk')
    def chain(q, kk):
        def body(c, _):
            o = f(c, k, v)
            return o * 0.5 + c * 0.5, ()
        c, _ = jax.lax.scan(body, q, None, length=kk)
        return c.reshape(-1)[0].astype(jnp.float32)
    ts = {}
    for kk in (6, 30):
        _ = np.asarray(chain(q, kk))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); _ = np.asarray(chain(q, kk)); best = min(best, time.perf_counter()-t0)
        ts[kk] = best
    return (ts[30]-ts[6])/24

names = {0: "dots only", 1: "+mask bias", 2: "+softmax (full)"}
for mode in (0, 1, 2):
    t = run(mode)
    print(f"{names[mode]:18s}: {t*1e3:.3f} ms/layer", flush=True)

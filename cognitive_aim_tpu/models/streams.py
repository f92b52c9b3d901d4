"""Cognitive streams: ambient, focal, iterative-focal, EXIF-prior.

Pure-function re-implementations of the reference modules with exact
eval-mode semantics (ref:src/model.py:32-519). All constants (center-bias
sigma = grid/6, strength 0.3, L1 normalizations, adaptive-weight mixing,
entropy computation) mirror the reference; the per-forward Python loops for
the 2-D positional encoding (ref:src/model.py:140-188) and the center-bias
mask (ref:src/model.py:208-231) become cached numpy constants folded into the
jitted graph.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from cognitive_aim_tpu.core.rng import NoiseMode, normal_like
from cognitive_aim_tpu.nn import init as tinit
from cognitive_aim_tpu.nn import layers as L


# ------------------------------------------------ static constant tables ----
@functools.lru_cache(maxsize=32)
def focal_pos_encoding_np(num_patches: int, patch_dim: int) -> np.ndarray:
    """Sin/cos 2-D positional encoding, bit-identical to the per-forward
    Python loop at ref:src/model.py:140-177 (square layout) and the 1-D
    fallback (ref:src/model.py:167-175)."""
    pe = np.zeros((num_patches, patch_dim), np.float32)
    g = int(num_patches**0.5)
    if g * g == num_patches:
        if patch_dim >= 4:
            half = patch_dim // 2
            div = np.exp(
                np.arange(0, half, 2, dtype=np.float32) * -(math.log(10000.0) / half)
            )
            rows = (np.arange(num_patches) // g).astype(np.float32)[:, None]
            cols = (np.arange(num_patches) % g).astype(np.float32)[:, None]
            if div.size > 0:
                pe[:, 0:half:2] = np.sin(rows * div)
                pe[:, 1:half:2] = np.cos(rows * div)
                pe[:, half::2] = np.sin(cols * div)
                pe[:, half + 1 :: 2] = np.cos(cols * div)
    else:
        pos = np.arange(num_patches, dtype=np.float32)[:, None]
        div = np.exp(
            np.arange(0, patch_dim, 2, dtype=np.float32)
            * -(math.log(10000.0) / patch_dim)
        )
        if div.size > 0:
            pe[:, 0::2] = np.sin(pos * div)
            if patch_dim > 1:
                pe[:, 1::2] = np.cos(pos * div)[:, : pe[:, 1::2].shape[1]]
    return pe


@functools.lru_cache(maxsize=32)
def center_bias_np(num_patches: int, center_strength: float = 0.3) -> np.ndarray:
    """Gaussian center-bias mask (ref:src/model.py:208-231): 2-D with
    sigma = grid/6 for square layouts, 1-D with sigma = N/12 otherwise."""
    g = int(num_patches**0.5)
    if g * g != num_patches:
        center = num_patches // 2
        pos = np.arange(num_patches, dtype=np.float32)
        dist = np.abs(pos - center)
        sigma = num_patches / 12.0
        return (np.exp(-(dist**2) / (2 * sigma**2)) * center_strength).astype(
            np.float32
        )
    c = g // 2
    yy, xx = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
    dist = np.sqrt((xx - c).astype(np.float32) ** 2 + (yy - c).astype(np.float32) ** 2)
    sigma = g / 6.0
    bias = np.exp(-(dist**2) / (2 * sigma**2)).reshape(-1)
    return (bias * center_strength).astype(np.float32)


# -------------------------------------------------------- AmbientStream -----
def ambient_init(key, input_dim: int, hidden_dim: int = 256, dtype=jnp.float32):
    """MLP input->256->128->64 (ref:src/model.py:36-44), torch default init."""
    return {
        "mlp": L.mlp_init(key, [input_dim, hidden_dim, hidden_dim // 2, hidden_dim // 4], dtype)
    }


def ambient_apply(params, cls_token, *, rng=None, train=False):
    # Sequential(Linear, ReLU, Dropout(0.1), Linear, ReLU, Linear)
    return L.mlp_apply(
        params["mlp"], cls_token, dropout_rate=0.1, dropout_after=(0,), rng=rng,
        train=train,
    )


# ---------------------------------------------------------- FocalStream -----
def focal_init(
    key,
    patch_dim: int,
    hidden_dim: int = 256,
    num_heads: int = 8,
    curiosity_guided: bool = True,
    dtype=jnp.float32,
):
    """FocalStream params + the reference's custom init
    (ref:src/model.py:95-126): projection xavier_uniform gain 0.8 / zero bias;
    q,k xavier_normal gain 2.0 with U(-0.05,0.05) bias; v gain 1.0, zero
    bias; adaptive_weight = 0.5."""
    ks = jax.random.split(key, 12)
    p = {
        "query_proj": {
            "w": tinit.xavier_normal(ks[0], patch_dim, patch_dim, 2.0, dtype),
            "b": tinit.uniform(ks[1], (patch_dim,), -0.05, 0.05, dtype),
        },
        "key_proj": {
            "w": tinit.xavier_normal(ks[2], patch_dim, patch_dim, 2.0, dtype),
            "b": tinit.uniform(ks[3], (patch_dim,), -0.05, 0.05, dtype),
        },
        "value_proj": {
            "w": tinit.xavier_normal(ks[4], patch_dim, patch_dim, 1.0, dtype),
            "b": jnp.zeros((patch_dim,), dtype),
        },
        "projection": {
            "fc0": {
                "w": tinit.xavier_uniform(ks[5], patch_dim, hidden_dim, 0.8, dtype),
                "b": jnp.zeros((hidden_dim,), dtype),
            },
            "fc1": {
                "w": tinit.xavier_uniform(
                    ks[6], hidden_dim, hidden_dim // 4, 0.8, dtype
                ),
                "b": jnp.zeros((hidden_dim // 4,), dtype),
            },
        },
        "adaptive_weight": jnp.asarray(0.5, dtype),
    }
    if curiosity_guided:
        p["curiosity_modulator"] = {
            "fc0": {
                "w": tinit.xavier_uniform(ks[7], 1, hidden_dim // 8, 0.8, dtype),
                "b": jnp.zeros((hidden_dim // 8,), dtype),
            },
            "fc1": {
                "w": tinit.xavier_uniform(ks[8], hidden_dim // 8, num_heads, 0.8, dtype),
                "b": jnp.zeros((num_heads,), dtype),
            },
        }
    return p


def focal_apply(
    params,
    patch_tokens,
    curiosity_score=None,
    *,
    num_heads: int = 8,
    curiosity_guided: bool = True,
    rng=None,
    train=False,
    noise_mode: NoiseMode = NoiseMode.SAMPLE,
    fused_attention: bool = False,
):
    """Eval/train-exact FocalStream forward (ref:src/model.py:128-313).

    Returns (focal_features [B, 64], attention [B, N], entropy scalar).

    fused_attention=True routes the NxN attention through the Pallas kernel
    (kernels/focal_attention.py) that emits attended/colmean/diag/rowmax in
    one pass without materializing the [B, N, N] matrix in HBM (60 MB per
    iteration at 518^2 batch 8 on the XLA path).
    """
    B, N, D = patch_tokens.shape
    dt = patch_tokens.dtype  # compute dtype (bf16 on the fast path, f32 strict)
    x = patch_tokens + jnp.asarray(focal_pos_encoding_np(N, D)).astype(dt)[None]

    if fused_attention and "qkv_i8" in params:
        # int8 policy fast path: the three projections share the input, so
        # they run as one fused in-VMEM-quantizing [D, 3D] GEMM
        from cognitive_aim_tpu.kernels.int8_block import int8_qkv_proj

        q, k, v = int8_qkv_proj(
            x, params["qkv_i8"]["wq"]["q"], params["qkv_i8"]["wq"]["s"],
            params["qkv_i8"]["b"], out_dtype=dt,
        )
    else:
        q = L.linear_apply(params["query_proj"], x)
        k = L.linear_apply(params["key_proj"], x)
        v = L.linear_apply(params["value_proj"], x)
    scale = math.sqrt(D // num_heads)  # ref:src/model.py:69 (NOT multi-head)
    if fused_attention:
        from cognitive_aim_tpu.kernels.focal_attention import (
            focal_attention_fused,
        )

        attended, colmean, adiag, armax = focal_attention_fused(q, k, v, scale)
    else:
        scores = jnp.einsum("bnd,bmd->bnm", q, k) / scale
        # softmax + all attention aggregation in f32 (cheap VPU work; keeps
        # the L1-normalized attention numerically faithful even under bf16
        # matmuls)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        attended = jnp.einsum("bnm,bmd->bnd", attn.astype(dt), v)
        colmean = attn.mean(axis=1)
        adiag = jnp.diagonal(attn, axis1=-2, axis2=-1)
        armax = attn.max(axis=-1)

    # aggregated per-patch attention: column mean + center bias (ref:233-239)
    cb = jnp.asarray(center_bias_np(N))[None]
    pa = colmean + cb

    # uniformity fallbacks (ref:242-257); torch .var() = unbiased over all elems
    diag = adiag + cb
    pa = jnp.where(L.torch_var(pa) < 1e-6, diag, pa)
    rowmax = armax + cb
    pa = jnp.where(L.torch_var(pa) < 1e-6, rowmax, pa)
    norms = jnp.linalg.norm(x.astype(jnp.float32), axis=-1)
    nstd = jnp.std(norms, ddof=1)
    noise = normal_like(rng, norms.shape, norms.dtype, noise_mode) * 0.1 * nstd
    pa = jnp.where(L.torch_var(pa) < 1e-6, norms + noise, pa)

    pa = pa / (pa.sum(-1, keepdims=True) + 1e-8)  # L1 norm (ref:261)

    if curiosity_guided and curiosity_score is not None and "curiosity_modulator" in params:
        mod = L.mlp_apply(
            params["curiosity_modulator"],
            curiosity_score[:, None],
            final_act=jax.nn.sigmoid,
        )  # [B, num_heads]
        cw = mod.mean(-1, keepdims=True)
        modulated = pa * (1.0 + cw)
        w = params["adaptive_weight"]
        final = w * modulated + (1.0 - w) * pa  # ref:273-274
    else:
        final = pa

    final = jnp.clip(final, 1e-8)  # ref:281
    final = final / (final.sum(-1, keepdims=True) + 1e-8)

    entropy = jnp.asarray(0.0, final.dtype)
    if train:
        entropy = (-(final * jnp.log(final + 1e-8)).sum(-1)).mean()  # ref:287-292

    weighted = (attended.astype(jnp.float32) * final[..., None]).sum(axis=1)
    feats = L.mlp_apply(
        params["projection"], weighted, dropout_rate=0.1, dropout_after=(0,),
        rng=rng, train=train,
    )
    return feats, final, entropy


# ------------------------------------------------- IterativeFocalStream -----
def iterative_focal_init(
    key,
    patch_dim: int,
    hidden_dim: int = 256,
    num_iterations: int = 2,
    curiosity_guided: bool = True,
    dtype=jnp.float32,
):
    """IterativeFocalStream (ref:src/model.py:315-389). Member streams are
    first initialized like FocalStream, then q/k/v are RE-initialized with the
    per-member diversity factor 1 + 0.1*i (ref:372-389): q,k xavier_normal
    gain 1.2*d with U(-0.01d, 0.01d) bias; v gain 1.0*d, zero bias."""
    ks = jax.random.split(key, num_iterations + 4)
    streams = []
    for i in range(num_iterations):
        sp = focal_init(ks[i], patch_dim, hidden_dim, 8, curiosity_guided, dtype)
        d = 1.0 + 0.1 * i
        # fold before splitting: ks[i] itself was consumed by focal_init, so
        # a plain split would correlate the re-init with the member init
        kk = jax.random.split(jax.random.fold_in(ks[i], 1), 8)
        sp["query_proj"] = {
            "w": tinit.xavier_normal(kk[2], patch_dim, patch_dim, 1.2 * d, dtype),
            "b": tinit.uniform(kk[3], (patch_dim,), -0.01 * d, 0.01 * d, dtype),
        }
        sp["key_proj"] = {
            "w": tinit.xavier_normal(kk[4], patch_dim, patch_dim, 1.2 * d, dtype),
            "b": tinit.uniform(kk[5], (patch_dim,), -0.01 * d, 0.01 * d, dtype),
        }
        sp["value_proj"] = {
            "w": tinit.xavier_normal(kk[6], patch_dim, patch_dim, 1.0 * d, dtype),
            "b": jnp.zeros((patch_dim,), dtype),
        }
        streams.append(sp)

    out_dim = hidden_dim // 4
    p = {
        "streams": streams,
        "initial_focus": 0.02 * jax.random.normal(ks[-1], (1, patch_dim), dtype),
        "fusion": {
            "fc0": {
                "w": tinit.xavier_uniform(
                    ks[-2], out_dim * num_iterations, hidden_dim // 2, 0.8, dtype
                ),
                "b": jnp.zeros((hidden_dim // 2,), dtype),
            },
            "fc1": {
                "w": tinit.xavier_uniform(ks[-3], hidden_dim // 2, out_dim, 0.8, dtype),
                "b": jnp.zeros((out_dim,), dtype),
            },
        },
    }
    if curiosity_guided:
        ka, kb = jax.random.split(ks[-4])  # distinct keys per layer
        p["curiosity_amplifier"] = {
            "fc0": {
                "w": tinit.xavier_uniform(ka, 1, 32, 0.8, dtype),
                "b": jnp.zeros((32,), dtype),
            },
            "fc1": {
                "w": tinit.xavier_uniform(kb, 32, num_iterations, 0.8, dtype),
                "b": jnp.zeros((num_iterations,), dtype),
            },
        }
    return p


def iterative_focal_apply(
    params,
    patch_tokens,
    curiosity_score=None,
    *,
    focus_strength: float = 0.1,
    curiosity_guided: bool = True,
    rng=None,
    train=False,
    noise_mode: NoiseMode = NoiseMode.SAMPLE,
    fused_attention: bool = False,
):
    """ref:src/model.py:391-455. Member streams have independent weights, so
    the loop is unrolled (num_iterations is 2/3/6 — small and static).
    Returns (fused_features [B, 64], last attention [B, N], mean entropy)."""
    streams = params["streams"]
    n = len(streams)
    iter_w = None
    if curiosity_guided and curiosity_score is not None and "curiosity_amplifier" in params:
        iter_w = jax.nn.softmax(
            L.mlp_apply(params["curiosity_amplifier"], curiosity_score[:, None]),
            axis=-1,
        )  # [B, n]

    feats, ents = [], []
    attn = None
    cur = patch_tokens
    for i, sp in enumerate(streams):
        if iter_w is not None:
            ic = curiosity_score * iter_w[:, i]
        else:
            ic = curiosity_score
        sub = None if rng is None else jax.random.fold_in(rng, i)
        f, attn, ent = focal_apply(
            sp, cur, ic,
            curiosity_guided=curiosity_guided, rng=sub, train=train,
            noise_mode=noise_mode, fused_attention=fused_attention,
        )
        feats.append(f)
        ents.append(ent)
        if i < n - 1:  # re-focus for the next iteration (ref:424-427)
            cur = (cur.astype(jnp.float32)
                   * (1.0 + focus_strength * attn[..., None])).astype(cur.dtype)

    fused = L.mlp_apply(params["fusion"], jnp.concatenate(feats, axis=1))
    entropy = jnp.mean(jnp.stack(ents)) if train else jnp.asarray(0.0)
    return fused, attn, entropy


# ---------------------------------------------------- EXIFPriorDatabase -----
def exif_prior_init(key, num_cameras: int, hidden_dim: int = 256, dtype=jnp.float32):
    """ref:src/model.py:460-479; torch default inits."""
    ks = jax.random.split(key, 3)
    return {
        "camera_embedding": L.embedding_init(ks[0], num_cameras, 64, dtype),
        "exif_encoder": L.mlp_init(ks[1], [3, 64, 64], dtype),
        "fusion": L.mlp_init(ks[2], [128, hidden_dim, hidden_dim // 4], dtype),
    }


def exif_prior_apply(params, exif_data, *, rng=None, train=False):
    """exif_data: dict with 'camera_idx' int [B], 'focal_length', 'aperture',
    'iso' float [B] (ref:src/model.py:482-519). Values are passed through as
    given — the demo path feeds raw units (50mm / f2.8 / ISO100,
    ref:demo.py:263-268) while the dataset path feeds normalized values
    (ref:src/dataset.py:143-155); we reproduce both behaviors."""
    cam = L.embedding_apply(params["camera_embedding"], exif_data["camera_idx"])
    cont = jnp.stack(
        [
            exif_data["focal_length"],
            exif_data["aperture"],
            jnp.log(exif_data["iso"] + 1.0),
        ],
        axis=1,
    )
    ef = L.mlp_apply(params["exif_encoder"], cont)
    combined = jnp.concatenate([cam, ef], axis=1)
    return L.mlp_apply(
        params["fusion"], combined, dropout_rate=0.1, dropout_after=(0,), rng=rng,
        train=train,
    )

"""torch.nn.functional.interpolate equivalents as static resize matrices.

The reference uses torch bilinear interpolation for guidance-mask resizing
(ref:src/model.py:1392-1397) and depth-map resizing (ref:src/dataset.py:173-178),
and bicubic for DINOv2 position-embedding interpolation (HF
Dinov2Embeddings.interpolate_pos_encoding, mode="bicubic",
align_corners=False, no antialias).

Instead of a gather-heavy dynamic implementation, we build the interpolation
as two dense (out_size x in_size) weight matrices computed in numpy at trace
time (shapes are static under jit), so a 2-D resize is just

    out = W_h @ img @ W_w.T

two small matmuls that XLA maps onto the MXU. The kernels reproduce torch's
semantics exactly: half-pixel source coordinates (align_corners=False),
border replication, and torch's cubic convolution with A = -0.75.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, A: float = -0.75) -> np.ndarray:
    """torch/OpenCV cubic convolution kernel (A=-0.75)."""
    x = np.abs(x)
    x2 = x * x
    x3 = x2 * x
    w = np.where(
        x <= 1.0,
        (A + 2.0) * x3 - (A + 3.0) * x2 + 1.0,
        np.where(x < 2.0, A * x3 - 5.0 * A * x2 + 8.0 * A * x - 4.0 * A, 0.0),
    )
    return w


@functools.lru_cache(maxsize=256)
def resize_matrix(in_size: int, out_size: int, mode: str = "bilinear") -> tuple:
    """Return a (out_size, in_size) float32 row matrix W s.t. out = W @ in.

    Matches torch F.interpolate(mode=mode, align_corners=False,
    antialias=False) along one axis. Cached; returned as a hashable tuple of
    bytes to keep the lru_cache happy — use `resize_weights` for the array.
    """
    W = np.zeros((out_size, in_size), np.float64)
    if in_size == out_size:
        np.fill_diagonal(W, 1.0)
        return (W.astype(np.float32).tobytes(), out_size, in_size)
    scale = in_size / out_size
    for i in range(out_size):
        # half-pixel (align_corners=False) source coordinate
        src = (i + 0.5) * scale - 0.5
        if mode == "bilinear":
            x0 = int(np.floor(src))
            t = src - x0
            for dx, w in ((0, 1.0 - t), (1, t)):
                j = min(max(x0 + dx, 0), in_size - 1)  # border replicate
                W[i, j] += w
        elif mode == "bicubic":
            x0 = int(np.floor(src))
            offs = np.array([-1, 0, 1, 2])
            ws = _cubic_kernel(src - (x0 + offs))
            for dx, w in zip(offs, ws):
                j = min(max(x0 + int(dx), 0), in_size - 1)
                W[i, j] += w
        elif mode == "nearest":
            # torch 'nearest' uses floor(i * scale), NOT half-pixel
            j = min(int(np.floor(i * scale)), in_size - 1)
            W[i, j] = 1.0
        else:
            raise ValueError(f"unknown mode {mode}")
    return (W.astype(np.float32).tobytes(), out_size, in_size)


def resize_weights(in_size: int, out_size: int, mode: str = "bilinear") -> np.ndarray:
    buf, o, i = resize_matrix(in_size, out_size, mode)
    return np.frombuffer(buf, np.float32).reshape(o, i)


def resize_2d(img, out_h: int, out_w: int, mode: str = "bilinear"):
    """Resize the last two axes of `img` ([..., H, W]) torch-style."""
    in_h, in_w = img.shape[-2], img.shape[-1]
    Wh = jnp.asarray(resize_weights(in_h, out_h, mode))
    Ww = jnp.asarray(resize_weights(in_w, out_w, mode))
    out = jnp.einsum("oh,...hw->...ow", Wh, img.astype(jnp.float32))
    out = jnp.einsum("pw,...ow->...op", Ww, out)
    return out

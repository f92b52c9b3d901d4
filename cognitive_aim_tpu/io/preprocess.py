"""Image preprocessing: decode on host, resize+normalize on device.

The reference preprocesses with torchvision Resize/ToTensor/Normalize
(ref:demo.py:162-166, ImageNet mean/std). To sustain 1k img/s/chip the
per-image work on host is just JPEG decode to a uint8 array; the
resize (torch-bilinear-equivalent, via static resize matrices) and
normalization run jitted on device in one fused pass.

Layout: this framework is NHWC end-to-end (TPU-friendly); the reference's
NCHW only appears in the torch converter/tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cognitive_aim_tpu.nn.torch_interp import resize_weights

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def load_image_uint8(path: str) -> np.ndarray:
    """[H, W, 3] uint8 via PIL (host)."""
    from PIL import Image

    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"), np.uint8)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_normalize(images_u8, out_h: int, out_w: int):
    """uint8 [B, H, W, 3] -> normalized f32 [B, out_h, out_w, 3], equivalent
    to torchvision Resize(bilinear, antialias default True)... the reference
    uses PIL Resize on PIL images (default BILINEAR with antialias); for
    parity-sensitive evaluation use `pil_resize_host` instead. This on-device
    path is the high-throughput route (bilinear, half-pixel)."""
    x = images_u8.astype(jnp.float32) / 255.0
    in_h, in_w = x.shape[1], x.shape[2]
    Wh = jnp.asarray(resize_weights(in_h, out_h, "bilinear"))
    Ww = jnp.asarray(resize_weights(in_w, out_w, "bilinear"))
    x = jnp.einsum("oh,bhwc->bowc", Wh, x)
    x = jnp.einsum("pw,bowc->bopc", Ww, x)
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def pil_resize_host(img_u8: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Exact reference preprocessing: PIL bilinear resize on host
    (torchvision Resize applies PIL's antialiased bilinear on PIL inputs,
    ref:demo.py:162-164). Returns f32 [out_h, out_w, 3] in [0, 1]."""
    from PIL import Image

    img = Image.fromarray(img_u8).resize((out_w, out_h), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


def normalize_np(x: np.ndarray) -> np.ndarray:
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def preprocess_paths(paths, image_size: int, exact_pil: bool = True) -> np.ndarray:
    """Batch [B, S, S, 3] normalized f32 from image paths (host path)."""
    out = np.empty((len(paths), image_size, image_size, 3), np.float32)
    for i, p in enumerate(paths):
        u8 = load_image_uint8(p)
        if exact_pil:
            out[i] = normalize_np(pil_resize_host(u8, image_size, image_size))
        else:
            out[i] = np.asarray(
                resize_normalize(jnp.asarray(u8)[None], image_size, image_size)[0]
            )
    return out

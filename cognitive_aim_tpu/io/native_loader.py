"""ctypes bindings for the native C++ batch loader (io/native/loader.cpp).

Multi-threaded JPEG/PNG decode + torch-style bilinear resize + ImageNet
normalization producing device-ready NHWC f32 batches, off the GIL. Builds
on first use with the in-image g++ (no pip/pybind11 needed); falls back to
the PIL path (io/preprocess.py) when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libcaim_loader.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-s"], cwd=_NATIVE_DIR, check=True, capture_output=True
            )
        except Exception as e:
            _build_failed = True
            import logging

            logging.getLogger(__name__).warning(
                "native loader build failed (%s); falling back to PIL", e
            )
            return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.caim_decode_resize_batch.restype = ctypes.c_int
    lib.caim_decode_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.caim_decode_resize_batch_u8.restype = ctypes.c_int
    lib.caim_decode_resize_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int,
    ]
    lib.caim_decode_resize_batch_u8_exif.restype = ctypes.c_int
    lib.caim_decode_resize_batch_u8_exif.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
        ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _ensure_built() is not None


def decode_resize_batch(
    paths: List[str],
    out_h: int,
    out_w: int,
    normalize: bool = True,
    n_threads: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (batch [N, H, W, 3] f32, ok [N] bool). Falls back to PIL when
    the native library is unavailable."""
    lib = _ensure_built()
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.float32)
    ok = np.zeros(n, np.uint8)
    if lib is None:
        from cognitive_aim_tpu.io.preprocess import (
            load_image_uint8,
            normalize_np,
            pil_resize_host,
        )

        for i, p in enumerate(paths):
            try:
                img = pil_resize_host(load_image_uint8(p), out_h, out_w)
                out[i] = normalize_np(img) if normalize else img
                ok[i] = 1
            except Exception:
                out[i] = 0.0
        return out, ok.astype(bool)

    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.caim_decode_resize_batch(
        c_paths,
        n,
        out_h,
        out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n_threads,
        1 if normalize else 0,
    )
    return out, ok.astype(bool)


def decode_resize_batch_u8(
    paths: List[str], out_h: int, out_w: int, n_threads: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """uint8 variant: (batch [N, H, W, 3] u8, ok [N] bool) — 4x less
    host->device transfer; normalize on-device with `normalize_u8_on_device`."""
    lib = _ensure_built()
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    ok = np.zeros(n, np.uint8)
    if lib is None:
        from cognitive_aim_tpu.io.preprocess import load_image_uint8, pil_resize_host

        for i, p in enumerate(paths):
            try:
                img = pil_resize_host(load_image_uint8(p), out_h, out_w)
                out[i] = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
                ok[i] = 1
            except Exception:
                out[i] = 0
        return out, ok.astype(bool)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.caim_decode_resize_batch_u8(
        c_paths, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n_threads,
    )
    return out, ok.astype(bool)


_EXIF_CAP = 1 << 16  # APP1 segments are <= 65533 bytes by format


def decode_resize_batch_u8_exif(
    paths: List[str], out_h: int, out_w: int, n_threads: int = 0
) -> tuple[np.ndarray, np.ndarray, List[Optional[bytes]]]:
    """uint8 decode+resize AND raw EXIF APP1 payloads in ONE pass over each
    file (the native loader captures the marker during JPEG header parse).
    Returns (batch u8, ok bool, [payload bytes | None] per image) — parse
    payloads with io.exif.extract_exif_from_app1. Falls back to PIL."""
    lib = _ensure_built()
    n = len(paths)
    if lib is None:
        from cognitive_aim_tpu.io import exif as exif_io

        out, ok = decode_resize_batch_u8(paths, out_h, out_w, n_threads)
        payloads: List[Optional[bytes]] = []
        for p in paths:
            raw = exif_io.read_exif_app1(p)
            payloads.append(raw)
        return out, ok, payloads
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    ok = np.zeros(n, np.uint8)
    exif_buf = np.zeros((n, _EXIF_CAP), np.uint8)
    exif_lens = np.zeros(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.caim_decode_resize_batch_u8_exif(
        c_paths, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        exif_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        exif_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        _EXIF_CAP, n_threads,
    )
    payloads = [
        bytes(exif_buf[i, : exif_lens[i]]) if exif_lens[i] else None
        for i in range(n)
    ]
    return out, ok.astype(bool), payloads


def normalize_u8_on_device(images_u8):
    """jit-fusable device-side /255 + ImageNet normalization."""
    import jax.numpy as jnp

    from cognitive_aim_tpu.io.preprocess import IMAGENET_MEAN, IMAGENET_STD

    x = images_u8.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

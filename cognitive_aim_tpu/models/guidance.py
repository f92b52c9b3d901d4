"""9-way spatial guidance masks.

The reference builds a patch_size x patch_size mask with Python double loops
per call (ref:src/model.py:1268-1379): `center` uses radial tiers 3.0 inside
r=g//4 and 1.5 inside 2r; the other eight instructions use a circular focus
at grid-fraction anchors with 5.0 inside r=g//6 and 2.0 inside 2r; background
is 1.0. Here the whole 9-instruction table is precomputed in numpy as a
static [9, g, g] constant (cached per grid size) — identical values, zero
per-call Python work, and the full table can be batched for nine-grid demos.

Mask-to-patch-count mismatch is resolved with torch-equivalent bilinear
interpolation (ref:src/model.py:1384-1398).
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

from cognitive_aim_tpu.nn.torch_interp import resize_weights

# Instruction order is the public vocabulary (demo.py --instruction).
INSTRUCTIONS = (
    "center",
    "left",
    "right",
    "top",
    "bottom",
    "top-left",
    "top-right",
    "bottom-left",
    "bottom-right",
)

_ALIASES = {
    "topleft": "top-left",
    "topright": "top-right",
    "bottomleft": "bottom-left",
    "bottomright": "bottom-right",
}


def instruction_index(name: str) -> int:
    """Map an instruction string (case-insensitive, ref aliases accepted,
    ref:src/model.py:1330-1366) to its table row."""
    key = name.lower()
    key = _ALIASES.get(key, key)
    return INSTRUCTIONS.index(key)


def _focus_anchor(g: int, instruction: str) -> tuple[int, int]:
    """(focus_y, focus_x) per ref:src/model.py:1284-1368 (integer division)."""
    q, h, t = g // 4, g // 2, g * 3 // 4
    return {
        "left": (h, q),
        "right": (h, t),
        "top": (q, h),
        "bottom": (t, h),
        "top-left": (q, q),
        "top-right": (q, t),
        "bottom-left": (t, q),
        "bottom-right": (t, t),
    }[instruction]


@functools.lru_cache(maxsize=32)
def _mask_table_np(g: int) -> np.ndarray:
    """[9, g, g] float32; row order = INSTRUCTIONS."""
    yy, xx = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
    table = np.ones((len(INSTRUCTIONS), g, g), np.float32)

    # center: radius g//4, tiers 3.0 / 1.5 (ref:src/model.py:1270-1280)
    cy = cx = g // 2
    r = max(1, g // 4)
    dist = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    m = np.ones((g, g), np.float32)
    m[dist <= 2 * r] = 1.5
    m[dist <= r] = 3.0
    table[0] = m

    # 8 directional focuses: radius g//6, tiers 5.0 / 2.0
    # (ref:src/model.py:1282-1376)
    r = max(1, g // 6)
    for i, name in enumerate(INSTRUCTIONS[1:], start=1):
        fy, fx = _focus_anchor(g, name)
        dist = np.sqrt((yy - fy) ** 2 + (xx - fx) ** 2)
        m = np.ones((g, g), np.float32)
        m[dist <= 2 * r] = 2.0
        m[dist <= r] = 5.0
        table[i] = m
    return table


def mask_table(grid_size: int, num_patches: int | None = None) -> jnp.ndarray:
    """[9, N] flattened guidance table for a grid_size x grid_size layout.

    If num_patches differs from grid_size**2, the mask is built at the
    reference's assumed sqrt(N) grid and bilinearly resized like
    ref:src/model.py:1384-1398."""
    table = _mask_table_np(grid_size)
    if num_patches is not None and num_patches != grid_size * grid_size:
        tgt = int(math.sqrt(num_patches))
        Wh = resize_weights(grid_size, tgt, "bilinear")
        tab = np.einsum("oh,khw->kow", Wh, table)
        tab = np.einsum("pw,kow->kop", Wh, tab)
        table = tab
        grid_size = tgt
    return jnp.asarray(table.reshape(len(INSTRUCTIONS), -1))


def guidance_vector(instruction: str, num_patches: int) -> jnp.ndarray:
    """[N] guidance weights for one instruction; the reference assumes the
    patch layout is square (ref:src/model.py:1264-1265)."""
    g = int(math.sqrt(num_patches))
    return mask_table(g, num_patches)[instruction_index(instruction)]

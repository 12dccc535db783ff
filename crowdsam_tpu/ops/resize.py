"""Resize helpers with torch-exact semantics.

`jax.image.resize` matches torch's bilinear (half-pixel) mode but its cubic
kernel uses a=-0.5 where torch's bicubic uses a=-0.75.  For static-shape
resizes (positional-embedding interpolation) we build dense separable
interpolation matrices once in numpy — XLA then folds them into two matmuls.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel with free parameter a (torch: -0.75)."""
    x = np.abs(x)
    out = np.zeros_like(x)
    m1 = x <= 1
    out[m1] = ((a + 2) * x[m1] - (a + 3)) * x[m1] * x[m1] + 1
    m2 = (x > 1) & (x < 2)
    out[m2] = (((x[m2] - 5) * x[m2] + 8) * x[m2] - 4) * a
    return out


@lru_cache(maxsize=64)
def resize_matrix_cubic(in_size: int, out_size: int, a: float = -0.75) -> np.ndarray:
    """(out_size, in_size) matrix implementing 1-D bicubic resize with
    half-pixel centers (align_corners=False) and border replication, matching
    torch F.interpolate(mode='bicubic', antialias=False)."""
    scale = in_size / out_size
    out_coords = (np.arange(out_size) + 0.5) * scale - 0.5
    base = np.floor(out_coords).astype(np.int64)
    frac = out_coords - base
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in range(-1, 3):
        idx = np.clip(base + tap, 0, in_size - 1)
        w = _cubic_kernel(tap - frac, a)
        np.add.at(mat, (np.arange(out_size), idx), w)
    return mat.astype(np.float32)


@lru_cache(maxsize=64)
def resize_matrix_linear(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) matrix implementing 1-D linear resize with
    half-pixel centers and edge clamp — exactly `jax.image.resize(...,
    "linear", antialias=False)` / torch bilinear (align_corners=False).

    Rect-encode uses row/column SLICES of the square frame's matrix: a
    truncated column range is exact whenever the dropped input rows are
    zero in the square frame (they are — it's the zero padding)."""
    scale = in_size / out_size
    pos = (np.arange(out_size) + 0.5) * scale - 0.5
    lo = np.floor(pos).astype(np.int64)
    frac = pos - lo
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(mat, (np.arange(out_size), np.clip(lo, 0, in_size - 1)),
              1.0 - frac)
    np.add.at(mat, (np.arange(out_size), np.clip(lo + 1, 0, in_size - 1)),
              frac)
    return mat.astype(np.float32)


def resize_bicubic_torch(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """(..., H, W, C) -> (..., out_h, out_w, C) torch-bicubic resize."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    wh = jnp.asarray(resize_matrix_cubic(h, oh))
    ww = jnp.asarray(resize_matrix_cubic(w, ow))
    y = jnp.einsum("oh,...hwc->...owc", wh, x.astype(jnp.float32))
    y = jnp.einsum("pw,...owc->...opc", ww, y)
    return y

"""Image/coordinate resize transforms.

Behavioural contracts:
- `ResizeLongestSide` semantics: reference `segment_anything_cs/utils/transforms.py`
  (PIL bilinear for images, float scaling for coords/boxes,
  `get_preprocess_shape` rounding at :93-102).
- `resize_image`: reference `crowdsam/utils.py:141-156` (cv2 bilinear to
  r = min(max/w, max/h) with int-truncated shape; upscaling allowed).

The host entry points accept numpy uint8 HWC images (resize happens once per
image and is bandwidth-trivial next to the dual ViT-L encode); all coordinate
math also exists as jit-safe jnp functions for use inside the decode engine.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp


def get_preprocess_shape(oldh: int, oldw: int, long_side_length: int) -> Tuple[int, int]:
    """Output (newh, neww) with the long side scaled to `long_side_length`.

    Matches reference `transforms.py:93-102` (round-half-up via +0.5/int).
    """
    scale = long_side_length * 1.0 / max(oldh, oldw)
    newh, neww = oldh * scale, oldw * scale
    return int(newh + 0.5), int(neww + 0.5)


def resize_image_shape(h: int, w: int, max_size: int) -> Tuple[int, int, float]:
    """(new_h, new_w, r) per reference `crowdsam/utils.py:141-147`.

    r = min(max_size/w, max_size/h); int truncation; upscale allowed."""
    r = min(max_size / w, max_size / h)
    return int(r * h), int(r * w), r


def resize_image(image: np.ndarray, max_size: int) -> Tuple[np.ndarray, float]:
    """Host-side whole-image resize (reference `crowdsam/utils.py:141-156`).

    Uses cv2 bilinear like the reference (non-antialiased)."""
    import cv2

    h, w = image.shape[:2]
    nh, nw, r = resize_image_shape(h, w, max_size)
    image = cv2.resize(image, (nw, nh))
    return image, r


class ResizeLongestSide:
    """Resize helper with the reference's public API (`transforms.py:16-102`)."""

    def __init__(self, target_length: int) -> None:
        self.target_length = target_length

    def apply_image(self, image: np.ndarray) -> np.ndarray:
        """HWC uint8 -> HWC uint8, long side == target_length (PIL bilinear)."""
        from PIL import Image

        target_size = get_preprocess_shape(
            image.shape[0], image.shape[1], self.target_length
        )
        if target_size == image.shape[:2]:
            return image
        pil = Image.fromarray(image)
        return np.array(pil.resize((target_size[1], target_size[0]), Image.BILINEAR))

    def apply_coords(self, coords, original_size: Tuple[int, ...]):
        old_h, old_w = original_size
        new_h, new_w = get_preprocess_shape(old_h, old_w, self.target_length)
        if isinstance(coords, jnp.ndarray):
            scale = jnp.asarray([new_w / old_w, new_h / old_h], dtype=jnp.float32)
            return coords.astype(jnp.float32) * scale
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[..., 0] = coords[..., 0] * (new_w / old_w)
        coords[..., 1] = coords[..., 1] * (new_h / old_h)
        return coords

    def apply_boxes(self, boxes, original_size: Tuple[int, ...]):
        shaped = self.apply_coords(
            boxes.reshape(-1, 2, 2), original_size
        )
        return shaped.reshape(-1, 4)


def apply_coords_jax(
    coords: jnp.ndarray, original_size, target_length: int
) -> jnp.ndarray:
    """jit-safe coordinate scaling into the long-side frame.

    `original_size` = (old_h, old_w) may be traced scalars; the reference
    computes new size with round-half-up (`transforms.py:98-101`)."""
    old_h, old_w = original_size
    scale = target_length / jnp.maximum(old_h, old_w)
    new_h = jnp.floor(old_h * scale + 0.5)
    new_w = jnp.floor(old_w * scale + 0.5)
    factor = jnp.stack([new_w / old_w, new_h / old_h])
    return coords.astype(jnp.float32) * factor


def pad_to_square(image: np.ndarray, size: int) -> np.ndarray:
    """Bottom-right zero pad of an HWC image to (size, size, C) on host."""
    h, w = image.shape[:2]
    out = np.zeros((size, size) + image.shape[2:], dtype=image.dtype)
    out[:h, :w] = image
    return out

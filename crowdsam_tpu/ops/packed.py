"""Packed mask layout: the decoder's 4x upscaled masks without transposes.

The SAM mask head upscales the 64x64 image embedding by 2x twice
(conv-transpose 2x2 stride 2, reference `modeling/mask_decoder.py:56-62`).
Materializing the 256^2 masks in spatial (H, W) layout forces two
depth-to-space transposes per decode iteration plus narrow (64/32 channel)
minor dimensions — measured 5x slower on TPU than keeping the data in
"packed" layout:

    packed[(yb*w + xb), (q1y*2 + q1x), (q2y*2 + q2x)]
        == spatial[4*yb + 2*q1y + q2y, 4*xb + 2*q1x + q2x]

i.e. axis -3 is the 64x64 base pixel, axis -2 the first 2x2 quadrant, axis
-1 the second.  Everything the EPS decode loop does with masks is either
permutation-invariant (stability score, areas, softmax pooling) or
coordinate-remappable (bounding boxes, occupancy lookups), so masks stay
packed for the whole loop and only post-NMS survivors are unpacked.
"""

from __future__ import annotations

import jax.numpy as jnp


def packed_coord_maps(h: int, w: int):
    """X/Y spatial coordinate of every packed element.

    Returns (xmap, ymap), each (h*w, 16) int32, for a base grid of
    (h, w) upscaled 4x (spatial size (4h, 4w)).  The 16 axis is
    (q1y, q1x, q2y, q2x) flattened."""
    b = jnp.arange(h * w, dtype=jnp.int32)
    yb, xb = b // w, b % w
    q = jnp.arange(4, dtype=jnp.int32)
    qy, qx = q // 2, q % 2
    y = 4 * yb[:, None, None] + 2 * qy[None, :, None] + qy[None, None, :]
    x = 4 * xb[:, None, None] + 2 * qx[None, :, None] + qx[None, None, :]
    return x.reshape(h * w, 16), y.reshape(h * w, 16)


def pack_spatial(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 4h, 4w) -> (..., h*w, 16) packed."""
    *lead, hh, ww = x.shape
    h, w = hh // 4, ww // 4
    x = x.reshape(*lead, h, 2, 2, w, 2, 2)
    # dims: (yb, q1y, q2y, xb, q1x, q2x) -> (yb, xb, q1y, q1x, q2y, q2x)
    nd = len(lead)
    perm = tuple(range(nd)) + tuple(nd + i for i in (0, 3, 1, 4, 2, 5))
    return x.transpose(perm).reshape(*lead, h * w, 16)


def unpack_spatial(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(..., h*w, 16) packed -> (..., 4h, 4w) spatial."""
    *lead, _, _ = x.shape
    x = x.reshape(*lead, h, w, 2, 2, 2, 2)
    # dims: (yb, xb, q1y, q1x, q2y, q2x) -> (yb, q1y, q2y, xb, q1x, q2x)
    nd = len(lead)
    perm = tuple(range(nd)) + tuple(nd + i for i in (0, 2, 4, 1, 3, 5))
    return x.transpose(perm).reshape(*lead, 4 * h, 4 * w)


def packed_flat_index(py: jnp.ndarray, px: jnp.ndarray, w: int) -> jnp.ndarray:
    """Spatial pixel coords (in the 4h x 4w frame) -> flat packed index
    (into a (h*w*16,) ravel of the packed layout)."""
    b = (py // 4) * w + px // 4
    q1 = ((py // 2) % 2) * 2 + (px // 2) % 2
    q2 = (py % 2) * 2 + px % 2
    return (b * 4 + q1) * 4 + q2


def packed_mask_to_box(masks: jnp.ndarray, xmap: jnp.ndarray,
                       ymap: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """`batched_mask_to_box` on packed bool masks (..., h*w, 16).

    Same contract as ops.amg.batched_mask_to_box (inclusive edges,
    [0,0,0,0] for empty masks)."""
    big = jnp.int32(4 * max(h, w))
    act = masks
    ys = jnp.where(act, ymap, -1)
    bottom = jnp.max(ys, axis=(-1, -2))
    top = jnp.min(jnp.where(act, ymap, big), axis=(-1, -2))
    xs = jnp.where(act, xmap, -1)
    right = jnp.max(xs, axis=(-1, -2))
    left = jnp.min(jnp.where(act, xmap, big), axis=(-1, -2))
    empty = ~jnp.any(act, axis=(-1, -2))
    out = jnp.stack([left, top, right, bottom], axis=-1)
    return out * (~empty)[..., None]

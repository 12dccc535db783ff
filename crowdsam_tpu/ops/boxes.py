"""Box geometry in pure JAX.

Behavioural contracts: reference `crowdsam/utils.py` (uncrop/IoU/format
conversions, :175-251,556-612) and `segment_anything_cs/utils/amg.py`
(crop-edge test, :78-88).  All functions are shape-static and jit-safe.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes, shape (..., 4) -> (...)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix (N,4),(M,4) -> (N,M).

    Matches reference `crowdsam/utils.py:556-583` (eps=1e-6 in denominator).
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / (union + 1e-6)


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """GIoU matrix (reference `crowdsam/utils.py:585-612`)."""
    iou = box_iou(boxes1, boxes2)
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    lt_e = jnp.minimum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb_e = jnp.maximum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh_e = jnp.clip(rb_e - lt_e, 0)
    enclosing = wh_e[..., 0] * wh_e[..., 1]
    return iou - (enclosing - union) / (enclosing + 1e-6)


def box_cxcywh_to_xyxy(bbox: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.moveaxis(bbox, -1, 0)
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(bbox: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.moveaxis(bbox, -1, 0)
    return jnp.stack([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1)


def box_xyxy_to_xywh(bbox: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.moveaxis(bbox, -1, 0)
    return jnp.stack([x0, y0, x1 - x0, y1 - y0], axis=-1)


def uncrop_boxes_xyxy(
    boxes: jnp.ndarray, crop_box: Sequence[int], downscale: float = 1.0
) -> jnp.ndarray:
    """boxes/downscale + crop offset (reference `crowdsam/utils.py:175-181`)."""
    x0, y0 = crop_box[0], crop_box[1]
    offset = jnp.asarray([x0, y0, x0, y0], dtype=jnp.float32)
    if boxes.ndim == 3:
        offset = offset[None, None, :]
    else:
        offset = offset[None, :]
    return boxes / downscale + offset


def uncrop_points(
    points: jnp.ndarray, crop_box: Sequence[int], downscale: float = 1.0
) -> jnp.ndarray:
    """points/downscale + crop offset (reference `crowdsam/utils.py:184-190`)."""
    x0, y0 = crop_box[0], crop_box[1]
    offset = jnp.asarray([x0, y0], dtype=jnp.float32)
    if points.ndim == 3:
        offset = offset[None, None, :]
    else:
        offset = offset[None, :]
    return points / downscale + offset


def apply_box_offsets(boxes: jnp.ndarray, box_delta: jnp.ndarray) -> jnp.ndarray:
    """Delta-decode (reference `crowdsam/utils.py:205-211`): boxes enter as
    xyxy re-interpreted columnwise as (xy, wh); output is cxcywh->xyxy."""
    box_xy = boxes[:, :2] + box_delta[:, :2] * boxes[:, 2:]
    box_wh = boxes[:, 2:] * jnp.exp(box_delta[:, 2:])
    return box_cxcywh_to_xyxy(jnp.concatenate([box_xy, box_wh], axis=-1))


def is_box_near_crop_edge(
    boxes: jnp.ndarray,
    crop_box: Sequence[int],
    orig_box: Sequence[int],
    downscale: float = 1.0,
    atol: float = 20.0,
) -> jnp.ndarray:
    """Near-crop-edge (but not near-image-edge) test.

    Matches reference `crowdsam/utils.py:213-223`: boxes are uncropped with
    `downscale` first, then compared with absolute tolerance `atol`.
    """
    crop = jnp.asarray(crop_box, dtype=jnp.float32)
    orig = jnp.asarray(orig_box, dtype=jnp.float32)
    b = uncrop_boxes_xyxy(boxes.astype(jnp.float32), crop_box, downscale)
    near_crop = jnp.abs(b - crop[None, :]) <= atol
    near_image = jnp.abs(b - orig[None, :]) <= atol
    return jnp.any(near_crop & ~near_image, axis=1)


def mask_iou(mask1: jnp.ndarray, mask2: jnp.ndarray) -> jnp.ndarray:
    """IoU of binary masks over trailing two dims (reference utils.py:472-479)."""
    inter = jnp.logical_and(mask1, mask2).sum(axis=(-1, -2))
    union = jnp.logical_or(mask1, mask2).sum(axis=(-1, -2))
    return inter / union


def coverage(mask1: jnp.ndarray, mask2: jnp.ndarray) -> jnp.ndarray:
    """max(inter/area1, inter/area2) (reference utils.py:461-470)."""
    inter = (mask1 * mask2).sum(axis=(-1, -2))
    cov1 = inter / mask1.sum(axis=(-1, -2))
    cov2 = inter / mask2.sum(axis=(-1, -2))
    return jnp.maximum(cov1, cov2)

"""Shape-static padded NMS in pure JAX.

TPU-native replacement for `torchvision.ops.boxes.batched_nms` (used by the
reference at `crowdsam/model.py:171-176,257-262,429-434` and
`automatic_mask_generator.py:214,251,357`).  Instead of a dynamic keep-list,
we compute a fixed-size boolean keep mask with a score-descending greedy
sweep over a precomputed IoU matrix — O(N^2) elementwise work that lives
entirely on-device with static shapes.

Semantics match torchvision NMS: boxes are processed in descending score
order; a box is suppressed iff its IoU with an earlier *kept* box exceeds
`iou_threshold` (strictly greater, like torchvision).  `batched_nms` only
suppresses within the same category via the coordinate-offset trick.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from crowdsam_tpu.ops.boxes import box_iou


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Greedy NMS -> keep mask, shape (N,).

    `valid=False` entries are treated as absent (never kept, never suppress).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    neg_inf = jnp.asarray(-jnp.inf, dtype=jnp.float32)
    order = jnp.argsort(-jnp.where(valid, scores.astype(jnp.float32), neg_inf))
    sorted_boxes = boxes[order].astype(jnp.float32)
    sorted_valid = valid[order]

    iou = box_iou(sorted_boxes, sorted_boxes)
    earlier = jnp.arange(n)[None, :] < jnp.arange(n)[:, None]  # (i, j): j before i

    def body(i, keep):
        suppressed = jnp.any((iou[i] > iou_threshold) & keep & earlier[i])
        return keep.at[i].set(keep[i] & ~suppressed)

    keep_sorted = jax.lax.fori_loop(0, n, body, sorted_valid)
    return jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)


def batched_nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    categories: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Category-aware NMS via the torchvision coordinate-offset trick."""
    if boxes.shape[0] == 0:
        return jnp.zeros((0,), dtype=bool)
    max_coord = jnp.max(jnp.where(jnp.isfinite(boxes), boxes, 0.0)) + 1.0
    offsets = categories.astype(jnp.float32) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, iou_threshold, valid)


def mask_coverage_nms_mask(
    masks: jnp.ndarray,
    scores: jnp.ndarray,
    threshold: float,
    valid: jnp.ndarray | None = None,
    work_res: int = 150,
) -> jnp.ndarray:
    """Greedy mask-coverage NMS -> keep mask (N,).

    Contract: reference `crowdsam/utils.py:422-459` (mask_iou_nms): masks are
    resized to 150^2, processed score-descending, and a mask is suppressed
    when max(inter/area_i, inter/area_j) vs any kept mask exceeds
    `threshold` (strictly greater).
    """
    import jax

    n = masks.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    small = jax.image.resize(
        masks.astype(jnp.float32), (n, work_res, work_res), "nearest"
    ) > 0.5
    order = jnp.argsort(-jnp.where(valid, scores.astype(jnp.float32), -jnp.inf))
    sm = small[order].reshape(n, -1).astype(jnp.float32)
    areas = sm.sum(axis=1)
    inter = sm @ sm.T
    cov = jnp.maximum(
        inter / jnp.maximum(areas[:, None], 1e-9),
        inter / jnp.maximum(areas[None, :], 1e-9),
    )
    earlier = jnp.arange(n)[None, :] < jnp.arange(n)[:, None]

    def body(i, keep):
        suppressed = jnp.any((cov[i] > threshold) & keep & earlier[i])
        return keep.at[i].set(keep[i] & ~suppressed)

    keep_sorted = jax.lax.fori_loop(0, n, body, valid[order])
    return jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)


def nms_indices(boxes, scores, categories, iou_threshold):
    """torchvision `batched_nms`-style interface: returns kept indices in
    descending score order (host-side convenience; triggers a sync)."""
    import numpy as np

    keep = np.asarray(batched_nms_mask(boxes, scores, categories, iou_threshold))
    scores = np.asarray(scores)
    idx = np.nonzero(keep)[0]
    return idx[np.argsort(-scores[idx], kind="stable")]

"""On-device connected components + small-region cleanup.

TPU-native replacement for `cv2.connectedComponentsWithStats` as used by
`remove_small_regions` (reference `segment_anything_cs/utils/amg.py:267-291`).

Algorithm: iterative 8-connected label propagation.  Each foreground pixel
starts labeled with its own linear index + 1; every sweep takes the max label
over the 3x3 neighborhood (masked to foreground) via `lax.reduce_window`.
Convergence (no label changed) is detected inside a `lax.while_loop`, bounded
by `max_iters`; component areas then come from a single `segment_sum`.
All shapes are static, so the whole cleanup can live inside the decode jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def label_components(
    mask: jnp.ndarray, max_iters: int = 256
) -> jnp.ndarray:
    """8-connected component labels for a batch of binary masks.

    mask: (B, H, W) bool.  Returns (B, H, W) int32 labels; background = 0,
    each component gets the max linear index + 1 of its member pixels.
    """
    b, h, w = mask.shape
    idx = jnp.arange(1, h * w + 1, dtype=jnp.int32).reshape(1, h, w)
    labels0 = jnp.where(mask, idx, 0)

    def sweep(labels):
        return jnp.where(
            mask,
            jax.lax.reduce_window(
                labels,
                jnp.int32(0),
                jax.lax.max,
                window_dimensions=(1, 3, 3),
                window_strides=(1, 1, 1),
                padding=((0, 0), (1, 1), (1, 1)),
            ),
            0,
        )

    def cond(state):
        labels, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        new = sweep(labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True), 0))
    return labels


def component_areas(labels: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel area of the component each pixel belongs to.

    labels: (B, H, W) int32 -> (B, H, W) int32 area map (0 for background).
    """
    b, h, w = labels.shape
    flat = labels.reshape(b, h * w)
    counts = jax.vmap(
        partial(jax.ops.segment_sum, num_segments=h * w + 1)
    )(jnp.ones_like(flat), flat)
    areas = jnp.take_along_axis(counts, flat, axis=1).reshape(b, h, w)
    return jnp.where(labels > 0, areas, 0)


def remove_small_regions(
    masks: jnp.ndarray, area_thresh: float, mode: str, max_iters: int = 256
):
    """Batched `remove_small_regions` (reference `amg.py:267-291`).

    masks: (B, H, W) bool.  Returns (cleaned (B,H,W) bool, changed (B,) bool).

    mode="holes":   fill background components (of ~mask) smaller than thresh.
    mode="islands": drop foreground components smaller than thresh; if that
                    removes everything, keep the largest component.
    """
    assert mode in ("holes", "islands")
    correct_holes = mode == "holes"
    working = jnp.logical_xor(correct_holes, masks)  # fg of the working mask
    labels = label_components(working, max_iters)
    areas = component_areas(labels)
    small = working & (areas < area_thresh)
    changed = jnp.any(small, axis=(1, 2))

    if correct_holes:
        # Output = original mask U small background components.
        out = masks | small
    else:
        out = masks & ~small
        # If every region fell below the threshold, keep the largest one
        # (reference amg.py:287-289).
        b, h, w = masks.shape
        flat = labels.reshape(b, h * w)
        counts = jax.vmap(
            partial(jax.ops.segment_sum, num_segments=h * w + 1)
        )(jnp.ones_like(flat), flat)
        counts = counts.at[:, 0].set(0)  # background is not a candidate
        largest_label = jnp.argmax(counts, axis=1)  # (B,)
        fallback = labels == largest_label[:, None, None]
        all_removed = ~jnp.any(out, axis=(1, 2)) & jnp.any(masks, axis=(1, 2))
        out = jnp.where(all_removed[:, None, None], fallback, out)

    return out, changed

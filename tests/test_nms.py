"""Padded NMS vs a trusted greedy reference implementation."""

import numpy as np
import jax.numpy as jnp

from crowdsam_tpu.ops.nms import batched_nms_mask, nms_indices, nms_mask


def _greedy_nms_ref(boxes, scores, thresh):
    """Plain-python torchvision-semantics NMS for cross-checking."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    for i in order:
        ok = True
        for j in keep:
            # IoU
            lt = np.maximum(boxes[i, :2], boxes[j, :2])
            rb = np.minimum(boxes[i, 2:], boxes[j, 2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a_j = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            iou = inter / (a_i + a_j - inter + 1e-6)
            if iou > thresh:
                ok = False
                break
        if ok:
            keep.append(i)
    return sorted(keep)


def test_nms_matches_reference(rng):
    n = 64
    xy = rng.uniform(0, 200, (n, 2))
    wh = rng.uniform(5, 80, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    for thresh in [0.3, 0.5, 0.65, 0.9]:
        keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), thresh))
        assert sorted(np.nonzero(keep)[0].tolist()) == _greedy_nms_ref(
            boxes, scores, thresh
        )


def test_nms_respects_valid_mask(rng):
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], dtype=np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
    valid = np.array([False, True, True])
    keep = np.asarray(
        nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5, jnp.asarray(valid))
    )
    # Box 0 is invalid: it must not suppress box 1, and must not be kept.
    np.testing.assert_array_equal(keep, [False, True, True])


def test_batched_nms_categories():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], dtype=np.float32)
    scores = np.array([0.9, 0.8], dtype=np.float32)
    cats_same = jnp.asarray([0, 0])
    cats_diff = jnp.asarray([0, 1])
    k_same = np.asarray(
        batched_nms_mask(jnp.asarray(boxes), jnp.asarray(scores), cats_same, 0.5)
    )
    k_diff = np.asarray(
        batched_nms_mask(jnp.asarray(boxes), jnp.asarray(scores), cats_diff, 0.5)
    )
    np.testing.assert_array_equal(k_same, [True, False])
    np.testing.assert_array_equal(k_diff, [True, True])


def test_nms_indices_order():
    boxes = np.array(
        [[0, 0, 10, 10], [100, 100, 110, 110], [1, 1, 9, 9]], dtype=np.float32
    )
    scores = np.array([0.5, 0.9, 0.4], dtype=np.float32)
    idx = nms_indices(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.zeros(3, dtype=jnp.int32), 0.5
    )
    assert idx.tolist() == [1, 0]

"""Box geometry vs independent numpy references."""

import numpy as np
import jax.numpy as jnp

from crowdsam_tpu.ops import boxes as B


def _np_iou(b1, b2):
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (a1[:, None] + a2[None, :] - inter + 1e-6)


def test_box_iou_matches_numpy(rng):
    b1 = rng.uniform(0, 100, (7, 2))
    b1 = np.concatenate([b1, b1 + rng.uniform(1, 50, (7, 2))], axis=1)
    b2 = rng.uniform(0, 100, (5, 2))
    b2 = np.concatenate([b2, b2 + rng.uniform(1, 50, (5, 2))], axis=1)
    got = np.asarray(B.box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, _np_iou(b1, b2), rtol=1e-5)


def test_box_format_roundtrip(rng):
    b = rng.uniform(0, 100, (6, 4)).astype(np.float32)
    b[:, 2:] = b[:, :2] + np.abs(b[:, 2:])
    back = B.box_cxcywh_to_xyxy(B.box_xyxy_to_cxcywh(jnp.asarray(b)))
    np.testing.assert_allclose(np.asarray(back), b, rtol=1e-5, atol=1e-4)


def test_uncrop_boxes_with_downscale():
    b = jnp.asarray([[10.0, 20.0, 30.0, 40.0]])
    out = B.uncrop_boxes_xyxy(b, [100, 200, 500, 600], downscale=0.5)
    np.testing.assert_allclose(np.asarray(out), [[120.0, 240.0, 160.0, 280.0]])


def test_is_box_near_crop_edge_noop_for_full_image_crop():
    # With crop == image box, near-crop-edge implies near-image-edge, so the
    # filter should never fire (crowdsam/model.py single-crop default path).
    b = jnp.asarray([[0.0, 0.0, 50.0, 50.0], [500.0, 300.0, 1000.0, 600.0]])
    out = B.is_box_near_crop_edge(b, [0, 0, 1000, 600], [0, 0, 1000, 600], 1.0)
    assert not np.any(np.asarray(out))


def test_is_box_near_crop_edge_fires_for_inner_crop():
    b = jnp.asarray([[0.0, 100.0, 50.0, 200.0]])  # touches crop left edge
    out = B.is_box_near_crop_edge(b, [300, 0, 800, 600], [0, 0, 1000, 600], 1.0)
    assert np.asarray(out)[0]


def test_mask_iou_and_coverage():
    m1 = jnp.zeros((1, 10, 10), bool).at[:, :5, :].set(True)
    m2 = jnp.zeros((1, 10, 10), bool).at[:, 3:8, :].set(True)
    iou = np.asarray(B.mask_iou(m1, m2))[0]
    assert abs(iou - 20 / 80) < 1e-6
    cov = np.asarray(B.coverage(m1.astype(np.float32), m2.astype(np.float32)))[0]
    assert abs(cov - 20 / 50) < 1e-6

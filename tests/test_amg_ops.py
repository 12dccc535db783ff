"""AMG math: stability score, mask->box, grids, crop boxes, MaskData."""

import numpy as np
import jax.numpy as jnp

from crowdsam_tpu.ops import amg


def test_stability_score():
    logits = jnp.asarray(
        np.linspace(-3, 3, 64, dtype=np.float32).reshape(1, 8, 8)
    )
    s = np.asarray(amg.calculate_stability_score(logits, 0.0, 1.0))
    hi = (np.asarray(logits) > 1.0).sum()
    lo = (np.asarray(logits) > -1.0).sum()
    np.testing.assert_allclose(s, [hi / lo], rtol=1e-6)


def test_batched_mask_to_box(rng):
    masks = np.zeros((3, 32, 40), dtype=bool)
    masks[0, 5:10, 7:20] = True       # box [7, 5, 19, 9]
    masks[1, 0, 0] = True             # single pixel -> [0, 0, 0, 0]? no: [0,0,0,0] is also empty-code
    masks[2] = False                  # empty -> [0,0,0,0]
    out = np.asarray(amg.batched_mask_to_box(jnp.asarray(masks)))
    np.testing.assert_array_equal(out[0], [7, 5, 19, 9])
    np.testing.assert_array_equal(out[1], [0, 0, 0, 0])
    np.testing.assert_array_equal(out[2], [0, 0, 0, 0])

    masks2 = np.zeros((1, 16, 16), dtype=bool)
    masks2[0, 3, 4] = True
    out2 = np.asarray(amg.batched_mask_to_box(jnp.asarray(masks2)))
    np.testing.assert_array_equal(out2[0], [4, 3, 4, 3])


def test_build_point_grid():
    g = amg.build_point_grid(4)
    assert g.shape == (16, 2)
    assert abs(g[0, 0] - 1 / 8) < 1e-9
    assert abs(g[-1, 1] - 7 / 8) < 1e-9


def test_generate_crop_boxes_zero_layers():
    boxes, layers = amg.generate_crop_boxes((600, 800), 0, 0.341)
    assert boxes == [[0, 0, 800, 600]]
    assert layers == [0]


def test_generate_crop_boxes_one_layer():
    boxes, layers = amg.generate_crop_boxes((600, 800), 1, 512 / 1500)
    assert len(boxes) == 5 and layers == [0, 1, 1, 1, 1]
    for x0, y0, x1, y1 in boxes:
        assert 0 <= x0 < x1 <= 800 and 0 <= y0 < y1 <= 600


def test_maskdata_filter_cat():
    d = amg.MaskData(a=np.arange(5), b=[10, 11, 12, 13, 14])
    d.filter(np.array([True, False, True, False, True]))
    np.testing.assert_array_equal(d["a"], [0, 2, 4])
    assert d["b"] == [10, 12, 14]
    d2 = amg.MaskData(a=np.array([9]), b=[99])
    d.cat(d2)
    np.testing.assert_array_equal(d["a"], [0, 2, 4, 9])
    assert d["b"] == [10, 12, 14, 99]


def test_uncrop_masks_pad():
    m = jnp.ones((2, 4, 4), dtype=bool)
    out = np.asarray(amg.uncrop_masks(m, [2, 1, 6, 5], 8, 10))
    assert out.shape == (2, 8, 10)
    assert out[:, 1:5, 2:6].all()
    assert out.sum() == 2 * 16

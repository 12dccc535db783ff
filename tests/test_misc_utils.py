"""Misc utility surface (reference crowdsam/utils.py leftovers)."""

import numpy as np

from crowdsam_tpu.utils.misc import (
    average_metric,
    clustering_matched_points,
    composite_clustering,
    coords2mask,
    is_validbox,
    mask2coord,
    select_box,
)


def test_select_box_and_validity():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 5, 5], [0, 0, 20, 20]], float)
    assert select_box(boxes, "big") == 2
    assert select_box(boxes, "small") == 1
    assert is_validbox([0, 0, 1, 1]) and not is_validbox([5, 5, 5, 6])


def test_average_metric():
    assert average_metric([{"ap": 0.5}, {"ap": 0.7}], "ap") == 0.6


def test_mask_coord_roundtrip():
    m = np.zeros((6, 8), bool)
    m[2, 3] = m[4, 5] = True
    coords = mask2coord(m)  # (row, col)
    assert coords.shape == (2, 2)
    back = coords2mask(coords[:, ::-1])  # xy input
    assert back[2, 3] and back[4, 5]


def test_clustering(rng):
    a = rng.normal((0, 0), 0.5, (30, 2))
    b = rng.normal((10, 10), 0.5, (30, 2))
    cents = clustering_matched_points(np.concatenate([a, b]), 2)
    cents = cents[np.argsort(cents[:, 0])]
    assert np.abs(cents[0] - 0).max() < 1.5
    assert np.abs(cents[1] - 10).max() < 1.5
    multi = composite_clustering(np.concatenate([a, b]), [1, 2])
    assert multi[0].shape == (1, 2) and multi[1].shape == (2, 2)
    assert clustering_matched_points(np.zeros((0, 2)), 3).shape == (0, 2)

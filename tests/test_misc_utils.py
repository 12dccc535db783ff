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


def test_probe_pair_analyzer_matching():
    """tools/analyze_probe_pairs.py greedy matcher: pairs highest-IoU boxes
    once each, reports unmatched counts (offline evidence tool for
    PARITY.md's matched-pair decomposition)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "analyze_probe_pairs",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "analyze_probe_pairs.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    a = [{"image_id": 0, "bbox": [0, 0, 10, 10], "score": 0.9},
         {"image_id": 0, "bbox": [50, 50, 10, 10], "score": 0.8},
         {"image_id": 1, "bbox": [5, 5, 10, 10], "score": 0.7}]
    b = [{"image_id": 0, "bbox": [1, 0, 10, 10], "score": 0.85},
         {"image_id": 1, "bbox": [40, 40, 8, 8], "score": 0.6}]
    s = mod.match_pair(a, b)
    assert s["n_a"] == 3 and s["n_b"] == 2
    assert s["n_matched"] == 1  # only the (0,0,10,10)~(1,0,10,10) pair
    assert 0.8 < s["iou_mean"] < 0.85
    # identical sets -> perfect match stats
    s2 = mod.match_pair(a, a)
    assert s2["n_matched"] == 3 and s2["iou_mean"] == 1.0
    assert s2["score_absdiff_max"] == 0.0

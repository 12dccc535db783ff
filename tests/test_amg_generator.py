"""SamAutomaticMaskGenerator on a tiny model: record contract + modes."""

import numpy as np
import jax.numpy as jnp
import pytest

from crowdsam_tpu.models.build import sam_model_registry
from crowdsam_tpu.pipeline.amg_generator import SamAutomaticMaskGenerator


@pytest.fixture(scope="module")
def tiny_sam():
    return sam_model_registry["vit_tiny"](n_class=1, dtype=jnp.float32)


def test_amg_generate_records(tiny_sam, rng):
    gen = SamAutomaticMaskGenerator(
        tiny_sam, points_per_side=4, points_per_batch=8,
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
        min_mask_region_area=10,
    )
    image = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    anns = gen.generate(image)
    assert isinstance(anns, list)
    if anns:
        a = anns[0]
        assert set(a) == {"segmentation", "area", "bbox", "predicted_iou",
                          "point_coords", "stability_score", "crop_box"}
        assert a["segmentation"].shape == (96, 128)
        assert len(a["bbox"]) == 4
        assert a["crop_box"] == [0.0, 0.0, 128.0, 96.0]


def test_amg_coco_rle_mode(tiny_sam, rng):
    gen = SamAutomaticMaskGenerator(
        tiny_sam, points_per_side=3, points_per_batch=9,
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
        output_mode="coco_rle",
    )
    image = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    anns = gen.generate(image)
    if anns:
        from crowdsam_tpu.ops.rle import coco_decode_rle

        seg = anns[0]["segmentation"]
        assert isinstance(seg["counts"], str)
        assert coco_decode_rle(seg).shape == (64, 64)


def test_compat_namespace():
    from crowdsam_tpu.segment_anything_cs import (  # noqa: F401
        SamAutomaticMaskGenerator as G,
        SamPredictor,
        sam_model_registry as reg,
    )

    assert "vit_l" in reg

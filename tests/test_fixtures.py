"""Synthetic 10-shot fixture generator (utils/fixtures.py) sanity tests:
schema matches the reference's bundled train_crowdhuman_10shot.json
(images/annotations/categories keys, xywh int boxes, person category 1)."""

import json
import os

import numpy as np


def test_ten_shot_schema_and_loadability(ten_shot_root):
    coco = json.load(open(os.path.join(
        ten_shot_root, "train_crowdhuman_10shot.json")))
    assert set(coco) == {"images", "annotations", "categories"}
    assert len(coco["images"]) == 10
    assert coco["categories"][0] == {
        "supercategory": "person", "id": 1, "name": "person"}
    for im in coco["images"]:
        assert set(im) == {"file_name", "height", "width", "id"}
        assert os.path.exists(os.path.join(ten_shot_root, "Images",
                                           im["file_name"]))
    sizes = {im["id"]: (im["width"], im["height"]) for im in coco["images"]}
    per_image = {}
    for ann in coco["annotations"]:
        assert set(ann) == {"category_id", "bbox", "image_id", "iscrowd",
                            "area", "id", "ignore"}
        x, y, w, h = ann["bbox"]
        W, H = sizes[ann["image_id"]]
        assert 0 <= x and 0 <= y and x + w <= W and y + h <= H
        assert ann["area"] == w * h
        per_image.setdefault(ann["image_id"], 0)
        per_image[ann["image_id"]] += 1
    # CrowdHuman-like crowd density: every image has a crowd of people.
    assert all(v >= 18 for v in per_image.values())


def test_dataset_reads_fixtures(ten_shot_root):
    from crowdsam_tpu.train.dataset import CrowdHumanDataset

    ds = CrowdHumanDataset(
        ten_shot_root, os.path.join(ten_shot_root,
                                    "train_crowdhuman_10shot.json"))
    assert len(ds) == 10
    img, boxes = ds[0]
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    assert (boxes >= 0).all() and (boxes <= 1).all()
    assert (boxes[:, 2:] >= boxes[:, :2]).all()


def test_generate_deterministic(tmp_path):
    from crowdsam_tpu.utils.fixtures import generate_ten_shot

    a = generate_ten_shot(str(tmp_path / "a"), n_images=2, seed=7)
    b = generate_ten_shot(str(tmp_path / "b"), n_images=2, seed=7)
    ja = json.load(open(os.path.join(a, "train_crowdhuman_10shot.json")))
    jb = json.load(open(os.path.join(b, "train_crowdhuman_10shot.json")))
    assert ja == jb

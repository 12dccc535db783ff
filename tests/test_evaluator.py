"""Evaluator: property tests + cross-check vs the reference eval module
(pure numpy, imported read-only as oracle)."""

import importlib.util
import json
import sys

import numpy as np
import pytest

from crowdsam_tpu.evallib.crowdhuman import (
    Database,
    evaluate_predictions_on_crowdhuman,
)


def _make_synth(tmp_path, rng, n_images=6, with_ignore=True):
    """Synthetic COCO gt + det jsons with jittered TPs, FPs, ignore regions."""
    images, gt_annots, dt_annots = [], [], []
    aid = 0
    did = 0
    for img_id in range(n_images):
        w, h = 800, 600
        images.append({"id": img_id, "width": w, "height": h,
                       "file_name": f"{img_id}.jpg"})
        n_gt = rng.integers(2, 6)
        for g in range(n_gt):
            x, y = rng.uniform(0, 600), rng.uniform(0, 400)
            bw, bh = rng.uniform(40, 150), rng.uniform(80, 190)
            ignore = 1 if (with_ignore and g == 0 and img_id % 3 == 0) else 0
            gt_annots.append({"image_id": img_id, "bbox": [x, y, bw, bh],
                              "id": aid, "category_id": 1, "ignore": ignore,
                              "area": bw * bh, "iscrowd": False})
            aid += 1
            # jittered TP detection for non-ignored gts (some missed)
            if not ignore and rng.uniform() > 0.2:
                jx, jy = rng.uniform(-8, 8), rng.uniform(-8, 8)
                dt_annots.append(
                    {"image_id": img_id, "bbox": [x + jx, y + jy, bw, bh],
                     "id": did, "category_id": 1,
                     "score": float(rng.uniform(0.5, 1.0)), "area": bw * bh,
                     "iscrowd": False})
                did += 1
        # false positives
        for _ in range(rng.integers(0, 3)):
            x, y = rng.uniform(0, 700), rng.uniform(0, 500)
            dt_annots.append(
                {"image_id": img_id, "bbox": [x, y, 30, 40], "id": did,
                 "category_id": 1, "score": float(rng.uniform(0.0, 0.6)),
                 "area": 1200, "iscrowd": False})
            did += 1
    cats = [{"id": 1, "name": "person", "supercategory": "person"}]
    gt = {"images": images, "annotations": gt_annots, "categories": cats}
    dt = {"images": images, "annotations": dt_annots, "categories": cats}
    gt_path, dt_path = tmp_path / "gt.json", tmp_path / "dt.json"
    gt_path.write_text(json.dumps(gt))
    dt_path.write_text(json.dumps(dt))
    return str(gt_path), str(dt_path)


def _load_ref_eval():
    spec = importlib.util.spec_from_file_location(
        "refeval", "/root/reference/tools/crowdhuman_eval.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refeval"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_matches_reference_evaluator(tmp_path, rng):
    gt_path, dt_path = _make_synth(tmp_path, rng)
    ref = _load_ref_eval()
    ref.gt_path = gt_path  # reference Database reads the module global (:367)
    want = ref._evaluate_predictions_on_crowdhuman(
        gt_path, dt_path, remove_empty_gt=True, visible_flag=True
    )
    got = evaluate_predictions_on_crowdhuman(
        gt_path, dt_path, remove_empty_gt=True, visible_flag=True
    )
    # (AP, MR, Recall, tp, fp)
    assert got[3] == want[3] and got[4] == want[4]
    np.testing.assert_allclose(got[0], want[0], atol=1e-9)
    np.testing.assert_allclose(got[1], want[1], atol=1e-9)
    np.testing.assert_allclose(got[2], want[2], atol=1e-9)


def test_perfect_predictions(tmp_path, rng):
    gt_path, dt_path = _make_synth(tmp_path, rng, with_ignore=False)
    # perfect detector: detections == gt boxes with score 1
    gt = json.loads(open(gt_path).read())
    dt = dict(gt)
    dt_annots = []
    for i, a in enumerate(gt["annotations"]):
        d = dict(a)
        d["score"] = 1.0
        d["id"] = i
        dt_annots.append(d)
    dt["annotations"] = dt_annots
    dtp = str(tmp_path / "dt_perfect.json")
    open(dtp, "w").write(json.dumps(dt))
    ap, mr, recall, tp, fp = evaluate_predictions_on_crowdhuman(gt_path, dtp)
    assert recall == 1.0 and fp == 0
    # The reference's trapezoid integration skips the first segment, so a
    # perfect detector scores (N-1)/N, not 1.0 (crowdhuman_eval.py:508-515).
    assert ap == pytest.approx((tp - 1) / tp)
    assert mr < 1e-6


def test_all_wrong(tmp_path, rng):
    gt_path, dt_path = _make_synth(tmp_path, rng, with_ignore=False)
    gt = json.loads(open(gt_path).read())
    dt = dict(gt)
    dt["annotations"] = [
        {"image_id": im["id"], "bbox": [790, 590, 5, 5], "id": i,
         "category_id": 1, "score": 0.9, "area": 25, "iscrowd": False}
        for i, im in enumerate(gt["images"])
    ]
    dtp = str(tmp_path / "dt_bad.json")
    open(dtp, "w").write(json.dumps(dt))
    ap, mr, recall, tp, fp = evaluate_predictions_on_crowdhuman(gt_path, dtp)
    assert ap == 0.0 and tp == 0 and mr == pytest.approx(1.0)


def test_ignore_region_suppresses_fp(tmp_path):
    """A detection covered by an ignore gt must not count as FP."""
    images = [{"id": 0, "width": 100, "height": 100, "file_name": "0.jpg"}]
    gt = {"images": images, "categories": [],
          "annotations": [
              {"image_id": 0, "bbox": [10, 10, 30, 30], "id": 0,
               "category_id": 1, "ignore": 0, "area": 900, "iscrowd": False},
              {"image_id": 0, "bbox": [60, 60, 30, 30], "id": 1,
               "category_id": 1, "ignore": 1, "area": 900, "iscrowd": False},
          ]}
    dt = {"images": images, "categories": [],
          "annotations": [
              {"image_id": 0, "bbox": [11, 11, 30, 30], "id": 0,
               "category_id": 1, "score": 0.9, "area": 900, "iscrowd": False},
              {"image_id": 0, "bbox": [62, 62, 28, 28], "id": 1,
               "category_id": 1, "score": 0.8, "area": 784, "iscrowd": False},
          ]}
    gtp, dtp = tmp_path / "g.json", tmp_path / "d.json"
    gtp.write_text(json.dumps(gt))
    dtp.write_text(json.dumps(dt))
    ap, mr, recall, tp, fp = evaluate_predictions_on_crowdhuman(str(gtp), str(dtp))
    assert tp == 1 and fp == 0 and recall == 1.0


def test_odgt_ground_truth(tmp_path):
    odgt = {
        "ID": "img0", "width": 200, "height": 200,
        "gtboxes": [
            {"tag": "person", "vbox": [10, 10, 40, 60], "fbox": [8, 8, 44, 70],
             "extra": {}},
            {"tag": "mask", "vbox": [100, 100, 30, 30], "fbox": [100, 100, 30, 30],
             "extra": {"ignore": 1}},
        ],
    }
    gtp = tmp_path / "g.odgt"
    gtp.write_text(json.dumps([odgt]))
    dt = {"images": [{"id": "img0", "width": 200, "height": 200,
                      "file_name": "img0.jpg"}],
          "categories": [],
          "annotations": [
              {"image_id": "img0", "bbox": [11, 11, 40, 60], "id": 0,
               "category_id": 1, "score": 0.9, "area": 2400, "iscrowd": False}
          ]}
    dtp = tmp_path / "d.json"
    dtp.write_text(json.dumps(dt))
    ap, mr, recall, tp, fp = evaluate_predictions_on_crowdhuman(
        str(gtp), str(dtp), visible_flag=True
    )
    assert tp == 1 and fp == 0
    db = Database(str(gtp), str(dtp), visible_flag=True)
    assert db.gt_num == 2 and db.ign_num == 1


# ---------------------------------------------------------------- modes 1/2
def _joint_odgt(tmp_path):
    """Two-image odgt gt with head boxes: img0 has two valid persons plus a
    head-ignored person; img1 has an extra-ignored person."""
    recs = [
        {"ID": "img0", "width": 400, "height": 300, "gtboxes": [
            {"tag": "person", "vbox": [10, 10, 60, 120],
             "fbox": [10, 10, 60, 120], "hbox": [25, 10, 30, 30],
             "extra": {}, "head_attr": {}},
            {"tag": "person", "vbox": [200, 50, 50, 110],
             "fbox": [200, 50, 50, 110], "hbox": [210, 50, 28, 28],
             "extra": {}, "head_attr": {}},
            {"tag": "person", "vbox": [300, 100, 40, 100],
             "fbox": [300, 100, 40, 100], "hbox": [305, 100, 24, 24],
             "extra": {}, "head_attr": {"ignore": 1}},
        ]},
        {"ID": "img1", "width": 400, "height": 300, "gtboxes": [
            {"tag": "person", "vbox": [50, 50, 70, 140],
             "fbox": [50, 50, 70, 140], "hbox": [70, 50, 32, 32],
             "extra": {"ignore": 1}, "head_attr": {}},
        ]},
    ]
    gtp = tmp_path / "joint.odgt"
    gtp.write_text("\n".join(json.dumps(r) for r in recs))
    return str(gtp)


def _dt_json(tmp_path, per_image):
    images, annots = [], []
    did = 0
    for iid, dets in per_image.items():
        images.append({"id": iid, "width": 400, "height": 300,
                       "file_name": f"{iid}.jpg"})
        for d in dets:
            d = dict(d, image_id=iid, id=did, category_id=1,
                     iscrowd=False, area=1)
            annots.append(d)
            did += 1
    p = tmp_path / "dt.json"
    p.write_text(json.dumps(
        {"images": images, "annotations": annots, "categories": []}))
    return str(p)


def test_mode1_head_boxes(tmp_path):
    """Head-box eval: gt = hbox rows; head_attr.ignore makes an ignore
    region that suppresses otherwise-unmatched detections by IoA."""
    gtp = _joint_odgt(tmp_path)
    dtp = _dt_json(tmp_path, {
        "img0": [
            # matches person-1 head
            {"bbox": [26, 11, 30, 30], "hbox": [26, 11, 30, 30], "score": 0.9},
            # inside the head-ignored person's hbox -> suppressed
            {"bbox": [306, 101, 22, 22], "hbox": [306, 101, 22, 22],
             "score": 0.8},
            # plain FP
            {"bbox": [100, 200, 25, 25], "hbox": [100, 200, 25, 25],
             "score": 0.7},
        ],
        "img1": [],
    })
    ap, mr, recall, tp, fp = evaluate_predictions_on_crowdhuman(
        gtp, dtp, mode=1, visible_flag=True)
    assert (tp, fp) == (1, 1)
    db = Database(gtp, dtp, mode=1, visible_flag=True)
    # img0: 2 valid heads + 1 ignored; img1: extra-ignored -> head ignored
    assert db.gt_num == 4 and db.ign_num == 2
    assert recall == 1 / 2


def test_mode2_joint_union_matching(tmp_path):
    """Joint body+head Caltech-union matching: a detection is TP only when
    BOTH boxes match the same gt above threshold; body-only overlap is FP;
    detections landing on an extra-ignored gt body are dropped."""
    gtp = _joint_odgt(tmp_path)
    dtp = _dt_json(tmp_path, {
        "img0": [
            # body+head both match person-1 -> TP
            {"bbox": [11, 11, 60, 120], "hbox": [26, 11, 30, 30],
             "score": 0.9},
            # body matches person-2 but head displaced -> FP
            {"bbox": [201, 51, 50, 110], "hbox": [160, 50, 28, 28],
             "score": 0.8},
        ],
        "img1": [
            # body IoA with the extra-ignored gt -> dropped (not FP)
            {"bbox": [55, 55, 60, 120], "hbox": [72, 52, 32, 32],
             "score": 0.7},
        ],
    })
    ap, mr, recall, tp, fp = evaluate_predictions_on_crowdhuman(
        gtp, dtp, mode=2, visible_flag=True)
    assert (tp, fp) == (1, 1)
    db = Database(gtp, dtp, mode=2, visible_flag=True)
    # joint tag: img0 persons 1,2 valid, person 3 head-ignored -> tag 0;
    # img1 extra-ignored -> tag 0
    assert db.gt_num == 4 and db.ign_num == 2


def test_mode2_each_gt_matches_once(tmp_path):
    """Union matching consumes a gt: the second detection on the same
    person is an FP even with perfect overlap."""
    gtp = _joint_odgt(tmp_path)
    det = {"bbox": [10, 10, 60, 120], "hbox": [25, 10, 30, 30]}
    dtp = _dt_json(tmp_path, {
        "img0": [dict(det, score=0.9), dict(det, score=0.8)],
        "img1": [],
    })
    _, _, _, tp, fp = evaluate_predictions_on_crowdhuman(
        gtp, dtp, mode=2, visible_flag=True)
    assert (tp, fp) == (1, 1)

"""CrowdHuman evaluator: AP / Caltech log-average miss rate / Recall.

Behavioural contract: reference `tools/crowdhuman_eval.py`:
- per-image greedy Caltech matching at IoU 0.5, score-descending, with
  ignore regions suppressing unmatched detections by IoA (:113-143);
- detections loaded from COCO-style json (boxes clipped to image bounds,
  :223-243), ground truth from COCO json (`ignore` field) or .odgt records
  (vbox when visible_flag, ignore via extra.ignore, :245-279);
- AP by trapezoidal integration over the global score-sorted PR curve
  (:503-548); MR as exp(mean(log(miss rate))) at Caltech fppi anchors
  (:452-501); `remove_empty_gt` actually drops images without detections
  (:376-378 — quirk preserved).

Pure numpy; no torch/torchvision/pycocotools dependency.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

PERSON_CLASSES = ["background", "person"]

CALTECH_REFS = {
    "CALTECH_-2": [0.0100, 0.0178, 0.03160, 0.0562, 0.1000, 0.1778, 0.3162,
                   0.5623, 1.000],
    "CALTECH_-4": [0.0001, 0.0003, 0.00100, 0.0032, 0.0100, 0.0316, 0.1000,
                   0.3162, 1.000],
}


def box_overlap(dboxes: np.ndarray, gboxes: np.ndarray, if_iou: bool) -> np.ndarray:
    """Pairwise IoU (if_iou) or IoA-over-detection matrix (reference :202-221)."""
    eps = 1e-6
    n, k = len(dboxes), len(gboxes)
    if n == 0 or k == 0:
        return np.zeros((n, k))
    iw = np.minimum(dboxes[:, None, 2], gboxes[None, :, 2]) - np.maximum(
        dboxes[:, None, 0], gboxes[None, :, 0]
    )
    ih = np.minimum(dboxes[:, None, 3], gboxes[None, :, 3]) - np.maximum(
        dboxes[:, None, 1], gboxes[None, :, 1]
    )
    inter = np.maximum(0, iw) * np.maximum(0, ih)
    darea = (dboxes[:, None, 2] - dboxes[:, None, 0]) * (
        dboxes[:, None, 3] - dboxes[:, None, 1]
    )
    if if_iou:
        garea = (gboxes[None, :, 2] - gboxes[None, :, 0]) * (
            gboxes[None, :, 3] - gboxes[None, :, 1]
        )
        return inter / (darea + garea - inter + eps)
    return inter / (darea + eps)


class ImageEval:
    """Per-image det/gt record (reference `Image`, :15-111)."""

    def __init__(self):
        self.ID = None
        self.width: Optional[float] = None
        self.height: Optional[float] = None
        self.gtboxes: Optional[np.ndarray] = None  # (N, 5) xyxy + tag(1/-1)
        self.dtboxes: Optional[np.ndarray] = None  # (M, 5) xyxy + score
        self.ign_num = 0
        self.gt_num = 0

    # ---- loading ----------------------------------------------------------
    def load_cocojson_gt(self, img_item: dict, annots: List[dict]):
        self.ID = img_item["id"]
        self.width = img_item.get("width")
        self.height = img_item.get("height")
        boxes = np.array([a["bbox"] for a in annots], dtype=np.float64).reshape(-1, 4)
        if len(boxes):
            boxes[:, 2:4] += boxes[:, :2]
        if annots and "ignore" in annots[0]:
            ignore = np.array([a["ignore"] for a in annots], dtype=np.float64)
            tag = np.where(ignore == 1, -1.0, 1.0)
        else:
            tag = np.ones(len(boxes))
        self.gtboxes = np.concatenate([boxes, tag[:, None]], axis=1)
        self.gt_num = len(boxes)
        self.ign_num = int((tag == -1).sum())

    def load_cocojson_dt(self, annots: List[dict]):
        boxes = np.array([a["bbox"] for a in annots], dtype=np.float64).reshape(-1, 4)
        if len(boxes):
            boxes[:, 2:4] += boxes[:, :2]
        if annots and "score" in annots[0]:
            scores = np.array([a["score"] for a in annots], dtype=np.float64)
        else:
            scores = np.ones(len(boxes))
        self.dtboxes = np.concatenate([boxes, scores[:, None]], axis=1)
        self.clip_boxes()

    def load_odgt_gt(self, record: dict, visible_flag: bool = True):
        self.ID = record["ID"]
        self.width = record.get("width")
        self.height = record.get("height")
        rows = []
        for rb in record.get("gtboxes", []):
            tag = 1.0 if rb.get("tag") in PERSON_CLASSES else -1.0
            extra = rb.get("extra", {})
            if extra.get("ignore", 0) != 0:
                tag = -1.0
            box = rb["vbox"] if visible_flag else rb["fbox"]
            if isinstance(box[0], list):
                box = box[0]
            rows.append([box[0], box[1], box[0] + box[2], box[1] + box[3], tag])
        self.gtboxes = np.array(rows, dtype=np.float64).reshape(-1, 5)
        self.gt_num = len(rows)
        self.ign_num = int((self.gtboxes[:, 4] == -1).sum()) if len(rows) else 0

    def clip_boxes(self):
        if self.dtboxes is None or self.width is None or self.height is None:
            return
        b = self.dtboxes
        b[:, 0] = np.clip(b[:, 0], 0, self.width - 1)
        b[:, 1] = np.clip(b[:, 1], 0, self.height - 1)
        b[:, 2] = np.clip(b[:, 2], 0, self.width)
        b[:, 3] = np.clip(b[:, 3], 0, self.height)

    # ---- matching ---------------------------------------------------------
    def compare_caltech(self, thres: float) -> List[Tuple[float, int]]:
        """Greedy score-descending matching; returns (score, label) pairs
        where label 1 = TP, 0 = FP (ignored detections are dropped)."""
        if self.dtboxes is None or self.gtboxes is None:
            return []
        dt = self.dtboxes[np.argsort(-self.dtboxes[:, -1], kind="stable")]
        gt = self.gtboxes[np.argsort(-self.gtboxes[:, -1], kind="stable")]
        if len(dt) == 0 or len(gt) == 0:
            return []
        pos_gt = gt[gt[:, -1] > 0]
        ign_gt = gt[gt[:, -1] <= 0]
        overlap_iou = box_overlap(dt, pos_gt, True)
        overlap_ioa = box_overlap(dt, ign_gt, False)
        ign = (
            np.any(overlap_ioa > thres, axis=1)
            if ign_gt.shape[0]
            else np.zeros(len(dt), dtype=bool)
        )
        out = []
        for i in range(len(dt)):
            if pos_gt.shape[0]:
                maxpos = int(np.argmax(overlap_iou[i]))
                if overlap_iou[i, maxpos] > thres:
                    overlap_iou[:, maxpos] = 0
                    out.append((float(dt[i, -1]), 1, self.ID))
                    continue
            if not ign[i]:
                out.append((float(dt[i, -1]), 0, self.ID))
        return out


class Database:
    """Whole-dataset evaluation (reference `Database`, :360-548)."""

    def __init__(
        self,
        gt_path: str,
        dt_path: str,
        mode: int = 0,
        remove_empty_gt: bool = False,
        visible_flag: bool = False,
    ):
        assert mode == 0, "only body-box mode is supported"
        self.images: Dict = {}
        assert os.path.exists(gt_path), gt_path
        assert os.path.exists(dt_path), dt_path
        if ".json" in gt_path:
            self._load_json(gt_path, is_gt=True)
        elif ".odgt" in gt_path:
            self._load_odgt(gt_path, visible_flag=visible_flag)
        else:
            raise NotImplementedError(gt_path)
        self._load_json(dt_path, is_gt=False)

        if remove_empty_gt:
            self.images = {
                k: v for k, v in self.images.items() if v.dtboxes is not None
            }

        self.gt_num = sum(v.gt_num for v in self.images.values())
        self.ign_num = sum(v.ign_num for v in self.images.values())
        self.image_num = len(self.images)
        self.scorelist: Optional[list] = None

    def _load_json(self, path: str, is_gt: bool):
        records = json.load(open(path))
        annots = records["annotations"]
        image_ids = [it["id"] for it in records["images"]]
        assert len(image_ids) == len(set(image_ids)), "duplicate image ids"
        # annotations are contiguous per image in file order (reference :395-419)
        annot_id = 0
        for img_item in records["images"]:
            image_id = img_item["id"]
            k = 0
            while (
                annot_id + k < len(annots)
                and annots[annot_id + k]["image_id"] == image_id
            ):
                k += 1
            if is_gt:
                self.images[image_id] = ImageEval()
                self.images[image_id].load_cocojson_gt(
                    img_item, annots[annot_id : annot_id + k]
                )
            elif image_id in self.images:
                img = self.images[image_id]
                if img.width is None:
                    img.width = img_item.get("width")
                    img.height = img_item.get("height")
                img.load_cocojson_dt(annots[annot_id : annot_id + k])
            annot_id += k

    def _load_odgt(self, path: str, visible_flag: bool):
        with open(path) as f:
            lines = f.readlines()
        if len(lines) == 1:
            records = json.loads(lines[0])
        else:
            records = [json.loads(line) for line in lines]
        for record in records:
            img = ImageEval()
            img.load_odgt_gt(record, visible_flag=visible_flag)
            self.images[record["ID"]] = img

    def compare(self, thres: float = 0.5):
        scorelist = []
        for img in self.images.values():
            scorelist.extend(img.compare_caltech(thres))
        scorelist.sort(key=lambda x: x[0], reverse=True)
        self.scorelist = scorelist

    def eval_AP(self):
        """-> (AP, final recall, (fppi_list, missrate_list))."""
        if self.scorelist is None:
            self.compare()
        total_gt = self.gt_num - self.ign_num
        tp = fp = 0.0
        rpX, rpY, fppi, mr = [], [], [], []
        recall = 0.0
        for score, label, _ in self.scorelist:
            if label == 1:
                tp += 1
            else:
                fp += 1
            recall = tp / total_gt if total_gt > 0 else 0.0
            precision = tp / (tp + fp)
            rpX.append(recall)
            rpY.append(precision)
            fppi.append(fp / max(self.image_num, 1))
            mr.append(1 - recall)
        ap = 0.0
        for i in range(1, len(rpX)):
            ap += (rpX[i] - rpX[i - 1]) * (rpY[i - 1] + rpY[i]) / 2
        return ap, recall, (fppi, mr)

    def eval_MR(self, ref: str = "CALTECH_-2", fppiX=None, fppiY=None):
        """Caltech log-average miss rate; returns (MR, (tp, fp))."""
        if fppiX is None or fppiY is None:
            _, _, (fppiX, fppiY) = self.eval_AP()
        anchors = CALTECH_REFS[ref]

        def find_gt(lst, target):
            for idx, item in enumerate(lst):
                if item >= target:
                    return idx
            return len(lst) - 1

        score = [fppiY[find_gt(fppiX, a)] for a in anchors if len(fppiY)]
        mr_val = float(np.exp(np.log(np.maximum(score, 1e-12)).mean())) if score else 1.0
        tp = sum(1 for s in self.scorelist if s[1] == 1)
        fp = sum(1 for s in self.scorelist if s[1] == 0)
        return mr_val, (tp, fp)


def evaluate_predictions_on_crowdhuman(
    gt_path: str,
    dt_path: str,
    mode: int = 0,
    remove_empty_gt: bool = False,
    visible_flag: bool = False,
):
    """-> (AP, MR, Recall, tp, fp) (reference :551-559)."""
    db = Database(
        gt_path, dt_path, mode=mode,
        remove_empty_gt=remove_empty_gt, visible_flag=visible_flag,
    )
    db.compare()
    ap, recall, (fppiX, fppiY) = db.eval_AP()
    mr, (tp, fp) = db.eval_MR(fppiX=fppiX, fppiY=fppiY)
    return ap, mr, recall, tp, fp

"""CrowdHuman few-shot dataset (COCO json + images).

Behavioural contract: reference `tools/train.py:19-48` (boxes normalized by
image size, xywh -> xyxy)."""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np


class CrowdHumanDataset:
    def __init__(self, dataset_root: str, annot_path: str, img_dir: str = "Images"):
        self.dataset_root = dataset_root
        annots = json.load(open(annot_path))
        images = annots["images"]
        self.image_ids = [img["id"] for img in images]
        self.boxes = {}
        for annot in annots["annotations"]:
            self.boxes.setdefault(int(annot["image_id"]), []).append(annot["bbox"])
        self.image_files = [
            os.path.join(dataset_root, img_dir, img["file_name"]) for img in images
        ]

    def __len__(self) -> int:
        return len(self.image_files)

    def __getitem__(self, item: int) -> Tuple[np.ndarray, np.ndarray]:
        """-> (RGB uint8 image, normalized xyxy boxes)."""
        from PIL import Image

        img = np.array(Image.open(self.image_files[item]).convert("RGB"))
        h, w = img.shape[:2]
        boxes = np.asarray(self.boxes[self.image_ids[item]], dtype=np.float64)
        boxes = boxes / np.array([w, h, w, h])
        boxes[:, 2:] = boxes[:, :2] + boxes[:, 2:]
        return img, boxes

"""Self-contained 10-shot training fixture generator.

The reference ships a bundled 10-shot CrowdHuman subset
(`/root/reference/crowdhuman_train/`: 10 JPEGs + COCO-format
`train_crowdhuman_10shot.json`, 10 images / 277 person boxes) that
`tools/train.py` and `tools/demo.py` default to.  We do not vendor those
dataset images; instead this module synthesizes an equivalent COCO-format
10-shot set (person-shaped blobs on textured backgrounds, CrowdHuman-like
image sizes and crowd densities) so the train/demo CLIs run from a bare
checkout.  Schema matches the reference json exactly: images
{file_name,height,width,id}, annotations {category_id,bbox xywh,image_id,
iscrowd,area,id,ignore}, categories [person, mask].
"""

from __future__ import annotations

import json
import os

import numpy as np

ANNOT_NAME = "train_crowdhuman_10shot.json"
DEFAULT_ROOT = os.path.join("data", "crowdhuman_train")

# CrowdHuman-like (width, height) pairs.
_SIZES = [
    (1280, 720), (1024, 681), (1360, 907), (900, 675), (1280, 853),
    (1200, 800), (1024, 768), (1152, 864), (1280, 960), (1361, 768),
]


def _draw_person(img: np.ndarray, x: int, y: int, w: int, h: int,
                 rng: np.random.Generator) -> None:
    """Paint a person-ish silhouette (head ellipse + torso/leg rounded box)
    with a distinct colour so foreground/background contrast is high."""
    H, W = img.shape[:2]
    color = rng.integers(40, 255, size=3)
    yy, xx = np.mgrid[0:H, 0:W]
    # head: circle of radius ~w/4 centred near the top of the box
    hr = max(2, w // 4)
    hcx, hcy = x + w // 2, y + hr + 1
    head = (xx - hcx) ** 2 + (yy - hcy) ** 2 <= hr * hr
    # torso+legs: vertical ellipse filling the rest of the box
    tcy = y + 2 * hr + (h - 2 * hr) // 2
    a, b = max(2, w // 2), max(2, (h - 2 * hr) // 2)
    body = ((xx - hcx) / a) ** 2 + ((yy - tcy) / b) ** 2 <= 1.0
    m = head | body
    img[m] = (0.85 * color + 0.15 * img[m]).astype(np.uint8)


def generate_ten_shot(root: str, n_images: int = 10, seed: int = 0,
                      people_per_image: tuple = (18, 34)) -> str:
    """Write Images/*.jpg + train_crowdhuman_10shot.json under ``root``.

    Returns ``root``.  Deterministic for a given seed.  Person boxes use
    CrowdHuman-like aspect (~0.42 w/h) and size spread, with overlaps, so
    the 10-shot trainer sees a realistic crowded-pose distribution.
    """
    from PIL import Image

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "Images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for idx in range(n_images):
        W, H = _SIZES[idx % len(_SIZES)]
        # Textured background: smooth low-frequency noise.
        base = rng.integers(60, 180, size=(H // 32 + 2, W // 32 + 2, 3))
        img = np.kron(base, np.ones((32, 32, 1))).astype(np.float32)
        img = img[:H, :W]
        img += rng.normal(0, 6.0, size=img.shape)
        img = np.clip(img, 0, 255).astype(np.uint8)

        n_people = int(rng.integers(*people_per_image))
        for _ in range(n_people):
            h = int(rng.integers(max(40, H // 12), max(60, H // 3)))
            w = max(12, int(h * rng.uniform(0.34, 0.52)))
            x = int(rng.integers(0, max(1, W - w)))
            y = int(rng.integers(0, max(1, H - h)))
            _draw_person(img, x, y, w, h, rng)
            annotations.append({
                "category_id": 1,
                "bbox": [x, y, w, h],
                "image_id": idx,
                "iscrowd": False,
                "area": int(w * h),
                "id": ann_id,
                "ignore": 0,
            })
            ann_id += 1

        fname = f"synthetic_{idx:02d}.jpg"
        Image.fromarray(img).save(os.path.join(img_dir, fname), quality=90)
        images.append({"file_name": fname, "height": H, "width": W, "id": idx})

    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"supercategory": "person", "id": 1, "name": "person"},
            {"supercategory": "mask", "id": 2, "name": "mask"},
        ],
    }
    with open(os.path.join(root, ANNOT_NAME), "w") as f:
        json.dump(coco, f)
    return root


def ensure_ten_shot(root: str = DEFAULT_ROOT, logger=None) -> str:
    """Generate the synthetic 10-shot set under ``root`` if absent.

    Returns ``root``.  Used by tools/train.py and tools/demo.py as the
    fallback when the configured dataset paths do not exist, so both CLIs
    run from a bare checkout (reference bundles real data instead:
    crowdhuman_train/).
    """
    annot = os.path.join(root, ANNOT_NAME)
    if not os.path.exists(annot):
        if logger is not None:
            logger.warning(
                "dataset not found; generating synthetic 10-shot fixtures "
                "under %s", root,
            )
        generate_ten_shot(root)
    return root

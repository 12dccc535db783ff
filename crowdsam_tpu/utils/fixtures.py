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
                      people_per_image: tuple = (9, 47)) -> str:
    """Write Images/*.jpg + train_crowdhuman_10shot.json under ``root``.

    Returns ``root``.  Deterministic for a given seed.  Annotation
    statistics are matched to the REAL bundled 10-shot json
    (reference crowdhuman_train/train_crowdhuman_10shot.json, 277 boxes,
    measured once offline — see PARITY.md "fixture statistics"):
    - boxes/image 9..46, median 24  -> counts drawn uniform 9..46;
    - box height / image height p10/p50/p90 = 0.07/0.16/0.46
      -> lognormal(ln 0.16, 0.72), clipped to [0.05, 0.6];
    - aspect (w/h) p10/p50/p90 = 0.31/0.38/0.52 -> uniform 0.31..0.52;
    - 44% of boxes have an IoU>0.3 neighbour (crowding) -> every third
      box is a similar-sized companion jittered around the previous one
      instead of uniformly placed (measured on the generated set: 0.40).
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
        prev = None
        for pi in range(n_people):
            if prev is not None and pi % 3 == 1:
                # crowded pair: a similar-sized person jittered around the
                # previous one so the overlap fraction matches the real set
                # (~44% of boxes with an IoU>0.3 neighbour).
                px, py, pw, ph = prev
                h = max(24, int(ph * rng.uniform(0.85, 1.15)))
                w = max(10, int(h * rng.uniform(0.31, 0.52)))
                x = int(np.clip(px + rng.integers(-pw, pw + 1),
                                0, max(1, W - w)))
                y = int(np.clip(py + rng.integers(-ph // 6, ph // 6 + 1),
                                0, max(1, H - h)))
            else:
                rel_h = float(np.clip(rng.lognormal(np.log(0.16), 0.72),
                                      0.05, 0.6))
                h = max(24, int(rel_h * H))
                w = max(10, int(h * rng.uniform(0.31, 0.52)))
                x = int(rng.integers(0, max(1, W - w)))
                y = int(rng.integers(0, max(1, H - h)))
            prev = (x, y, w, h)
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

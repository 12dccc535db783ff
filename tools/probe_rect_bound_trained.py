"""Re-establish the rect-encode metric bound under the TRAINED fixture.

VERDICT r3 #7: the 0.997 cross-AP bound for the opt-in rect encode
(PARITY.md #9, tests/test_ap_parity.py::test_ap_parity_rect_encode_vs_square)
was measured under random amplified weights.  The bench now operates at the
calibrated trained-fixture point (committed decoders under
adapter_weights/), where mask boundaries carry real person shapes — the
regime where the rect band-edge deviation
(/root/reference/segment_anything_cs/modeling/image_encoder.py:83-86
global-attention semantics over the square pad) could actually move the
metric.

Two comparisons on full-size (683x1024) crowd scenes at the UNMODIFIED
reference thresholds:

1. shipping configs — square model + square-trained decoder vs rect model
   + rect-trained decoder (each mode with its own committed fixture, as
   the bench runs them);
2. shared decoder — the square-trained decoder installed in BOTH models,
   isolating the encode deviation from decoder-weight differences.

Each pair is scored both directions (A's detections as GT for B's and
vice versa) with the first-party CrowdHuman evaluator at 0.5 IoU.

Run on TPU: python tools/probe_rect_bound_trained.py [n_scenes]
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crowdsam_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()

import numpy as np


def _to_coco_dt(image_id, boxes, scores, min_wh=4.0):
    out = []
    for b, s in zip(np.asarray(boxes, np.float64),
                    np.asarray(scores, np.float64)):
        out.append({
            "image_id": int(image_id),
            "bbox": [float(b[0]), float(b[1]),
                     max(float(b[2] - b[0]), min_wh),
                     max(float(b[3] - b[1]), min_wh)],
            "score": float(s),
            "category_id": 1,
        })
    return out


def _write_coco(path, images, annots, with_scores):
    annots = [dict(a) for a in annots]
    for i, a in enumerate(annots):
        a["id"] = i + 1
        if not with_scores:
            a.pop("score", None)
    json.dump({"images": images, "annotations": annots,
               "categories": [{"id": 1, "name": "person"}]}, open(path, "w"))


def _cross_ap(tmpdir, tag, images_meta, dt_a, dt_b):
    from crowdsam_tpu.evallib.crowdhuman import (
        evaluate_predictions_on_crowdhuman)

    out = {}
    for name, gt, dt in ((f"{tag}:a_gt", dt_a, dt_b),
                         (f"{tag}:b_gt", dt_b, dt_a)):
        gt_path = os.path.join(tmpdir, f"gt_{name.replace(':', '_')}.json")
        dt_path = os.path.join(tmpdir, f"dt_{name.replace(':', '_')}.json")
        _write_coco(gt_path, images_meta, gt, with_scores=False)
        _write_coco(dt_path, images_meta, dt, with_scores=True)
        ap, mr, recall, _, _ = evaluate_predictions_on_crowdhuman(
            gt_path, dt_path)
        out[name] = {"ap": round(ap, 4), "recall": round(recall, 4)}
    return out


def main():
    n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from crowdsam_tpu.config import load_config, modify_config
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM
    from crowdsam_tpu.utils.bench_fixture import (
        crowd_scene, train_or_load_decoder)

    recipe = "train.hard_neg_frac=0.5,train.neg_hinge_weight=16"
    models = {}
    for label, rect in (("square", "False"), ("rect", "True")):
        cfg = modify_config(load_config("configs/crowdhuman.yaml"), [
            "model.sam_checkpoint", "", "model.dino_checkpoint", "",
            "model.sam_adapter_checkpoint", "",
            "tpu.rect_encode", rect,
        ])
        m = CrowdSAM(cfg)
        meta = train_or_load_decoder(m, steps=800, lr=2e-4, recipe=recipe)
        assert meta.get("trained_cache") in ("committed", "hit"), (
            "refusing to train at probe time; commit the fixture first",
            meta)
        models[label] = m
        print(f"# {label}: fixture {meta}", file=sys.stderr)

    scenes = [crowd_scene(t) for t in range(n_scenes)]
    images_meta = [
        {"id": t, "file_name": f"im{t}.jpg",
         "height": img.shape[0], "width": img.shape[1]}
        for t, (img, _) in enumerate(scenes)
    ]

    def collect(model):
        dts, counts = [], []
        for t, (img, _) in enumerate(scenes):
            d = model.generate(img)
            dts += _to_coco_dt(t, d["boxes"], d["scores"])
            counts.append(len(d["boxes"]))
        return dts, counts

    with tempfile.TemporaryDirectory() as tmpdir:
        # 1. shipping configs: each mode with its own trained decoder.
        dt_sq, n_sq = collect(models["square"])
        dt_re, n_re = collect(models["rect"])
        ship = _cross_ap(tmpdir, "ship", images_meta, dt_sq, dt_re)

        # 2. shared decoder: square-trained decoder in both models.
        models["rect"].sam.params["mask_decoder"] = \
            models["square"].sam.params["mask_decoder"]
        dt_re2, n_re2 = collect(models["rect"])
        shared = _cross_ap(tmpdir, "shared", images_meta, dt_sq, dt_re2)

    print(json.dumps({
        "scenes": n_scenes,
        "detections": {"square": n_sq, "rect_own": n_re,
                       "rect_shared_decoder": n_re2},
        "shipping_configs": ship,
        "shared_decoder": shared,
    }, indent=1))


if __name__ == "__main__":
    main()

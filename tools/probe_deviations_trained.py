"""Re-establish EVERY remaining PARITY deviation bound at the trained
operating point (VERDICT r4 #1 — the rect methodology, applied to the
shipping square path).

The r4 rect probe (tools/probe_rect_bound_trained.py) showed the
random-amplified-weight regime under-estimates deviation effects: rect's
0.997 cross-AP bound collapsed to 0.58-0.64 under the trained fixture.
The four remaining documented deviations (PARITY.md #1/#3/#6/#7 — 256^2
cleanup, in-loop low-res stability/NMS boxes, quantized occupy pruning,
pad-region logits in stability) rested on the same weak regime.

This probe runs, on full-size (683x1024) crowd scenes at UNMODIFIED
reference thresholds with the committed trained decoder:

- the production engine (`CrowdSAM.generate`);
- the deviation-probe oracle (utils/deviation_probe.py) in parity mode
  (all documented deviations in effect — the noise floor: it should agree
  with the engine up to fused-decode numerics);
- the oracle with EACH deviation individually switched to exact reference
  semantics (attribution: parity vs parity+part isolates that part);
- the oracle in full-exact mode (the joint bound — reference
  `crowdsam/model.py:192-443` semantics end to end).

Each pair is scored both directions (A's detections as GT for B and vice
versa) with the first-party CrowdHuman evaluator at 0.5 IoU.

Run on TPU: python tools/probe_deviations_trained.py [n_scenes]
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


VARIANTS = {
    "parity": frozenset(),
    "exact_cleanup": frozenset({"cleanup"}),     # PARITY #1
    "exact_upfilter": frozenset({"upfilter"}),   # PARITY #3
    "exact_occupy": frozenset({"occupy"}),       # PARITY #6
    "exact_padcrop": frozenset({"padcrop"}),     # PARITY #7
    "exact_coords": frozenset({"coords"}),
    # Candidate cheaper cleanup fixes, scored against exact_cleanup:
    "cand_cleanup512": frozenset({"cleanup512"}),
    "cand_fullarea": frozenset({"cleanup_fullarea"}),
    "exact_all": None,  # ALL_PARTS, filled below
}


def main():
    n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 4

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
    from crowdsam_tpu.utils.deviation_probe import ALL_PARTS, DeviationProbe

    VARIANTS["exact_all"] = ALL_PARTS

    recipe = os.environ.get(
        "BENCH_TRAIN_RECIPE",
        "train.hard_neg_frac=0.5,train.neg_hinge_weight=16")
    cfg = modify_config(load_config("configs/crowdhuman.yaml"), [
        "model.sam_checkpoint", "", "model.dino_checkpoint", "",
        "model.sam_adapter_checkpoint", "",
    ])
    model = CrowdSAM(cfg)
    meta = train_or_load_decoder(model, steps=800, lr=2e-4, recipe=recipe)
    assert meta.get("trained_cache") in ("committed", "hit"), (
        "refusing to train at probe time; commit the fixture first", meta)
    print(f"# fixture: {meta}", file=sys.stderr)

    scenes = [crowd_scene(t) for t in range(n_scenes)]
    images_meta = [
        {"id": t, "file_name": f"im{t}.jpg",
         "height": img.shape[0], "width": img.shape[1]}
        for t, (img, _) in enumerate(scenes)
    ]

    # Engine detections + the PRNG subkeys it consumed (one per scene).
    dt, counts = {k: [] for k in list(VARIANTS) + ["engine"]}, {}
    subs = []
    import time
    for t, (img, _) in enumerate(scenes):
        key0 = model._key
        d = model.generate(img)
        subs.append(jax.random.split(key0)[1])
        dt["engine"] += _to_coco_dt(t, d["boxes"], d["scores"])
        counts.setdefault("engine", []).append(len(d["boxes"]))
    print(f"# engine: {counts['engine']}", file=sys.stderr)

    probe = DeviationProbe(model)
    consumed, diag = {}, {}
    for name, parts in VARIANTS.items():
        t0 = time.time()
        consumed[name] = []
        diag[name] = {"n_changed": [], "n_dropped_renms": []}
        for t, (img, _) in enumerate(scenes):
            d = probe.generate(img, subs[t], parts=parts)
            dt[name] += _to_coco_dt(t, d["boxes"], d["scores"])
            counts.setdefault(name, []).append(len(d["boxes"]))
            consumed[name].append(int(d["num_consumed"]))
            diag[name]["n_changed"].append(int(d["n_changed"]))
            diag[name]["n_dropped_renms"].append(int(d["n_dropped_renms"]))
        print(f"# {name}: n={counts[name]} changed={diag[name]['n_changed']} "
              f"renms_drop={diag[name]['n_dropped_renms']} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr)

    with tempfile.TemporaryDirectory() as tmpdir:
        report = {}
        # Self-AP ceiling: identical detection sets do NOT score 1.0 under
        # greedy score-descending Caltech matching (a high-scoring overlap
        # can claim another's GT) — every bound below reads against this.
        report["ceiling_parity_vs_self"] = _cross_ap(
            tmpdir, "self", images_meta, dt["parity"], dt["parity"])
        # Noise floor: production engine vs probe parity mode.
        report["floor_engine_vs_parity"] = _cross_ap(
            tmpdir, "floor", images_meta, dt["engine"], dt["parity"])
        # Attribution: parity vs each single exact part.
        for name in VARIANTS:
            if name in ("parity", "exact_all") or name.startswith("cand_"):
                continue
            report[f"parity_vs_{name}"] = _cross_ap(
                tmpdir, name, images_meta, dt["parity"], dt[name])
        # Candidate cleanup fixes: scored against the EXACT semantics (how
        # much of the gap each closes) and against parity (how much each
        # moves from the shipping behaviour).
        for name in VARIANTS:
            if not name.startswith("cand_"):
                continue
            report[f"exact_cleanup_vs_{name}"] = _cross_ap(
                tmpdir, f"x{name}", images_meta, dt["exact_cleanup"],
                dt[name])
        # Joint bound: engine (and parity) vs full reference semantics.
        report["parity_vs_exact_all"] = _cross_ap(
            tmpdir, "pex", images_meta, dt["parity"], dt["exact_all"])
        report["engine_vs_exact_all"] = _cross_ap(
            tmpdir, "eex", images_meta, dt["engine"], dt["exact_all"])

    print(json.dumps({
        "scenes": n_scenes,
        "fixture": meta,
        "detections": counts,
        "consumed": consumed,
        "diag": diag,
        "cross_ap": report,
        # Full per-variant detection dumps (COCO dt records) so matched-pair
        # analyses (e.g. box-IoU of parity-vs-exact matches) can run offline
        # from the artifact without re-running the probe.
        "dt": dt,
    }, indent=1))


if __name__ == "__main__":
    main()

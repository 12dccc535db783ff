"""Probe the trained crowded-regime fixture at REFERENCE thresholds.

Trains (or loads the cached) full decoder via utils/bench_fixture.py and
reports detection counts / box areas / tail stats on fresh crowd scenes
and a sparse scene, at the reference operating point
(configs/crowdhuman.yaml: box_nms 0.65, pred_iou 0.1, stability 0.8) and
at the zeroed-threshold point used by earlier probes.

Run on TPU: python tools/probe_trained_crowd.py [steps] [lr]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crowdsam_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()

import numpy as np


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    lr = float(sys.argv[2]) if len(sys.argv) > 2 else 2e-4
    recipe = sys.argv[3] if len(sys.argv) > 3 else ""

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from crowdsam_tpu.config import load_config, modify_config
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM
    from crowdsam_tpu.utils.bench_fixture import (
        crowd_scene, sparse_scene, train_or_load_decoder)

    for label, overrides in [
        ("reference", []),
        ("zeroed", ["test.pred_iou_thresh", "0.0",
                    "test.stability_score_thresh", "0.0"]),
    ]:
        cfg = modify_config(load_config("configs/crowdhuman.yaml"), [
            "model.sam_checkpoint", "", "model.dino_checkpoint", "",
            "model.sam_adapter_checkpoint", "",
            # match the bench default (PROBE_RECT=0 for the square mode)
            "tpu.rect_encode",
            str(os.environ.get("PROBE_RECT", "1") != "0"),
            *overrides,
        ])
        model = CrowdSAM(cfg)
        t0 = time.time()
        meta = train_or_load_decoder(model, steps=steps, lr=lr, recipe=recipe)
        print(f"# [{label}] fixture: {meta} ({time.time()-t0:.0f}s)",
              flush=True)

        model.tail_stats = []
        for trial, seed in enumerate((101, 102, 103)):
            image, gt_boxes = crowd_scene(seed)
            t0 = time.time()
            data = model.generate(image)
            dt = time.time() - t0
            n = len(data["boxes"])
            areas = ((data["boxes"][:, 2] - data["boxes"][:, 0])
                     * (data["boxes"][:, 3] - data["boxes"][:, 1])) if n else []
            print(f"[{label}] crowd {trial}: {n} det (gt {len(gt_boxes)}), "
                  f"medA {np.median(areas) if n else 0:.0f}, "
                  f"tail {model.tail_stats[-1] if model.tail_stats else None},"
                  f" {dt:.1f}s", flush=True)
        img = sparse_scene(7)
        t0 = time.time()
        data = model.generate(img)
        print(f"[{label}] sparse: {len(data['boxes'])} det, "
              f"{time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()

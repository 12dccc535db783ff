"""A/B: rect vs square encode on the real chip (PARITY.md #9 / PERF.md).

Measures the fused dual-backbone encode (set_image_presized + embedding
sync) and a full generate() for both modes on the same 683x1024 scene,
back-to-back in one process (tunnel-congestion-fair), plus a detection
agreement count.

Run on TPU: python tools/ab_rect_encode.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crowdsam_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()

import numpy as np


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from crowdsam_tpu.config import load_config, modify_config
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM
    from crowdsam_tpu.utils.bench_fixture import crowd_scene
    from crowdsam_tpu.utils.profiling import force_sync

    image, gt = crowd_scene(0)

    models = {}
    for label, rect in (("square", "False"), ("rect", "True")):
        cfg = modify_config(load_config("configs/crowdhuman.yaml"), [
            "model.sam_checkpoint", "", "model.dino_checkpoint", "",
            "model.sam_adapter_checkpoint", "",
            "tpu.rect_encode", rect,
        ])
        models[label] = CrowdSAM(cfg)
        # Share weights so detections are comparable.
        if label == "rect":
            models["rect"].sam.params = models["square"].sam.params
            models["rect"].predictor.dino_params = \
                models["square"].predictor.dino_params

    results = {}
    for label, m in models.items():
        m.generate(image)  # compile + warm
        crop_box = [0, 0, image.shape[1], image.shape[0]]
        ts = []
        for _ in range(iters):
            t0 = time.time()
            m.crop_image(image, crop_box)
            m.predictor.set_image_presized(m.image)
            force_sync(m.predictor.get_image_embedding())
            ts.append((time.time() - t0) * 1000)
        te = []
        for _ in range(iters):
            t0 = time.time()
            data = m.generate(image)
            te.append((time.time() - t0) * 1000)
        results[label] = (np.median(ts), np.median(te), len(data["boxes"]))
        print(f"{label}: encode median {np.median(ts):.1f} ms "
              f"(min {np.min(ts):.1f}), e2e median {np.median(te):.1f} ms, "
              f"{len(data['boxes'])} det", flush=True)
    sq, re = results["square"], results["rect"]
    print(f"# encode speedup {sq[0] / re[0]:.2f}x, e2e {sq[1] / re[1]:.2f}x, "
          f"det {sq[2]} vs {re[2]}")


if __name__ == "__main__":
    main()

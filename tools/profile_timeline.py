"""Host-side timeline of generate_many: where does wall time go per image?
python tools/profile_timeline.py [n_images]"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from crowdsam_tpu.config import load_config, modify_config
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cfg = modify_config(load_config("configs/crowdhuman.yaml"), [
        "model.sam_checkpoint", "",
        "model.dino_checkpoint", "",
        "model.sam_adapter_checkpoint", "",
        "test.pos_sim_thresh", "0.4",
        "test.pred_iou_thresh", "0.0",
        "test.stability_score_thresh", "0.0",
    ])
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (683, 1024, 3), dtype=np.uint8)
    model = CrowdSAM(cfg)
    model.generate(image)  # compile

    # Monkeypatch timers around the interesting host calls.
    totals = {}

    def wrap(obj, name, label):
        orig = getattr(obj, name)

        def timed(*a, **k):
            t0 = time.time()
            out = orig(*a, **k)
            totals[label] = totals.get(label, 0.0) + time.time() - t0
            return out

        setattr(obj, name, timed)

    wrap(model.predictor, "set_image_presized", "host: set_image (enqueue+upload)")
    wrap(model, "_dispatch_crop", "host: dispatch total")
    wrap(model, "_finalize_crop", "host: finalize total")

    t0 = time.time()
    model.generate_many([image] * n)
    wall = time.time() - t0
    print(f"wall {wall / n * 1000:.1f} ms/img over {n}")
    for k, v in totals.items():
        print(f"{k:<36}{v / n * 1000:>9.1f} ms/img")


if __name__ == "__main__":
    main()

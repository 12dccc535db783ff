"""Cost of exact full-resolution small-region cleanup (PARITY #1 fix).

The r5 deviation probe (tools/probe_deviations_trained.py) measured the
low-res cleanup deviation at cross-AP 0.856/0.880 against a 0.988
identical-set ceiling — the only documented deviation below the ~0.95 bar
at the trained operating point.  The exact reference semantics exist as
`tpu.fullres_cleanup: true` (bit-exact vs cv2, tests/test_fullres_cleanup);
this probe measures what flipping that default would cost at the bench's
calibrated and stress operating points.

Run on TPU: python tools/probe_fullres_cost.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crowdsam_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()


def run(fullres: bool, stress: bool) -> dict:
    from crowdsam_tpu.config import load_config, modify_config
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM
    from crowdsam_tpu.utils.bench_fixture import (
        crowd_scene, train_or_load_decoder)

    cfg = modify_config(load_config("configs/crowdhuman.yaml"), [
        "model.sam_checkpoint", "", "model.dino_checkpoint", "",
        "model.sam_adapter_checkpoint", "",
        "tpu.fullres_cleanup", str(fullres),
    ])
    model = CrowdSAM(cfg)
    recipe = "" if stress else \
        "train.hard_neg_frac=0.5,train.neg_hinge_weight=16"
    meta = train_or_load_decoder(model, steps=800, lr=2e-4, recipe=recipe)
    assert meta.get("trained_cache") in ("committed", "hit"), meta
    img, _ = crowd_scene(0)
    model.prewarm_pipeline(img)
    model.generate(img)
    times = []
    model.tail_stats = []
    t0 = time.time()
    model.generate_many([img] * 10, times_out=times)
    wall = (time.time() - t0) / 10 * 1000
    import numpy as np

    return {
        "fullres": fullres, "stress": stress,
        "median_ms": round(float(np.median([t * 1000 for t in times[2:]])), 1),
        "wall_ms_per_img": round(wall, 1),
        "iters_ms": [round(t * 1000, 1) for t in times],
        "keep": [t["n"] for t in model.tail_stats],
        "paths": [t["path"] for t in model.tail_stats],
    }


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    out = []
    for stress in (False, True):
        for fullres in (False, True):
            r = run(fullres, stress)
            print(f"# {r}", file=sys.stderr)
            out.append(r)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

"""EPS engine cost vs points_per_batch (a reference config knob; the
default 32 is a GPU-memory choice — the TPU sweet spot may differ).
Changing it changes EPS pruning granularity (detection behaviour), so this
is a user knob, not a default change.  python tools/profile_ppb.py"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from crowdsam_tpu.config import load_config, modify_config
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM
    from crowdsam_tpu.pipeline.engine import make_eps_engine
    from crowdsam_tpu.utils.profiling import force_sync

    n = 6
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
    model.generate(image)

    crop_box = [0, 0, image.shape[1], image.shape[0]]
    model.crop_image(image, crop_box)
    model.predictor.set_image_presized(model.image)
    emb = model.predictor.get_image_embedding()
    dino_proj = model.predictor.dino_proj_256
    sim_map = model._sim_prep(model.predictor.predict_fg_map())
    in_h, in_w = model.image.shape[:2]
    orig_h, orig_w = model.orig_image.shape[:2]
    r = model.engine_cfg.grid_size / max(in_h, in_w)
    feat_hw = (int(in_h * r), int(in_w * r))
    force_sync(sim_map)

    for ppb in (32, 64, 128):
        eng = make_eps_engine(
            model.sam.prompt_encoder, model.sam.mask_decoder,
            dataclasses.replace(model.engine_cfg, points_per_batch=ppb),
        )
        args = lambda i: (
            model.sam.params, emb, model.predictor.dense_pe, dino_proj,
            sim_map, jnp.asarray(feat_hw, jnp.float32),
            jnp.asarray((in_h, in_w), jnp.float32),
            jnp.asarray(crop_box, jnp.float32),
            jnp.asarray((orig_h, orig_w), jnp.float32),
            jnp.float32(model.downscale), jax.random.PRNGKey(i),
        )
        out = eng(*args(0))
        force_sync(out["num_consumed"])
        t0 = time.time()
        for i in range(n):
            out = eng(*args(i))
        force_sync(out["num_consumed"])
        print(f"points_per_batch={ppb:<4} engine"
              f"{(time.time()-t0)/n*1000:>9.1f} ms "
              f"({-(-500 // ppb)} iterations)")


if __name__ == "__main__":
    main()

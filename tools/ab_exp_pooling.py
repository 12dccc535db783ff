"""TPU A/B: EPS engine with kernel-emitted exp pooling vs the explicit
max/exp pooling passes.  python tools/ab_exp_pooling.py [N]"""

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

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = modify_config(load_config("configs/crowdhuman.yaml"), [
        "model.sam_checkpoint", "", "model.dino_checkpoint", "",
        "model.sam_adapter_checkpoint", "",
        "test.pos_sim_thresh", "0.4",
        "test.pred_iou_thresh", "0.0", "test.stability_score_thresh", "0.0",
    ])
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (683, 1024, 3), dtype=np.uint8)
    model = CrowdSAM(cfg)
    crop_box = [0, 0, 1024, 683]
    model.crop_image(image, crop_box)
    model.predictor.set_image_presized(model.image)
    emb = model.predictor.get_image_embedding()
    dino_proj = model.predictor.dino_proj_256
    sim_map = model._sim_prep(model.predictor.predict_fg_map())
    in_h, in_w = model.image.shape[:2]
    r = model.engine_cfg.grid_size / max(in_h, in_w)
    feat_hw = (int(in_h * r), int(in_w * r))
    force_sync(sim_map)

    results = {}
    for label, disable in (("exp-pool", ""), ("explicit", "1")):
        if disable:
            os.environ["CROWDSAM_DISABLE_EXP_POOLING"] = "1"
        else:
            os.environ.pop("CROWDSAM_DISABLE_EXP_POOLING", None)
        engine = make_eps_engine(
            model.sam.prompt_encoder, model.sam.mask_decoder,
            model.engine_cfg, spec_with_masks=model.output_rles)

        def run(key):
            return engine(
                model.sam.params, emb, model.predictor.dense_pe, dino_proj,
                sim_map, jnp.asarray(feat_hw, jnp.float32),
                jnp.asarray((in_h, in_w), jnp.float32),
                jnp.asarray(crop_box, jnp.float32),
                jnp.asarray((683, 1024), jnp.float32),
                jnp.float32(model.downscale), key,
            )

        out = run(jax.random.PRNGKey(0))
        force_sync(out["num_consumed"])
        t0 = time.time()
        for i in range(n):
            out = run(jax.random.PRNGKey(i))
        force_sync(out["num_consumed"])
        dt = (time.time() - t0) / n * 1000
        results[label] = (dt, np.asarray(out["summary"]))
        print(f"{label:>9}: {dt:8.1f} ms/engine-call")

    d1, s1 = results["exp-pool"]
    d2, s2 = results["explicit"]
    pre1 = s1[s1[:, 1] > -1e30]
    pre2 = s2[s2[:, 1] > -1e30]
    print(f"pre-NMS rows: {len(pre1)} vs {len(pre2)}")
    if len(pre1) == len(pre2) and len(pre1):
        print("max |iou diff|:", np.abs(np.sort(pre1[:, 1]) - np.sort(pre2[:, 1])).max())
        print("max |score diff|:", np.abs(np.sort(pre1[:, 2]) - np.sort(pre2[:, 2])).max())
    print(f"speedup: {d2 / d1:.3f}x ({d2 - d1:+.1f} ms)")


if __name__ == "__main__":
    main()

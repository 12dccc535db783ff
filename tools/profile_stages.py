"""Per-stage wall-clock profile of the single-image pipeline on the real TPU.

Forces a true device sync (utils.profiling.force_sync) between stages, so
numbers are actual completion times, not enqueue times.  Usage:

    python tools/profile_stages.py [iters]
"""

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
    from crowdsam_tpu.utils.profiling import force_sync

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5

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

    totals = {}

    def mark(name, t0):
        totals[name] = totals.get(name, 0.0) + (time.time() - t0)
        return time.time()

    for _ in range(iters):
        t = time.time()
        crop_box = [0, 0, image.shape[1], image.shape[0]]
        model.crop_image(image, crop_box)
        t = mark("host resize", t)

        model.predictor.set_image_presized(model.image)
        force_sync(model.predictor.get_image_embedding())
        force_sync(model.predictor.dino_proj_256)
        t = mark("encode (SAM+DINO fused)", t)

        fg_logits = model.predictor.predict_fg_map()
        sim_map = model._sim_prep(fg_logits)
        force_sync(sim_map)
        t = mark("fg map + sim prep", t)

        in_h, in_w = model.image.shape[:2]
        orig_h, orig_w = model.orig_image.shape[:2]
        r = model.engine_cfg.grid_size / max(in_h, in_w)
        feat_hw = (int(in_h * r), int(in_w * r))
        model._key, sub = jax.random.split(model._key)
        res = model.engine(
            model.sam.params,
            model.predictor.get_image_embedding(),
            model.predictor.dense_pe,
            model.predictor.dino_proj_256,
            sim_map,
            jnp.asarray(feat_hw, jnp.float32),
            jnp.asarray((in_h, in_w), jnp.float32),
            jnp.asarray(crop_box, jnp.float32),
            jnp.asarray((orig_h, orig_w), jnp.float32),
            jnp.float32(model.downscale),
            sub,
        )
        force_sync(res["num_consumed"])
        t = mark("EPS engine", t)

        meta = dict(crop_box=crop_box, orig_hw=(orig_h, orig_w),
                    in_hw=(in_h, in_w), downscale=model.downscale)
        summary = np.asarray(res["summary"])
        t = mark("summary transfer", t)

        keep = summary[:, 0] > 0.5
        n = int(keep.sum())
        idx = np.nonzero(keep)[0]
        bucket = next(
            b for b in (32, 64, 128, 192, 256, model.engine_cfg.max_keep)
            if b >= min(max(n, 1), model.engine_cfg.max_keep)
        )
        idx_pad = np.zeros(bucket, dtype=np.int32)
        idx_pad[: min(n, bucket)] = idx[:bucket]
        gathered = jnp.take(res["logits"], jnp.asarray(idx_pad), axis=0)
        sp = model._survivor_pass(gathered, jnp.int32(min(n, bucket)), jnp.asarray((in_h, in_w), jnp.int32))
        force_sync(sp["summary"])
        t = mark(f"survivor pass (bucket {bucket})", t)

        sp_np = {k: np.asarray(v) for k, v in sp.items()}
        t = mark("survivor transfer (incl packed)", t)

        data = model._finalize_crop(res, meta)
        t = mark("finalize (full host tail, re-run)", t)

    print(f"{'stage':<34}{'ms/img':>10}")
    for name, total in totals.items():
        print(f"{name:<34}{total / iters * 1000:>10.1f}")
    no_refin = sum(v for k, v in totals.items() if not k.startswith("finalize"))
    print(f"{'TOTAL (sync-separated)':<34}{no_refin / iters * 1000:>10.1f}")


if __name__ == "__main__":
    main()

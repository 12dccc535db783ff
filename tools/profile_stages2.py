"""Amortized per-stage device cost: run each stage N times back-to-back with
ONE sync at the end, so tunnel latency and dispatch overlap as they do in the
real pipeline.  python tools/profile_stages2.py [N]"""

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

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8

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
    model.generate(image)  # compile everything

    crop_box = [0, 0, image.shape[1], image.shape[0]]
    model.crop_image(image, crop_box)
    model.predictor.set_image_presized(model.image)
    emb = model.predictor.get_image_embedding()
    dino_proj = model.predictor.dino_proj_256
    fg_logits = model.predictor.predict_fg_map()
    sim_map = model._sim_prep(fg_logits)
    in_h, in_w = model.image.shape[:2]
    orig_h, orig_w = model.orig_image.shape[:2]
    r = model.engine_cfg.grid_size / max(in_h, in_w)
    feat_hw = (int(in_h * r), int(in_w * r))
    force_sync(sim_map)

    def engine_once(key):
        return model.engine(
            model.sam.params, emb, model.predictor.dense_pe, dino_proj,
            sim_map, jnp.asarray(feat_hw, jnp.float32),
            jnp.asarray((in_h, in_w), jnp.float32),
            jnp.asarray(crop_box, jnp.float32),
            jnp.asarray((orig_h, orig_w), jnp.float32),
            jnp.float32(model.downscale), key,
        )

    res = engine_once(jax.random.PRNGKey(0))
    gathered = jnp.take(res["logits"], jnp.arange(32), axis=0)
    force_sync(res["num_consumed"])

    def loop(name, fn, sync_tree_fn):
        t0 = time.time()
        out = None
        for i in range(n):
            out = fn(i)
        force_sync(sync_tree_fn(out))
        dt = (time.time() - t0) / n * 1000
        print(f"{name:<36}{dt:>9.1f} ms/call")
        return out

    loop("encode (set_image_presized)",
         lambda i: (model.predictor.set_image_presized(model.image),
                    model.predictor.get_image_embedding())[1],
         lambda o: o)
    loop("fg map + sim prep",
         lambda i: model._sim_prep(model.predictor.predict_fg_map()),
         lambda o: o)
    loop("EPS engine", lambda i: engine_once(jax.random.PRNGKey(i)),
         lambda o: o["num_consumed"])
    # Warm the bucket-32 survivor program before timing it (generate() only
    # compiles the speculative in-engine tail, so the first bucketed call
    # here would otherwise time a full compile).
    force_sync(model._survivor_pass(
        gathered, jnp.int32(1), jnp.asarray((in_h, in_w), jnp.int32)
    )["summary"])
    loop("survivor pass (bucket 32)",
         lambda i: model._survivor_pass(gathered, jnp.int32(1), jnp.asarray((in_h, in_w), jnp.int32)),
         lambda o: o["summary"])

    # Host tail pieces, timed cold (each includes real transfers).
    t0 = time.time()
    for i in range(n):
        summary = np.asarray(res["summary"])
    print(f"{'summary transfer':<36}{(time.time()-t0)/n*1000:>9.1f} ms/call")
    sp = model._survivor_pass(gathered, jnp.int32(1), jnp.asarray((in_h, in_w), jnp.int32))
    t0 = time.time()
    for i in range(n):
        packed = np.asarray(sp["packed"])
        svals = np.asarray(sp.get("rle_svals", sp.get("rle_cand")))
        spsum = np.asarray(sp["summary"])
    print(f"{'survivor transfers':<36}{(time.time()-t0)/n*1000:>9.1f} ms/call")

    from crowdsam_tpu.ops import rle as rle_ops
    full = np.unpackbits(packed, axis=-1)[:1, :in_h, :in_w].astype(bool)
    t0 = time.time()
    for i in range(n):
        rles = rle_ops.encode_masks_coco(full)
    print(f"{'host RLE (1 mask)':<36}{(time.time()-t0)/n*1000:>9.1f} ms/call")


if __name__ == "__main__":
    main()

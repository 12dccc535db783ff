"""Micro-profiles: engine fused-vs-module A/B, survivor pass dissection.
python tools/profile_micro.py [N]"""

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
    from crowdsam_tpu.pipeline.engine import make_eps_engine, make_survivor_pass
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

    def bench_engine(name, eng):
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
        print(f"{name:<44}{(time.time()-t0)/n*1000:>9.1f} ms")
        return out

    ecfg = model.engine_cfg
    res = bench_engine("engine (fused decode)", model.engine)
    eng_mod = make_eps_engine(
        model.sam.prompt_encoder, model.sam.mask_decoder,
        dataclasses.replace(ecfg, fused_decode=False),
    )
    bench_engine("engine (module decode)", eng_mod)

    # Survivor pass dissection at bucket 32.
    gathered = jnp.take(res["logits"], jnp.arange(32), axis=0)

    def bench(name, fn, sync_fn):
        out = fn()
        force_sync(sync_fn(out))
        t0 = time.time()
        for _ in range(n):
            out = fn()
        force_sync(sync_fn(out))
        print(f"{name:<44}{(time.time()-t0)/n*1000:>9.1f} ms")

    sp_full = make_survivor_pass(ecfg, with_masks=True)
    sp_nomask = make_survivor_pass(ecfg, with_masks=False)
    sp_nocc = make_survivor_pass(
        dataclasses.replace(ecfg, min_mask_region_area=0.0), with_masks=True
    )
    bench("survivor full (CC + upsample/pack)",
          lambda: sp_full(gathered, jnp.int32(1), jnp.asarray((683,1024), jnp.int32)), lambda o: o["summary"])
    bench("survivor no-masks (CC only)",
          lambda: sp_nomask(gathered, jnp.int32(1), jnp.asarray((683,1024), jnp.int32)), lambda o: o["summary"])
    bench("survivor no-CC (upsample/pack only)",
          lambda: sp_nocc(gathered, jnp.int32(1), jnp.asarray((683,1024), jnp.int32)), lambda o: o["summary"])

    from crowdsam_tpu.ops.connected import remove_small_regions
    binm = gathered > 0.0

    @jax.jit
    def cc_once(m):
        a, ch1 = remove_small_regions(m, 6.25, "holes", max_iters=ecfg.cc_max_iters)
        b, ch2 = remove_small_regions(a, 6.25, "islands", max_iters=ecfg.cc_max_iters)
        return b, ch1 | ch2

    bench("remove_small_regions x2 (noise masks)",
          lambda: cc_once(binm), lambda o: o[1])


if __name__ == "__main__":
    main()

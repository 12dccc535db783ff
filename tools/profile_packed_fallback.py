"""Break down the packed-bitmap overflow fallback at the trained operating
point, and measure TRUE per-mask change counts (the survivor kernel caps
nch at max_rle_changes+1, so the summary can't tell us how far over budget
the masks actually are).

Run on TPU: python tools/profile_packed_fallback.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crowdsam_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from crowdsam_tpu.config import load_config, modify_config
    from crowdsam_tpu.ops import rle as rle_ops
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM
    from crowdsam_tpu.utils.bench_fixture import crowd_scene, train_or_load_decoder
    from crowdsam_tpu.utils.profiling import force_sync

    cfg = modify_config(load_config("configs/crowdhuman.yaml"), [
        "model.sam_checkpoint", "", "model.dino_checkpoint", "",
        "model.sam_adapter_checkpoint", "",
    ])
    model = CrowdSAM(cfg)
    print("# fixture:", train_or_load_decoder(model), flush=True)
    image, _ = crowd_scene(0)
    model.generate(image)
    model.prewarm_survivors()
    ecfg = model.engine_cfg

    res, meta = model._dispatch_crop(
        image, [0, 0, image.shape[1], image.shape[0]])
    force_sync(res["summary"])
    in_h, in_w = meta["in_hw"]
    summary = np.asarray(res["summary"])
    keep = summary[:, 0] > 0.5
    n = int(keep.sum())
    idx = np.nonzero(keep)[0]
    bucket = next(b for b in model.SURVIVOR_BUCKETS + (ecfg.max_keep,)
                  if b >= min(n, ecfg.max_keep))
    idx_pad = np.zeros(bucket, dtype=np.int32)
    idx_pad[: min(n, bucket)] = idx[:bucket]
    sp = model._survivor_gathered(
        res["logits"], jnp.asarray(idx_pad), jnp.int32(min(n, bucket)),
        jnp.asarray((in_h, in_w), jnp.int32))
    force_sync(sp["summary"])

    print("# packed dtype/shape:", sp["packed"].dtype, sp["packed"].shape,
          flush=True)
    t0 = time.time()
    packed_all = np.asarray(sp["packed"])
    t_xfer = time.time() - t0
    t0 = time.time()
    full = np.unpackbits(packed_all, axis=-1)[:, :in_h, :in_w]
    t_unpack = time.time() - t0
    fullb = full.astype(bool)

    # True Fortran-order change counts per mask (transposed: column-major).
    t0 = time.time()
    flat = fullb[: min(n, bucket)].transpose(0, 2, 1).reshape(min(n, bucket), -1)
    ch = (flat[:, 1:] != flat[:, :-1]).sum(1) + flat[:, 0]
    t_count = time.time() - t0
    print(f"# true changes: p10 {int(np.percentile(ch,10))} "
          f"p50 {int(np.percentile(ch,50))} p90 {int(np.percentile(ch,90))} "
          f"max {int(ch.max())}; budget max_rle_changes={ecfg.max_rle_changes}",
          flush=True)
    areas = fullb[: min(n, bucket)].sum((1, 2))
    print(f"# areas: p50 {int(np.median(areas))} max {int(areas.max())}",
          flush=True)

    t0 = time.time()
    rles = rle_ops.encode_masks_coco(fullb[:60])
    t_enc = time.time() - t0
    print(f"# timings: packed_xfer {t_xfer*1e3:.0f} ms, unpack "
          f"{t_unpack*1e3:.0f} ms, count {t_count*1e3:.0f} ms, "
          f"encode_masks_coco(60) {t_enc*1e3:.0f} ms", flush=True)

    # Second sample for transfer-time stability.
    t0 = time.time()
    _ = np.asarray(model._survivor_gathered(
        res["logits"], jnp.asarray(idx_pad), jnp.int32(min(n, bucket)),
        jnp.asarray((in_h, in_w), jnp.int32))["packed"])
    print(f"# dispatch+packed_xfer 2nd: {(time.time()-t0)*1e3:.0f} ms",
          flush=True)


if __name__ == "__main__":
    main()

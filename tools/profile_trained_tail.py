"""Attribute the crowded host tail at the trained-fixture operating point.

BENCH r3 first capture: crowded median 3306 ms/img at ~100 detections with
finalize_ms ~3352 — ~33 ms/mask of host tail, vs the ~0.3 ms/slot device
cost measured in r2.  This tool times each segment of
CrowdSAM._finalize_crop separately: summary transfer, survivor
dispatch+sync, candidate-table transfer, svals_from_cand flatten,
encode_changes_coco string build, MaskData assembly.

Run on TPU: python tools/profile_trained_tail.py
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

    # Warm everything.
    model.generate(image)
    model.prewarm_survivors()
    ecfg = model.engine_cfg

    for trial in range(3):
        t0 = time.time()
        res, meta = model._dispatch_crop(
            image, [0, 0, image.shape[1], image.shape[0]])
        force_sync(res["summary"])
        t_dispatch = time.time() - t0
        in_h, in_w = meta["in_hw"]

        t0 = time.time()
        summary = np.asarray(res["summary"])
        t_sum = time.time() - t0
        keep = summary[:, 0] > 0.5
        n = int(keep.sum())
        idx = np.nonzero(keep)[0]

        bucket = next(b for b in model.SURVIVOR_BUCKETS + (ecfg.max_keep,)
                      if b >= min(n, ecfg.max_keep))
        idx_pad = np.zeros(bucket, dtype=np.int32)
        idx_pad[: min(n, bucket)] = idx[:bucket]
        t0 = time.time()
        sp = model._survivor_gathered(
            res["logits"], jnp.asarray(idx_pad), jnp.int32(min(n, bucket)),
            jnp.asarray((in_h, in_w), jnp.int32))
        force_sync(sp["summary"])
        t_surv = time.time() - t0

        t0 = time.time()
        sp_summary = np.asarray(sp["summary"])[: min(n, bucket)]
        keep2 = sp_summary[:, 0] > 0.5
        sel = np.nonzero(keep2)[0]
        nch = sp_summary[sel, 10].astype(np.int64)
        t_sum2 = time.time() - t0

        t_cand = t_svals = t_enc = t_pack = 0.0
        sizes = {}
        if sp.get("rle_cand") is not None:
            t0 = time.time()
            cand = rle_ops.unpack_cand10(np.asarray(sp["rle_cand"])[sel])
            ncol = np.asarray(sp["rle_ncol"])[sel]
            t_cand = time.time() - t0
            sizes["cand"] = cand.shape
            maxc = ecfg.max_rle_changes
            overflow = np.nonzero(nch > maxc)[0]
            svals_list = {}
            t0 = time.time()
            for i in range(len(sel)):
                if i not in overflow:
                    svals_list[i] = rle_ops.svals_from_cand(
                        cand[i], ncol[i], in_h)
            t_svals = time.time() - t0
            if len(overflow):
                t0 = time.time()
                packed = np.asarray(sp["packed"])[sel[overflow]]
                full_ov = np.unpackbits(packed, axis=-1)[
                    :, :in_h, :in_w].astype(bool)
                ov_rles = rle_ops.encode_masks_coco(full_ov)
                t_pack = time.time() - t0
            t0 = time.time()
            total = in_h * in_w
            for i in range(len(sel)):
                if i not in overflow:
                    rle_ops.encode_changes_coco(
                        svals_list[i], total, (in_h, in_w))
            t_enc = time.time() - t0
        print(f"trial {trial}: n={n} bucket={bucket} kept={len(sel)} "
              f"overflow={len(overflow)} nch p50={int(np.median(nch))} "
              f"max={int(nch.max())} | dispatch {t_dispatch*1e3:.0f} "
              f"summary {t_sum*1e3:.0f} survivor {t_surv*1e3:.0f} "
              f"sum2 {t_sum2*1e3:.0f} cand_xfer {t_cand*1e3:.0f} "
              f"svals {t_svals*1e3:.0f} encode {t_enc*1e3:.0f} "
              f"packed {t_pack*1e3:.0f} ms  sizes={sizes}", flush=True)


if __name__ == "__main__":
    main()

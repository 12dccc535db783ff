"""Stress-regime stage attribution (VERDICT r4 #4).

The heavy-crowd stress entry (~140 detections, levers-off fixture) ran at
642 ms/img in BENCH_r04 (3.1x) vs the 5x bar.  Before taking the deferred
cleanup-kernel port (PERF.md "VERDICT r3 #9 analysis": ~18 ms at bucket
128) or any other fix, attribute where the time actually goes:

  1. dispatch->summary sync      (upload + encode + EPS engine)
  2. survivor bucket dispatch->blob sync (gather + cleanup + kernel tail
     + the cand-table device->host transfer, ~32 KB/mask)
  3. host RLE assembly           (svals_from_cand + COCO strings/mask)
  4. steady-state generate_many  (what the bench measures)

Run on TPU: python tools/probe_stress_stages.py
"""

import json
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
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM
    from crowdsam_tpu.pipeline.engine import (
        ENGINE_BLOB_KEYS, SURVIVOR_BLOB_KEYS, fetch_host_blob)
    from crowdsam_tpu.utils.bench_fixture import (
        crowd_scene, train_or_load_decoder)
    from crowdsam_tpu.utils.profiling import force_sync

    cfg = modify_config(load_config("configs/crowdhuman.yaml"), [
        "model.sam_checkpoint", "", "model.dino_checkpoint", "",
        "model.sam_adapter_checkpoint", "",
    ])
    model = CrowdSAM(cfg)
    # Levers-off stress fixture (the bench's stress entry).
    meta = train_or_load_decoder(model, steps=800, lr=2e-4, recipe="")
    assert meta.get("trained_cache") in ("committed", "hit"), meta
    img, _ = crowd_scene(0)
    crop_box = [0, 0, img.shape[1], img.shape[0]]

    model.prewarm_pipeline(img)
    model.generate(img)  # warm every real program/path

    out = {"fixture": meta}

    # 1. dispatch -> summary sync (5x)
    ts = []
    for _ in range(5):
        t0 = time.time()
        res, m = model._dispatch_crop(img, crop_box)
        force_sync(res["summary"])
        ts.append((time.time() - t0) * 1000)
    out["dispatch_summary_ms"] = [round(t, 1) for t in ts]

    # 2. split the finalize: engine blob fetch / survivor dispatch+sync /
    #    survivor blob fetch / host RLE tail (instrumented re-run of
    #    _finalize_crop's stages on fresh dispatches)
    stages = {k: [] for k in ("fetch_engine_ms", "survivor_ms",
                              "fetch_survivor_ms", "host_rle_ms", "n",
                              "bucket", "cand_bytes")}
    for _ in range(4):
        res, m = model._dispatch_crop(img, crop_box)
        force_sync(res["summary"])  # exclude device compute of the engine
        t0 = time.time()
        fetched = fetch_host_blob(res, ENGINE_BLOB_KEYS)
        t1 = time.time()
        summary = fetched["summary"]
        keep = summary[:, 0] > 0.5
        n = int(keep.sum())
        idx = np.nonzero(keep)[0]
        cfg_e = model.engine_cfg
        bucket = next(b for b in model.SURVIVOR_BUCKETS + (cfg_e.max_keep,)
                      if b >= min(n, cfg_e.max_keep))
        idx_pad = np.zeros(bucket, dtype=np.int32)
        idx_pad[: min(n, bucket)] = idx[:bucket]
        in_h, in_w = m["in_hw"]
        t2 = time.time()
        spg = model._survivor_gathered(
            res["logits"], jnp.asarray(idx_pad), jnp.int32(min(n, bucket)),
            jnp.asarray((in_h, in_w), jnp.int32))
        force_sync(spg["summary"])
        t3 = time.time()
        sp = fetch_host_blob(spg, SURVIVOR_BLOB_KEYS)
        t4 = time.time()
        # host RLE tail: run the real finalize for an honest host number
        data = model._finalize_crop(res, m)
        t5 = time.time()
        stages["fetch_engine_ms"].append(round((t1 - t0) * 1000, 1))
        stages["survivor_ms"].append(round((t3 - t2) * 1000, 1))
        stages["fetch_survivor_ms"].append(round((t4 - t3) * 1000, 1))
        stages["host_rle_ms"].append(round((t5 - t4) * 1000, 1))
        stages["n"].append(n)
        stages["bucket"].append(bucket)
        stages["cand_bytes"].append(
            int(spg["rle_cand"].size * spg["rle_cand"].dtype.itemsize)
            if "rle_cand" in spg else 0)
    out["finalize_stages"] = stages

    # 3. steady-state generate_many (the bench's measurement)
    times = []
    model.tail_stats = []
    t0 = time.time()
    model.generate_many([img] * 8, times_out=times)
    wall = (time.time() - t0) / 8 * 1000
    out["generate_many_ms"] = [round(t * 1000, 1) for t in times]
    out["wall_ms_per_img"] = round(wall, 1)
    out["tail_paths"] = [t["path"] for t in model.tail_stats]
    model.tail_stats = None

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

"""Crowded-regime cost attribution: survivor pass + transfers + host RLE
as a function of detection count.  python tools/profile_crowded.py [N]

Times each bucketed survivor program (8..320 slots) amortized over N
back-to-back calls with one sync, the device->host transfers at each
bucket, and the host COCO-RLE string build per mask — the detection-
count-scaled work the sparse bench never enters (VERDICT r1 weak #1).
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
    from crowdsam_tpu.pipeline.engine import EngineConfig, make_survivor_pass
    from crowdsam_tpu.utils.profiling import force_sync
    from crowdsam_tpu.ops import rle as rle_ops

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = EngineConfig()  # defaults match configs/crowdhuman.yaml
    rng = np.random.default_rng(0)
    in_h, in_w = 683, 1024

    # Blob-like logits so cleanup/RLE see realistic (non-noise) masks.
    def blob_logits(k):
        out = np.full((k, cfg.low_res, cfg.low_res), -8.0, np.float32)
        for i in range(k):
            cy, cx = rng.integers(30, 226, 2)
            ry, rx = rng.integers(8, 40, 2)
            yy, xx = np.mgrid[0 : cfg.low_res, 0 : cfg.low_res]
            m = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
            out[i][m] = 8.0
            # a small hole + island to make cleanup do work
            out[i, (cy + 60) % 250, (cx + 60) % 250] = 8.0
            out[i, cy, cx] = -8.0
        return out

    for bucket in (16, 32, 64, 128, 192, 256, 320):
        sp = make_survivor_pass(cfg, with_masks=True)
        logits = jnp.asarray(blob_logits(bucket))
        hw = jnp.asarray((in_h, in_w), jnp.int32)
        out = sp(logits, jnp.int32(bucket), hw)
        force_sync(out["summary"])
        t0 = time.time()
        for _ in range(n):
            out = sp(logits, jnp.int32(bucket), hw)
        force_sync(out["summary"])
        dt_dev = (time.time() - t0) / n * 1000

        t0 = time.time()
        for _ in range(n):
            spsum = np.asarray(out["summary"])
            svals = np.asarray(out["rle_svals"])
        dt_xfer = (time.time() - t0) / n * 1000

        nch = spsum[:, 10].astype(np.int64)
        total = in_h * in_w
        t0 = time.time()
        for _ in range(n):
            rles = [
                rle_ops.encode_changes_coco(svals[i, : nch[i]], total,
                                            (in_h, in_w))
                for i in range(bucket)
            ]
        dt_host = (time.time() - t0) / n * 1000
        print(
            f"bucket {bucket:>4}: device {dt_dev:8.1f} ms  "
            f"xfer {dt_xfer:6.1f} ms  host-RLE {dt_host:6.1f} ms  "
            f"({dt_dev / bucket:5.2f} ms/slot)"
        )


if __name__ == "__main__":
    main()

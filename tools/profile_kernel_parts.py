"""Survivor-kernel internal attribution: stage 0 (upsample+edits+pack),
stage 1 (+box), 2 (+change/counts), 3 (full, +candidate rows).
python tools/profile_kernel_parts.py [bucket] [N]"""

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

    from crowdsam_tpu.ops.survivor_kernel import survivor_rle_pallas
    from crowdsam_tpu.utils.profiling import force_sync

    bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    R = 256
    rng = np.random.default_rng(0)
    logits = rng.normal(0, 4, (bucket, R, R)).astype(np.float32)
    edit = np.zeros((bucket, R, R), np.int8)
    jl = jnp.asarray(logits)
    je = jnp.asarray(edit)
    hw = jnp.asarray((683, 1024), jnp.int32)

    for stage in (0, 1, 2, 3):
        fn = lambda: survivor_rle_pallas(jl, je, hw, thresh=0.0, stage=stage)
        out = fn()
        force_sync(out["summary"])
        t0 = time.time()
        for _ in range(n):
            out = fn()
        force_sync(out["summary"])
        dt = (time.time() - t0) / n * 1000
        print(f"stage {stage}: {dt:8.1f} ms ({dt / bucket:5.3f} ms/slot)")


if __name__ == "__main__":
    main()

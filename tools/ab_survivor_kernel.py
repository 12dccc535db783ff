"""TPU A/B: survivor pass with the Pallas survivor-tail kernel ON vs OFF.

Compares outputs (packed bits, rle change indices, summary) on blob masks
and times both variants at a crowded bucket.
python tools/ab_survivor_kernel.py [bucket] [N]
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

    from crowdsam_tpu.pipeline import engine as eng
    from crowdsam_tpu.utils.profiling import force_sync

    bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    cfg = eng.EngineConfig()
    R = cfg.low_res
    in_h, in_w = 683, 1024
    rng = np.random.default_rng(0)
    logits = np.full((bucket, R, R), -8.0, np.float32)
    for i in range(bucket):
        cy, cx = rng.integers(30, 200, 2)
        ry, rx = rng.integers(8, 40, 2)
        yy, xx = np.mgrid[0:R, 0:R]
        m = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
        logits[i][m] = 8.0
        logits[i, (cy + 60) % 250, (cx + 60) % 250] = 8.0  # island
        logits[i, cy, cx] = -8.0                           # hole
    jl = jnp.asarray(logits)
    hw = jnp.asarray((in_h, in_w), jnp.int32)
    nn = jnp.int32(bucket)

    results = {}
    for label, disable in (("kernel", ""), ("xla", "1")):
        if disable:
            os.environ["CROWDSAM_DISABLE_SURVIVOR_KERNEL"] = "1"
        else:
            os.environ.pop("CROWDSAM_DISABLE_SURVIVOR_KERNEL", None)
        sp = jax.jit(eng._survivor_core(cfg, with_masks=True))
        out = sp(jl, nn, hw)
        force_sync(out["summary"])
        t0 = time.time()
        for _ in range(n):
            out = sp(jl, nn, hw)
        force_sync(out["summary"])
        dt = (time.time() - t0) / n * 1000
        if "rle_cand" in out:
            from crowdsam_tpu.ops.rle import svals_from_cand

            cand = np.asarray(out["rle_cand"])
            ncol = np.asarray(out["rle_ncol"])
            svals = np.full((bucket, cfg.max_rle_changes), -1, np.int64)
            for i in range(bucket):
                sv = svals_from_cand(cand[i], ncol[i], in_h)
                svals[i, : len(sv)] = sv
        else:
            svals = np.asarray(out["rle_svals"]).astype(np.int64)
        results[label] = (
            dt,
            np.asarray(out["packed"]),
            svals,
            np.asarray(out["summary"]),
        )
        print(f"{label:>7}: {dt:8.1f} ms ({dt / bucket:5.3f} ms/slot)")

    dk, pk, sk, suk = results["kernel"]
    dx, px, sx, sux = results["xla"]
    bits_diff = int((pk != px).sum())
    tot = px.size
    print(f"packed byte mismatches: {bits_diff}/{tot}")
    print("summary max abs diff:", np.abs(suk - sux).max(axis=0).round(2))
    same_svals = int((sk == sx).all(axis=1).sum())
    print(f"identical rle_svals rows: {same_svals}/{bucket}")
    print(f"speedup: {dx / dk:.2f}x")


if __name__ == "__main__":
    main()

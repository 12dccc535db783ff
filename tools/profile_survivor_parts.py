"""Per-part cost of the survivor tail at a crowded bucket.
python tools/profile_survivor_parts.py [bucket] [N]

Times progressively larger slices of `_survivor_core`'s work as separate
jitted programs: low-res cleanup, full-res upsample+binarize, +edits+pack,
+boxes, +RLE change extraction — to find where the ~1.3 ms/slot goes.
"""

import functools
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

    from crowdsam_tpu.ops.amg import batched_mask_to_box
    from crowdsam_tpu.ops.connected import remove_small_regions
    from crowdsam_tpu.pipeline.engine import EngineConfig, _COL_SLOTS
    from crowdsam_tpu.utils.profiling import force_sync

    bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    cfg = EngineConfig()
    R, S = cfg.low_res, cfg.img_size
    in_h, in_w = 683, 1024
    area_lr = cfg.min_mask_region_area * (R / S) ** 2

    rng = np.random.default_rng(0)
    logits = np.full((bucket, R, R), -8.0, np.float32)
    for i in range(bucket):
        cy, cx = rng.integers(30, 200, 2)
        ry, rx = rng.integers(8, 40, 2)
        yy, xx = np.mgrid[0:R, 0:R]
        m = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
        logits[i][m] = 8.0
    jl = jnp.asarray(logits)
    hw = jnp.asarray((in_h, in_w), jnp.int32)

    @jax.jit
    def cleanup_only(lg):
        binm = lg > cfg.mask_threshold
        m1, c1 = remove_small_regions(binm, area_lr, "holes",
                                      max_iters=cfg.cc_max_iters)
        m2, c2 = remove_small_regions(m1, area_lr, "islands",
                                      max_iters=cfg.cc_max_iters)
        return m2, c1 | c2

    @jax.jit
    def upsample_bin(lg):
        k = lg.shape[0]
        x = jax.image.resize(lg, (k, S, S), "linear", antialias=False)
        return x > cfg.mask_threshold

    def pack_bits(b):
        *lead, wdt = b.shape
        bits = b.reshape(*lead, wdt // 8, 8)
        weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], dtype=jnp.uint8)
        return (bits.astype(jnp.uint8) * weights).sum(-1).astype(jnp.uint8)

    @jax.jit
    def up_pack_box(lg, hwv):
        k = lg.shape[0]
        x = jax.image.resize(lg, (k, S, S), "linear", antialias=False)
        full = x > cfg.mask_threshold
        ys = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        inside = (ys < hwv[0]) & (xs < hwv[1])
        full = full & inside[None]
        return pack_bits(full), batched_mask_to_box(full)

    @jax.jit
    def change_extract(lg, hwv):
        k = lg.shape[0]
        x = jax.image.resize(lg, (k, S, S), "linear", antialias=False)
        full = x > cfg.mask_threshold
        ys = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        in_hh, in_ww = hwv[0], hwv[1]
        inside = (ys < in_hh) & (xs < in_ww)
        full = full & inside[None]
        mt = full.transpose(0, 2, 1)
        last = jnp.take_along_axis(
            mt, jnp.full((k, S, 1), in_hh - 1, jnp.int32), axis=2
        )[..., 0]
        prev = jnp.pad(mt[:, :, :-1], ((0, 0), (0, 0), (1, 0)))
        col0_prev = jnp.pad(last[:, :-1], ((0, 0), (1, 0)))
        first_col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1) == 0
        prev = jnp.where(first_col.T[None], col0_prev[:, :, None], prev)
        tvalid = (xs.T < in_ww)[None] & (ys.T < in_hh)[None]
        change = tvalid & (mt != prev)
        csum = jnp.cumsum(change.astype(jnp.int32), axis=2)
        n_col = csum[:, :, -1]
        Sl = _COL_SLOTS
        cand = jnp.stack(
            [jnp.argmax(change & (csum == s + 1), axis=2).astype(jnp.int32)
             for s in range(Sl)], axis=2)
        incl = jnp.cumsum(n_col, axis=1)
        excl = incl - n_col
        j = jnp.arange(cfg.max_rle_changes, dtype=jnp.int32)
        col = jax.vmap(lambda inc: jnp.searchsorted(inc, j, side="right"))(
            incl).astype(jnp.int32)
        col_c = jnp.minimum(col, S - 1)
        slot = j[None] - jnp.take_along_axis(excl, col_c, axis=1)
        slot_c = jnp.clip(slot, 0, Sl - 1)
        row = jnp.take_along_axis(cand.reshape(k, -1), col_c * Sl + slot_c,
                                  axis=1)
        return row, incl[:, -1]

    parts = [
        ("lowres cleanup", lambda: cleanup_only(jl)),
        ("upsample+binarize", lambda: upsample_bin(jl)),
        ("ups+pack+box", lambda: up_pack_box(jl, hw)),
        ("ups+change-extract", lambda: change_extract(jl, hw)),
    ]
    for name, fn in parts:
        out = fn()
        force_sync(out)
        t0 = time.time()
        for _ in range(n):
            out = fn()
        force_sync(out)
        dt = (time.time() - t0) / n * 1000
        print(f"{name:<22} bucket {bucket}: {dt:8.1f} ms "
              f"({dt / bucket:5.3f} ms/slot)")


if __name__ == "__main__":
    main()

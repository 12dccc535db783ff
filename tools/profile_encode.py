"""Encode sub-part profile on the real TPU.  python tools/profile_encode.py [N]"""

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

    from crowdsam_tpu.models.build import sam_model_registry
    from crowdsam_tpu.models.dinov2 import dino_model_registry
    from crowdsam_tpu.utils.init import fast_random_init
    from crowdsam_tpu.utils.profiling import force_sync

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(0)

    sam = sam_model_registry["vit_l"](n_class=1)
    import jax.numpy as _jnp
    dino = dino_model_registry["dinov2_vitl14"](dtype=_jnp.bfloat16)
    dparams = fast_random_init(dino, jnp.zeros((1, 14, 14, 3)), seed=0)

    img = jnp.asarray(rng.normal(0, 1, (1, 1024, 1024, 3)).astype(np.float32))
    img_d = jnp.asarray(rng.normal(0, 1, (1, 1022, 1022, 3)).astype(np.float32))
    host_u8 = rng.integers(0, 255, (1, 1024, 1024, 3), dtype=np.uint8)

    def bench(name, fn, *args):
        out = fn(*args)
        force_sync(out)
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        force_sync(out)
        print(f"{name:<44}{(time.time()-t0)/n*1000:>9.1f} ms")

    sam_enc = jax.jit(lambda p, x: sam.image_encoder.apply(
        {"params": p["image_encoder"]}, x))
    dino_enc = jax.jit(lambda p, x: dino.apply(
        {"params": p}, x)["x_norm_patchtokens"])

    @jax.jit
    def resize_1022(x):
        return jax.image.resize(x, (1, 1022, 1022, 3), "linear",
                                antialias=False)

    @jax.jit
    def proj_and_resize(p, feats):
        proj = sam.mask_decoder.apply(
            {"params": p["mask_decoder"]}, feats,
            method=sam.mask_decoder.project_dino)
        return jax.image.resize(
            proj[0], (256, 256, proj.shape[-1]), "linear", antialias=False
        ).astype(jnp.bfloat16)

    feats73 = jnp.asarray(rng.normal(0, 1, (1, 73, 73, 1024)).astype(np.float32))

    bench("SAM ViT-L encoder (1024^2)", sam_enc, sam.params, img)
    bench("DINOv2 ViT-L/14 (1022^2)", dino_enc, dparams, img_d)
    bench("resize 1024->1022", resize_1022, img)
    bench("dino_proj + resize 256", proj_and_resize, sam.params, feats73)

    t0 = time.time()
    for _ in range(n):
        x = jnp.asarray(host_u8)
        force_sync(x)
    print(f"{'image upload (3MB u8, synced)':<44}{(time.time()-t0)/n*1000:>9.1f} ms")


if __name__ == "__main__":
    main()

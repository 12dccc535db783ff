"""Upscale-chain layout experiments.  python tools/profile_upscale_variants.py"""

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

    from crowdsam_tpu.models.common import _ln_impl, gelu
    from crowdsam_tpu.utils.profiling import force_sync

    n = 8
    ITERS, K, C = 16, 32, 256
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    keys2 = jnp.asarray(rng.normal(0, 1, (K, 4096, C)).astype(np.float32)).astype(dtype)
    w1 = jnp.asarray(rng.normal(0, 0.02, (C, 256)).astype(np.float32))   # 4*64
    b1 = jnp.zeros((256,), jnp.float32)
    lnw = jnp.ones((64,), jnp.float32)
    lnb = jnp.zeros((64,), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.02, (64, 128)).astype(np.float32))  # 4*32
    b2 = jnp.zeros((128,), jnp.float32)
    hyper = jnp.asarray(rng.normal(0, 0.02, (K, 4, 32)).astype(np.float32)).astype(dtype)
    eps_seq = jnp.arange(ITERS, dtype=dtype) * 1e-6

    def bench(name, fn, *args):
        out = fn(*args)
        force_sync(out)
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        force_sync(out)
        print(f"{name:<52}{(time.time()-t0)/n*1000:>9.1f} ms")

    @jax.jit
    def current(keys2, eps_seq):
        def body(carry, eps):
            src = (keys2 + eps).reshape(K, 64, 64, C)
            up = src @ w1.astype(dtype) + b1.astype(dtype)
            up = up.reshape(K, 64, 64, 2, 2, 64).transpose(0, 1, 3, 2, 4, 5)
            up = up.reshape(K, 128, 128, 64)
            up = _ln_impl(up, lnw, lnb, 1e-6, dtype)
            up = gelu(up)
            up = up @ w2.astype(dtype) + b2.astype(dtype)
            up = up.reshape(K, 128, 128, 2, 2, 32).transpose(0, 1, 3, 2, 4, 5)
            up = up.reshape(K, 256, 256, 32)
            up = gelu(up)
            masks = jnp.einsum("pkc,pxc->pkx", hyper,
                               up.reshape(K, 256 * 256, 32))
            return carry + masks.astype(jnp.float32).mean(), None

        out, _ = jax.lax.scan(body, jnp.float32(0), eps_seq)
        return out

    @jax.jit
    def packed(keys2, eps_seq):
        def body(carry, eps):
            src = keys2 + eps                     # (K, 4096, 256)
            up = src @ w1.astype(dtype) + b1.astype(dtype)   # (K, 4096, 4*64)
            up = up.reshape(K, 4096, 4, 64)
            up = _ln_impl(up, lnw, lnb, 1e-6, dtype)
            up = gelu(up)
            up = jnp.einsum("pxqc,cd->pxqd", up, w2.astype(dtype)) + b2.astype(dtype)
            up = gelu(up)                          # (K, 4096, 4, 4*32)
            up = up.reshape(K, 4096, 16, 32)
            masks = jnp.einsum("pkc,pxqc->pkxq", hyper, up)   # (K,4,4096,16)
            return carry + masks.astype(jnp.float32).mean(), None

        out, _ = jax.lax.scan(body, jnp.float32(0), eps_seq)
        return out

    @jax.jit
    def packed_flat2(keys2, eps_seq):
        """Packed, with the 2nd dense as one (4096*4, 64) x (64,128) matmul."""
        def body(carry, eps):
            src = keys2 + eps
            up = src @ w1.astype(dtype) + b1.astype(dtype)
            up = up.reshape(K, 4096 * 4, 64)
            up = _ln_impl(up, lnw, lnb, 1e-6, dtype)
            up = gelu(up)
            up = up @ w2.astype(dtype) + b2.astype(dtype)
            up = gelu(up)
            up = up.reshape(K, 4096, 16, 32)
            masks = jnp.einsum("pkc,pxqc->pkxq", hyper, up)
            return carry + masks.astype(jnp.float32).mean(), None

        out, _ = jax.lax.scan(body, jnp.float32(0), eps_seq)
        return out

    bench("16x upscale current (d2s transposes)", current, keys2, eps_seq)
    bench("16x upscale packed (einsum 2nd dense)", packed, keys2, eps_seq)
    bench("16x upscale packed (flat 2nd dense)", packed_flat2, keys2, eps_seq)


if __name__ == "__main__":
    main()

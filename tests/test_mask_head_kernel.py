"""Fused Pallas mask-head kernel vs the XLA packed branch (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from crowdsam_tpu.models.common import _ln_impl, gelu
from crowdsam_tpu.models.mask_head_kernel import (
    build_mask_head_weights,
    mask_head_pallas,
)


def _xla_packed_mask_head(keys2, hyper_in, dec_params, dtype):
    """The fused_decode packed-branch math (models/fused_decode.py)."""
    p_cnt, m, _ = keys2.shape

    def dense(x, p):
        return (
            x.astype(dtype) @ p["kernel"].astype(dtype)
            + p["bias"].astype(dtype)
        )

    up = dense(keys2, dec_params["upscale_0"]["dense"])
    up = up.reshape(p_cnt, m, 4, -1)
    up = _ln_impl(
        up, dec_params["upscale_1"]["weight"],
        dec_params["upscale_1"]["bias"], 1e-6, dtype,
    )
    up = gelu(up)
    w2 = dec_params["upscale_3"]["dense"]
    up = jnp.einsum(
        "pxqc,cd->pxqd", up, w2["kernel"].astype(dtype)
    ) + w2["bias"].astype(dtype)
    up = gelu(up)
    up = up.reshape(p_cnt, m, 16, -1)
    return jnp.einsum("pkc,pxqc->pkxq", hyper_in.astype(dtype), up)


def test_mask_head_kernel_matches_xla(rng):
    p, m, c = 3, 256, 256
    c1, c2, k = 64, 32, 4
    dtype = jnp.bfloat16
    dec_params = {
        "upscale_0": {"dense": {
            "kernel": jnp.asarray(rng.normal(0, 0.05, (c, 4 * c1)).astype(np.float32)),
            "bias": jnp.asarray(rng.normal(0, 0.05, (4 * c1,)).astype(np.float32)),
        }},
        "upscale_1": {
            "weight": jnp.asarray(rng.normal(1, 0.1, (c1,)).astype(np.float32)),
            "bias": jnp.asarray(rng.normal(0, 0.1, (c1,)).astype(np.float32)),
        },
        "upscale_3": {"dense": {
            "kernel": jnp.asarray(rng.normal(0, 0.05, (c1, 4 * c2)).astype(np.float32)),
            "bias": jnp.asarray(rng.normal(0, 0.05, (4 * c2,)).astype(np.float32)),
        }},
    }
    keys2 = jnp.asarray(rng.normal(0, 1, (p, m, c)).astype(np.float32)).astype(dtype)
    hyper = jnp.asarray(rng.normal(0, 0.3, (p, k, c2)).astype(np.float32)).astype(dtype)

    want = np.asarray(
        _xla_packed_mask_head(keys2, hyper, dec_params, dtype)
    ).astype(np.float32)
    weights = build_mask_head_weights(dec_params, dtype)
    got = np.asarray(
        mask_head_pallas(keys2, hyper, weights, num_masks=k, tile_m=128,
                         interpret=True)
    ).astype(np.float32)

    assert got.shape == want.shape == (p, k, m, 16)
    # bf16 rounding points differ slightly between the two pipelines.
    scale = np.maximum(np.abs(want), 1.0)
    err = np.abs(got - want) / scale
    assert err.max() < 0.05, err.max()
    assert np.median(err) < 0.01

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


def test_pooled_from_exp_matches_softmax_pooling(rng):
    """Blockwise exp-combine == explicit softmax pooling (f32 reference)."""
    from crowdsam_tpu.models.fused_decode import _pooled_from_exp

    p, m, k, c = 2, 256, 4, 32
    tm, nblk = 64, 4
    npix = m * 16
    masks = rng.normal(0, 3, (p, m, k * 16)).astype(np.float32)
    dino = rng.normal(0, 1, (npix, c)).astype(np.float32)

    # kernel-side terms: per-(p, j) block max over the whole block
    mb = masks.reshape(p, nblk, tm, k * 16)
    mx = mb.max(axis=(2, 3))
    e = np.exp(mb - mx[:, :, None, None]).reshape(p, m, k * 16)

    got = np.asarray(_pooled_from_exp(
        jnp.asarray(e), jnp.asarray(mx), jnp.asarray(dino), k, jnp.float32))

    # explicit softmax pooling: weights over npix per (p, k)
    mk = masks.reshape(p, nblk, tm, k, 16).transpose(0, 3, 1, 2, 4)
    flat = mk.reshape(p, k, npix)  # note: (j, r, q) order == packed order
    wsoft = np.exp(flat - flat.max(axis=2, keepdims=True))
    wsoft = wsoft / wsoft.sum(axis=2, keepdims=True)
    dino_k = dino.reshape(nblk, tm, 16, c).reshape(npix, c)
    want = wsoft @ dino_k

    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_mask_head_kernel_emit_exp(rng):
    """emit_exp returns exp(masks - block max) + the block maxes
    (interpret mode)."""
    from crowdsam_tpu.models.mask_head_kernel import (
        build_mask_head_weights,
        mask_head_pallas,
    )

    p, m, c = 2, 256, 256
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
    weights = build_mask_head_weights(dec_params, dtype)

    plain = np.asarray(mask_head_pallas(
        keys2, hyper, weights, num_masks=k, tile_m=128, interpret=True
    )).astype(np.float32)
    masks_o, e_o, mx_o = mask_head_pallas(
        keys2, hyper, weights, num_masks=k, tile_m=128, interpret=True,
        emit_exp=True,
    )
    np.testing.assert_array_equal(np.asarray(masks_o), plain.astype(np.float32))

    # e reconstructs the masks' softmax terms: e == exp(mask_lane - c_j)
    nblk = m // 128
    mlane = np.asarray(masks_o).transpose(0, 2, 1, 3).reshape(p, m, k * 16)
    mx = np.asarray(mx_o)
    assert mx.shape == (p, nblk)
    mb = mlane.reshape(p, nblk, 128, k * 16)
    np.testing.assert_allclose(mx, mb.max(axis=(2, 3)), atol=1e-2)
    want_e = np.exp(mb.astype(np.float32) - mx[:, :, None, None])
    np.testing.assert_allclose(
        np.asarray(e_o).astype(np.float32).reshape(p, nblk, 128, k * 16),
        want_e, atol=0.02, rtol=0.02)

"""Pallas two-way transformer kernel vs fused_decode's XLA path.

The kernel (models/decode_tail_kernel.py) covers the WHOLE two-way decoder
per prompt — block-1 self-attn + t2i + MLP + image->token update, block-2
self-attn + t2i + MLP + image->token update, final token->image attention.
This test runs the real integration path: `fused_decode` with the tail
kernel forced (interpret mode on CPU) against the pure-XLA path, on a
random-weight vit_tiny decoder.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from crowdsam_tpu.models.build import sam_model_registry
from crowdsam_tpu.models.fused_decode import (
    fused_decode,
    precompute_decode_shared,
)


@pytest.mark.parametrize("packed", [True, False])
def test_tail_kernel_integration_matches_xla(rng, monkeypatch, packed):
    sam = sam_model_registry["vit_tiny"](n_class=1, dtype=jnp.bfloat16,
                                         dino_dim=384)
    dec = sam.params["mask_decoder"]
    no_mask = sam.params["prompt_encoder"]["no_mask_embed"]
    h = sam.img_size // 16  # 16
    feats = jnp.asarray(
        rng.normal(0, 1, (1, h, h, 256)).astype(np.float32)
    ).astype(jnp.bfloat16)
    pe = jnp.asarray(rng.normal(0, 1, (h, h, 256)).astype(np.float32))
    sparse = jnp.asarray(
        rng.normal(0, 1, (3, 2, 256)).astype(np.float32)
    ).astype(jnp.bfloat16)
    if packed:
        dino = jnp.asarray(
            rng.normal(0, 1, (h * h * 16, 256)).astype(np.float32)
        ).astype(jnp.bfloat16)
    else:
        dino = jnp.asarray(
            rng.normal(0, 1, (4 * h, 4 * h, 256)).astype(np.float32)
        ).astype(jnp.bfloat16)

    def run(force):
        if force:
            monkeypatch.setenv("CROWDSAM_FORCE_TAIL_KERNEL", "1")
        else:
            monkeypatch.delenv("CROWDSAM_FORCE_TAIL_KERNEL", raising=False)
        shared = precompute_decode_shared(
            dec, no_mask, feats, pe, num_heads=8, dtype=jnp.bfloat16
        )
        assert ("tail" in shared) == force
        return fused_decode(
            dec, shared, sparse, True, dino_feats_proj=dino,
            num_heads=8, dtype=jnp.bfloat16, n_class=1, packed_masks=packed,
        )

    want = run(False)
    got = run(True)

    for g, w, name, tol in zip(got, want, ("masks", "iou", "cls"),
                               (0.12, 0.06, 0.06)):
        g = np.asarray(g, np.float32)
        w = np.asarray(w, np.float32)
        assert g.shape == w.shape, name
        scale = np.maximum(np.abs(w), 1.0)
        err = np.abs(g - w) / scale
        assert np.median(err) < 0.02, (name, np.median(err))
        assert err.max() < tol, (name, err.max())

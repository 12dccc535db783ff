"""MaskDecoderHQ parity vs the reference HQ torch module (full size — the
reference hardcodes 256^2 pooling shapes)."""

import importlib
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from crowdsam_tpu.models.mask_decoder_hq import MaskDecoderHQ
from crowdsam_tpu.utils import checkpoint as ckpt

from ref_oracle import load_ref_modeling

REF = load_ref_modeling()


@pytest.mark.slow
def test_mask_decoder_hq_parity():
    refmod = importlib.import_module("refsam.mask_decoder_hq")
    torch.manual_seed(7)

    class _TransformerShim(REF["transformer"].TwoWayTransformer):
        """The vendored HQ decoder calls transformer(src, pos, tokens) with
        no attn_sim (mask_decoder_hq.py:181) — a latent incompatibility with
        the CS transformer signature (it expects the external
        segment_anything_hq transformer).  Default it here for the oracle."""

        def forward(self, image_embedding, image_pe, point_embedding,
                    attn_sim=None, target_embedding=None):
            return super().forward(
                image_embedding, image_pe, point_embedding, attn_sim,
                target_embedding,
            )

    ttr = _TransformerShim(
        depth=2, embedding_dim=256, num_heads=8, mlp_dim=2048
    )
    tdec = refmod.MaskDecoderHQ(
        transformer_dim=256, transformer=ttr, num_multimask_outputs=3,
        vit_dim=1024, n_class=1,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in tdec.state_dict().items()}

    jdec = MaskDecoderHQ(transformer_dim=256, n_class=1, vit_dim=1024,
                         dtype=jnp.float32)
    params = ckpt.convert_mask_decoder_hq(sd)

    rng = np.random.default_rng(7)
    p = 2
    img_embed = rng.normal(size=(1, 256, 64, 64)).astype(np.float32) * 0.5
    img_pe = rng.normal(size=(1, 256, 64, 64)).astype(np.float32) * 0.5
    sparse = rng.normal(size=(p, 2, 256)).astype(np.float32) * 0.5
    dense = rng.normal(size=(p, 256, 64, 64)).astype(np.float32) * 0.1
    dino = rng.normal(size=(1, 73, 73, 1024)).astype(np.float32) * 0.1
    interm = rng.normal(size=(1, 64, 64, 1024)).astype(np.float32) * 0.2

    with torch.no_grad():
        m_t, iou_t, cls_t = tdec(
            image_embeddings=torch.from_numpy(img_embed),
            image_pe=torch.from_numpy(img_pe),
            sparse_prompt_embeddings=torch.from_numpy(sparse),
            dense_prompt_embeddings=torch.from_numpy(dense),
            multimask_output=True,
            hq_token_only=False,
            interm_embeddings=[torch.from_numpy(interm)],
            dino_feats=torch.from_numpy(dino),
        )

    # Hoisted per-image inputs.
    hq_feat = jdec.apply(
        {"params": params},
        jnp.asarray(img_embed.transpose(0, 2, 3, 1)),
        jnp.asarray(interm),
        method=jdec.compute_hq_features,
    )
    dino_256 = jax.image.resize(
        jnp.asarray(dino[0]), (256, 256, 1024), "linear", antialias=False
    )
    m_j, iou_j, cls_j = jdec.apply(
        {"params": params},
        jnp.asarray(img_embed.transpose(0, 2, 3, 1)),
        jnp.asarray(img_pe[0].transpose(1, 2, 0)),
        jnp.asarray(sparse),
        jnp.asarray(dense.transpose(0, 2, 3, 1)),
        True,
        hq_features=hq_feat,
        dino_feats_256=dino_256,
    )
    np.testing.assert_allclose(np.asarray(m_j), m_t.detach().numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(iou_j), iou_t.detach().numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(cls_j), cls_t.detach().numpy(),
                               atol=5e-4, rtol=1e-3)

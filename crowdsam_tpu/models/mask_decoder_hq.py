"""HQ-SAM mask decoder with PWD-Net heads (the `sam_hq` arch).

Behavioural contract: reference `segment_anything_cs/modeling/mask_decoder_hq.py`:
- base SAM tokens + an HQ output token (:75-77) whose hypernetwork reads an
  HQ feature map fused from the upscaled embedding and an early ViT feature
  (:80-96,188-189);
- PWD-Net heads (:98-100) — NOTE the HQ variant pools the *raw* DINO
  features under the mask softmax and projects afterwards (:208-213), the
  reverse order of the base decoder, and uses plain MLPs (no dropout);
- multimask output returns the 3 SAM masks sliced as [1:4] (:143-148);
  single-mask mode adds the HQ mask onto mask 0 (:150-156).

The per-image HQ feature fusion (`compute_hq_features`) and the 256^2 raw
DINO resize are hoisted out of the per-prompt path, mirroring the base
decoder's hoisted projection.  In the reference this arch additionally
requires the external (non-vendored) `segment_anything_hq` predictor; here
the module is self-contained and selected via `sam_arch: sam_hq`.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from crowdsam_tpu.models.common import (
    ChannelLayerNorm,
    ConvTranspose2x2,
    MLP,
    gelu,
)
from crowdsam_tpu.models.transformer import TwoWayTransformer


class MaskDecoderHQ(nn.Module):
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    n_class: int = 1
    vit_dim: int = 1024
    dino_dim: int = 1024
    transformer_depth: int = 2
    transformer_num_heads: int = 8
    transformer_mlp_dim: int = 2048
    dtype: Any = jnp.float32

    @property
    def num_sam_tokens(self) -> int:
        return self.num_multimask_outputs + 1  # 4

    @property
    def num_mask_tokens(self) -> int:
        return self.num_sam_tokens + 1  # + HQ token

    def setup(self):
        d = self.transformer_dim
        self.iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, d))
        self.mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (self.num_sam_tokens, d)
        )
        self.hf_token = self.param("hf_token", nn.initializers.normal(1.0), (1, d))
        self.transformer = TwoWayTransformer(
            depth=self.transformer_depth,
            embedding_dim=d,
            num_heads=self.transformer_num_heads,
            mlp_dim=self.transformer_mlp_dim,
            dtype=self.dtype,
        )
        self.upscale_conv1 = ConvTranspose2x2(d // 4, dtype=self.dtype,
                                              name="upscale_0")
        self.upscale_norm = ChannelLayerNorm(dtype=self.dtype, name="upscale_1")
        self.upscale_conv2 = ConvTranspose2x2(d // 8, dtype=self.dtype,
                                              name="upscale_3")
        self.output_hypernetworks_mlps = [
            MLP(d, d // 8, 3, dtype=self.dtype, name=f"hyper_mlps_{i}")
            for i in range(self.num_sam_tokens + 1)
        ]
        self.hf_mlp = MLP(d, d // 8, 3, dtype=self.dtype, name="hf_mlp")
        self.iou_prediction_head = MLP(
            self.iou_head_hidden_dim, self.num_sam_tokens, self.iou_head_depth,
            dtype=self.dtype, name="iou_prediction_head",
        )
        # HQ feature fusion stacks.
        self.compress_vit_0 = ConvTranspose2x2(d, dtype=self.dtype,
                                               name="compress_vit_0")
        self.compress_vit_norm = ChannelLayerNorm(dtype=self.dtype, name="compress_vit_1")
        self.compress_vit_3 = ConvTranspose2x2(d // 8, dtype=self.dtype,
                                               name="compress_vit_3")
        self.embed_enc_0 = ConvTranspose2x2(d // 4, dtype=self.dtype,
                                            name="embed_enc_0")
        self.embed_enc_norm = ChannelLayerNorm(dtype=self.dtype, name="embed_enc_1")
        self.embed_enc_3 = ConvTranspose2x2(d // 8, dtype=self.dtype,
                                            name="embed_enc_3")
        self.embed_mf_0 = nn.Conv(d // 4, (3, 3), padding=1, dtype=self.dtype,
                                  name="embed_mf_0")
        self.embed_mf_norm = ChannelLayerNorm(dtype=self.dtype, name="embed_mf_1")
        self.embed_mf_3 = nn.Conv(d // 8, (3, 3), padding=1, dtype=self.dtype,
                                  name="embed_mf_3")
        # PWD-Net heads (plain MLPs in the HQ variant, :98-100).
        self.dino_proj = nn.Dense(d, dtype=self.dtype, name="dino_proj")
        self.parallel_iou_head = MLP(
            self.iou_head_hidden_dim, 1, self.iou_head_depth,
            dtype=self.dtype, name="parallel_iou_head",
        )
        self.point_classifier = MLP(
            self.iou_head_hidden_dim, self.n_class, 2,
            dtype=self.dtype, name="point_classifier",
        )

    def project_dino(self, dino_feats: jnp.ndarray) -> jnp.ndarray:
        """Same hoisted projection surface as the base decoder (the
        predict_fg_map path, reference predictor.py:113-121)."""
        return self.dino_proj(dino_feats)

    def classify_points(self, feats: jnp.ndarray, deterministic: bool = True):
        del deterministic  # plain MLP heads in the HQ variant (no dropout)
        return self.point_classifier(feats)

    def init_all(
        self,
        image_embeddings: jnp.ndarray,
        image_pe: jnp.ndarray,
        sparse_prompt_embeddings: jnp.ndarray,
        dense_prompt_embeddings: jnp.ndarray,
        dino_feats_256: jnp.ndarray,
        interm_embeddings: jnp.ndarray,
        multimask_output: bool = True,
    ):
        """Init-only entry that exercises every submodule (the HQ fusion
        stacks are otherwise reached only through `compute_hq_features`)."""
        hq = self.compute_hq_features(image_embeddings, interm_embeddings)
        return self(
            image_embeddings,
            image_pe,
            sparse_prompt_embeddings,
            dense_prompt_embeddings,
            multimask_output,
            hq_features=hq,
            dino_feats_256=dino_feats_256,
        )

    def compute_hq_features(
        self, image_embeddings: jnp.ndarray, interm_embeddings: jnp.ndarray
    ) -> jnp.ndarray:
        """Per-image HQ feature map (reference :129-130).

        image_embeddings: (1, h, w, C); interm_embeddings: (1, h, w, vit_dim)
        early ViT feature (after the first global block).  -> (1, 4h, 4w, C/8)
        """
        x = self.embed_enc_0(image_embeddings)
        x = self.embed_enc_norm(x)
        x = gelu(x)
        x = self.embed_enc_3(x)
        v = self.compress_vit_0(interm_embeddings)
        v = self.compress_vit_norm(v)
        v = gelu(v)
        v = self.compress_vit_3(v)
        return x + v

    def __call__(
        self,
        image_embeddings: jnp.ndarray,          # (1|P, h, w, C)
        image_pe: jnp.ndarray,                  # (h, w, C)
        sparse_prompt_embeddings: jnp.ndarray,  # (P, N, C)
        dense_prompt_embeddings: jnp.ndarray,   # (P, h, w, C)
        multimask_output: bool,
        hq_features: jnp.ndarray = None,        # (1, 4h, 4w, C/8)
        dino_feats_256: jnp.ndarray = None,     # (4h, 4w, dino_dim) raw resized
        hq_token_only: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        p = sparse_prompt_embeddings.shape[0]
        d = self.transformer_dim

        output_tokens = jnp.concatenate(
            [self.iou_token, self.mask_tokens, self.hf_token], axis=0
        )
        tokens = jnp.concatenate(
            [
                jnp.broadcast_to(output_tokens[None], (p,) + output_tokens.shape),
                sparse_prompt_embeddings.astype(output_tokens.dtype),
            ],
            axis=1,
        )

        h, w = image_embeddings.shape[1], image_embeddings.shape[2]
        src = jnp.broadcast_to(image_embeddings, (p, h, w, image_embeddings.shape[-1]))
        src = (src + dense_prompt_embeddings).reshape(p, h * w, -1)
        pos_src = jnp.broadcast_to(image_pe.reshape(1, h * w, -1), src.shape)

        hs, src = self.transformer(
            src.astype(self.dtype), pos_src.astype(self.dtype),
            tokens.astype(self.dtype),
        )
        iou_token_out = hs[:, 0, :]
        mask_tokens_out = hs[:, 1 : 1 + self.num_mask_tokens, :]

        src = src.reshape(p, h, w, d)
        up_sam = self.upscale_conv1(src)
        up_sam = self.upscale_norm(up_sam)
        up_sam = gelu(up_sam)
        up_sam = self.upscale_conv2(up_sam)
        up_sam = gelu(up_sam)  # (P, 4h, 4w, d/8)

        mf = self.embed_mf_0(up_sam)
        mf = self.embed_mf_norm(mf)
        mf = gelu(mf)
        mf = self.embed_mf_3(mf)
        up_hq = mf + hq_features.astype(mf.dtype)

        hyper = [
            self.output_hypernetworks_mlps[i](mask_tokens_out[:, i, :])
            for i in range(self.num_sam_tokens)
        ]
        hyper.append(self.hf_mlp(mask_tokens_out[:, self.num_mask_tokens - 1, :]))
        hyper_in = jnp.stack(hyper, axis=1)  # (P, 5, d/8)

        hh, ww = up_sam.shape[1], up_sam.shape[2]
        masks_sam = jnp.einsum(
            "pkc,pxc->pkx", hyper_in[:, : self.num_sam_tokens],
            up_sam.reshape(p, hh * ww, -1),
        ).reshape(p, self.num_sam_tokens, hh, ww)
        masks_hq = jnp.einsum(
            "pkc,pxc->pkx", hyper_in[:, self.num_sam_tokens :],
            up_hq.reshape(p, hh * ww, -1),
        ).reshape(p, 1, hh, ww)
        masks = jnp.concatenate([masks_sam, masks_hq], axis=1)

        iou_pred = self.iou_prediction_head(iou_token_out)

        # PWD-Net: pool RAW dino under the SAM masks, project afterwards
        # (:208-213 — the reverse order of the base decoder).
        mask_weight = jax.nn.softmax(
            masks_sam.reshape(p, self.num_sam_tokens, hh * ww).astype(jnp.float32),
            axis=-1,
        )
        pooled = jnp.einsum(
            "pkx,xc->pkc", mask_weight.astype(self.dtype),
            dino_feats_256.reshape(hh * ww, -1).astype(self.dtype),
        )
        cls_scores = self.point_classifier(self.dino_proj(pooled))

        fused_token = jnp.concatenate(
            [
                jnp.broadcast_to(iou_token_out[:, None, :],
                                 (p, self.num_sam_tokens, d)),
                mask_tokens_out[:, : self.num_sam_tokens],
            ],
            axis=-1,
        )
        res_iou_pred = self.parallel_iou_head(fused_token)[..., 0]
        iou_pred = iou_pred + res_iou_pred

        if multimask_output:
            out_masks = masks[:, 1 : self.num_mask_tokens - 1]
            iou_out = iou_pred[:, 1 : self.num_mask_tokens - 1]
            cls_out = cls_scores[:, 1 : self.num_mask_tokens - 1]
        else:
            out_masks = masks[:, 0:1] + masks[:, self.num_mask_tokens - 1 :]
            iou_out = iou_pred[:, 0:1]
            cls_out = cls_scores[:, 0:1]
        return (
            out_masks.astype(jnp.float32),
            iou_out.astype(jnp.float32),
            cls_out.astype(jnp.float32),
        )

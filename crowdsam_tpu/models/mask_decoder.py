"""Mask decoder with PWD-Net heads (the Crowd-SAM adapter).

Behavioural contract: reference `segment_anything_cs/modeling/mask_decoder.py`:
- iou_token + 4 mask tokens (:52-54), two-way transformer, 2x conv-transpose
  upscaling 64->256 (:56-62), 5 hypernetwork MLPs — one deliberately unused,
  kept for checkpoint-shape parity (:63-68) — and the base IoU head (:70).
- PWD-Net additions (:72-74): `dino_proj = Linear(1024, 256)`,
  `parallel_iou_head = DropMLP(512, 256, 1, depth 3)`,
  `point_classifier = DropMLP(256, 256, n_class, depth 2)`.
- Forward (:138-199): mask-weighted softmax pooling of projected DINO
  features -> class scores; fused [iou_token ⊕ mask_token] -> residual IoU
  added to the base prediction.  Returns (masks, iou_pred, cls_scores).

TPU-native notes:
- Everything is batched over the prompt axis P; the per-image projected DINO
  feature map is an *input* (`dino_feats_proj`: (256, 256, C) NHWC),
  computed once per image by the predictor — the reference recomputes
  dino_proj + a bilinear resize inside every 32-prompt decode call
  (mask_decoder.py:187-188); hoisting it is numerically identical.
- The softmax pooling over 256^2 mask logits runs as one (P*4, HW) x (HW, C)
  matmul on the MXU in f32.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from crowdsam_tpu.models.common import (
    ChannelLayerNorm,
    ConvTranspose2x2,
    DropMLP,
    MLP,
    gelu,
)
from crowdsam_tpu.models.transformer import TwoWayTransformer


class MaskDecoder(nn.Module):
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    n_class: int = 1
    dino_dim: int = 1024
    transformer_depth: int = 2
    transformer_num_heads: int = 8
    transformer_mlp_dim: int = 2048
    dtype: Any = jnp.float32

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1

    def setup(self):
        d = self.transformer_dim
        self.iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, d))
        self.mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (self.num_mask_tokens, d)
        )
        self.transformer = TwoWayTransformer(
            depth=self.transformer_depth,
            embedding_dim=d,
            num_heads=self.transformer_num_heads,
            mlp_dim=self.transformer_mlp_dim,
            dtype=self.dtype,
        )
        self.upscale_conv1 = ConvTranspose2x2(
            d // 4, dtype=self.dtype, name="upscale_0"
        )
        self.upscale_norm = ChannelLayerNorm(dtype=self.dtype, name="upscale_1")
        self.upscale_conv2 = ConvTranspose2x2(
            d // 8, dtype=self.dtype, name="upscale_3"
        )
        # num_mask_tokens + 1 hypernetwork MLPs; the extra one is never used
        # but exists in the reference checkpoint (mask_decoder.py:63-68).
        self.output_hypernetworks_mlps = [
            MLP(d, d // 8, 3, dtype=self.dtype, name=f"hyper_mlps_{i}")
            for i in range(self.num_mask_tokens + 1)
        ]
        self.iou_prediction_head = MLP(
            self.iou_head_hidden_dim,
            self.num_mask_tokens,
            self.iou_head_depth,
            dtype=self.dtype,
            name="iou_prediction_head",
        )
        # PWD-Net adapter heads (mask_decoder.py:72-74).
        self.dino_proj = nn.Dense(d, dtype=self.dtype, name="dino_proj")
        self.parallel_iou_head = DropMLP(
            self.iou_head_hidden_dim, 1, self.iou_head_depth,
            dtype=self.dtype, name="parallel_iou_head",
        )
        self.point_classifier = DropMLP(
            self.iou_head_hidden_dim, self.n_class, 2,
            dtype=self.dtype, name="point_classifier",
        )

    def project_dino(self, dino_feats: jnp.ndarray) -> jnp.ndarray:
        """(..., H, W, dino_dim) -> (..., H, W, transformer_dim) projection
        (the hoisted `dino_proj` from reference mask_decoder.py:187)."""
        return self.dino_proj(dino_feats)

    def classify_points(self, feats: jnp.ndarray, deterministic: bool = True):
        """point_classifier over projected DINO features (predict_fg_map path,
        reference predictor.py:113-121)."""
        return self.point_classifier(feats, deterministic=deterministic)

    def __call__(
        self,
        image_embeddings: jnp.ndarray,       # (P, h, w, C) or (1, h, w, C)
        image_pe: jnp.ndarray,               # (h, w, C)
        sparse_prompt_embeddings: jnp.ndarray,  # (P, N, C)
        dense_prompt_embeddings: jnp.ndarray,   # (P, h, w, C)
        multimask_output: bool,
        dino_feats_proj: Optional[jnp.ndarray] = None,  # (256, 256, C)
        attn_sim: Optional[jnp.ndarray] = None,
        target_embedding: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """-> (masks (P, K, 256, 256), iou_pred (P, K), cls_scores (P, K, n_class))
        with K = 4 if multimask_output else 1 (reference :92-199)."""
        p = sparse_prompt_embeddings.shape[0]
        d = self.transformer_dim

        output_tokens = jnp.concatenate([self.iou_token, self.mask_tokens], axis=0)
        output_tokens = jnp.broadcast_to(
            output_tokens[None], (p,) + output_tokens.shape
        )
        tokens = jnp.concatenate(
            [output_tokens, sparse_prompt_embeddings.astype(output_tokens.dtype)],
            axis=1,
        )

        h, w = image_embeddings.shape[1], image_embeddings.shape[2]
        src = jnp.broadcast_to(image_embeddings, (p, h, w, image_embeddings.shape[-1]))
        src = src + dense_prompt_embeddings
        src = src.reshape(p, h * w, -1)
        pos_src = jnp.broadcast_to(image_pe.reshape(1, h * w, -1), src.shape)

        hs, src = self.transformer(
            src.astype(self.dtype),
            pos_src.astype(self.dtype),
            tokens.astype(self.dtype),
            attn_sim=attn_sim,
            target_embedding=target_embedding,
        )
        iou_token_out = hs[:, 0, :]
        mask_tokens_out = hs[:, 1 : 1 + self.num_mask_tokens, :]

        # Upscale the per-prompt image embedding 64 -> 256.
        src = src.reshape(p, h, w, d)
        up = self.upscale_conv1(src)
        up = self.upscale_norm(up)
        up = gelu(up)
        up = self.upscale_conv2(up)
        up = gelu(up)  # (P, 4h, 4w, d//8)

        hyper_in = jnp.stack(
            [
                self.output_hypernetworks_mlps[i](mask_tokens_out[:, i, :])
                for i in range(self.num_mask_tokens)
            ],
            axis=1,
        )  # (P, K, d//8)
        hh, ww = up.shape[1], up.shape[2]
        masks = jnp.einsum(
            "pkc,pxc->pkx", hyper_in, up.reshape(p, hh * ww, -1)
        ).reshape(p, self.num_mask_tokens, hh, ww)

        iou_pred = self.iou_prediction_head(iou_token_out)

        # --- PWD-Net ---------------------------------------------------------
        # Softmax-pool projected DINO features under each predicted mask
        # (reference :186-192; dino_feats_proj precomputed per image).
        if dino_feats_proj is None:
            cls_scores = jnp.zeros((p, self.num_mask_tokens, self.n_class))
        else:
            mask_weight = jax.nn.softmax(
                masks.reshape(p, self.num_mask_tokens, hh * ww).astype(jnp.float32),
                axis=-1,
            )
            pooled = jnp.einsum(
                "pkx,xc->pkc",
                mask_weight.astype(self.dtype),
                dino_feats_proj.reshape(hh * ww, -1).astype(self.dtype),
            )
            cls_scores = self.point_classifier(pooled, deterministic=deterministic)

        fused_token = jnp.concatenate(
            [
                jnp.broadcast_to(
                    iou_token_out[:, None, :], (p, self.num_mask_tokens, d)
                ),
                mask_tokens_out,
            ],
            axis=-1,
        )
        res_iou_pred = self.parallel_iou_head(
            fused_token, deterministic=deterministic
        )[..., 0]
        iou_pred = iou_pred + res_iou_pred

        sl = slice(0, None) if multimask_output else slice(0, 1)
        return (
            masks[:, sl].astype(jnp.float32),
            iou_pred[:, sl].astype(jnp.float32),
            cls_scores[:, sl].astype(jnp.float32),
        )

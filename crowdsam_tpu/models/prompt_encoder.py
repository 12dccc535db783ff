"""Prompt encoder: random-Fourier positional encoding + learned point/box/mask
embeddings.

Behavioural contract: reference `segment_anything_cs/modeling/prompt_encoder.py`
(PositionEmbeddingRandom :175-218, point embedding with padding point
:75-93, box corners :95-102, mask downscaling :51-59, no-mask embed
:167-170).  The gaussian PE matrix is a torch *buffer* in the reference; we
store it as a parameter named like the checkpoint key so conversion is
uniform (it is frozen via the trainable-param mask during training).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from crowdsam_tpu.models.common import ChannelLayerNorm, gelu


class PromptEncoder(nn.Module):
    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    dtype: Any = jnp.float32

    def setup(self):
        num_pos_feats = self.embed_dim // 2
        self.pe_gaussian = self.param(
            "pe_gaussian",
            nn.initializers.normal(stddev=1.0),
            (2, num_pos_feats),
        )
        # 4 point embeddings: pos/neg point + 2 box corners (reference :45-47).
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, self.embed_dim)
        )
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.mask_downscaling = [
            nn.Conv(self.mask_in_chans // 4, (2, 2), strides=(2, 2),
                    dtype=self.dtype, name="mask_down_0"),
            ChannelLayerNorm(dtype=self.dtype, name="mask_down_1"),
            nn.Conv(self.mask_in_chans, (2, 2), strides=(2, 2),
                    dtype=self.dtype, name="mask_down_3"),
            ChannelLayerNorm(dtype=self.dtype, name="mask_down_4"),
            nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="mask_down_6"),
        ]

    # -- positional encoding --------------------------------------------------
    def _pe_encoding(self, coords: jnp.ndarray) -> jnp.ndarray:
        """[0,1]-normalized coords (..., 2) -> (..., embed_dim) PE
        (reference :189-196)."""
        coords = 2 * coords - 1
        coords = coords @ self.pe_gaussian.astype(coords.dtype)
        coords = 2 * math.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)

    def get_dense_pe(self) -> jnp.ndarray:
        """(H, W, embed_dim) dense grid PE (reference :198-209; NHWC here)."""
        h, w = self.image_embedding_size
        y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(
            jnp.meshgrid(x, y, indexing="xy"), axis=-1
        )  # (h, w, 2) as (x, y)
        return self._pe_encoding(grid)

    # -- prompt embedding -----------------------------------------------------
    def _embed_points(self, points, labels, pad: bool) -> jnp.ndarray:
        """(B,N,2),(B,N) -> (B,N[+1],embed_dim) (reference :75-93).

        labels: 1 pos, 0 neg, -1 padding/not-a-point.
        """
        points = points + 0.5  # pixel-center shift
        if pad:
            b = points.shape[0]
            points = jnp.concatenate(
                [points, jnp.zeros((b, 1, 2), points.dtype)], axis=1
            )
            labels = jnp.concatenate(
                [labels, -jnp.ones((b, 1), labels.dtype)], axis=1
            )
        coords = points / jnp.asarray(
            [self.input_image_size[1], self.input_image_size[0]],
            dtype=jnp.float32,
        )
        pe = self._pe_encoding(coords.astype(jnp.float32))
        lab = labels[..., None]
        pe = jnp.where(lab == -1, self.not_a_point_embed[0], pe)
        pe = pe + jnp.where(lab == 0, self.point_embeddings[0], 0.0)
        pe = pe + jnp.where(lab == 1, self.point_embeddings[1], 0.0)
        return pe

    def _embed_boxes(self, boxes) -> jnp.ndarray:
        """(B,4) xyxy -> (B,2,embed_dim) corner embeddings (reference :95-102)."""
        boxes = boxes + 0.5
        coords = boxes.reshape(-1, 2, 2) / jnp.asarray(
            [self.input_image_size[1], self.input_image_size[0]],
            dtype=jnp.float32,
        )
        pe = self._pe_encoding(coords.astype(jnp.float32))
        pe = pe.at[:, 0, :].add(self.point_embeddings[2])
        pe = pe.at[:, 1, :].add(self.point_embeddings[3])
        return pe

    def _embed_masks(self, masks) -> jnp.ndarray:
        """(B,Hm,Wm,1) -> (B,h,w,embed_dim) dense embedding (reference :104-107)."""
        x = masks
        x = self.mask_downscaling[0](x)
        x = self.mask_downscaling[1](x)
        x = gelu(x)
        x = self.mask_downscaling[2](x)
        x = self.mask_downscaling[3](x)
        x = gelu(x)
        x = self.mask_downscaling[4](x)
        return x

    def __call__(
        self,
        points: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        boxes: Optional[jnp.ndarray] = None,
        masks: Optional[jnp.ndarray] = None,
    ):
        """-> (sparse (B,N,embed_dim), dense (B,h,w,embed_dim))
        (reference :130-172)."""
        if points is not None:
            bs = points[0].shape[0]
        elif boxes is not None:
            bs = boxes.shape[0]
        elif masks is not None:
            bs = masks.shape[0]
        else:
            bs = 1

        sparse = jnp.zeros((bs, 0, self.embed_dim), dtype=jnp.float32)
        if points is not None:
            coords, labels = points
            sparse = jnp.concatenate(
                [sparse, self._embed_points(coords, labels, pad=(boxes is None))],
                axis=1,
            )
        if boxes is not None:
            sparse = jnp.concatenate([sparse, self._embed_boxes(boxes)], axis=1)

        if masks is not None:
            dense = self._embed_masks(masks)
        else:
            h, w = self.image_embedding_size
            dense = jnp.broadcast_to(
                self.no_mask_embed.reshape(1, 1, 1, -1), (bs, h, w, self.embed_dim)
            )
        return sparse, dense

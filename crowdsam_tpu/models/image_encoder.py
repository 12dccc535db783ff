"""SAM image encoder: ViTDet-style ViT with windowed + global attention and
decomposed relative position bias.

Behavioural contract: reference `segment_anything_cs/modeling/image_encoder.py`
(ViT-L config at `build_sam.py:27-35`: embed 1024 / depth 24 / heads 16 /
window 14 / global blocks [5,11,17,23] / neck to 256ch).

TPU-native design:
- NHWC end to end; attention runs as batched einsums on the MXU in the
  compute dtype with f32 softmax.
- Windowed blocks reshape (B,64,64,C) -> (B*25,14,14,C) with bottom-right
  zero padding (the reference also lets padded tokens attend — semantics
  preserved, reference `image_encoder.py:243-264`).
- The q_size==k_size relative-position tables are static gathers, so XLA
  constant-folds the (2S-1,d) -> (S,S,d) lookup per block.
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from crowdsam_tpu.models.common import ChannelLayerNorm, LayerNorm, MLPBlock


def _rel_pos_table(rel_pos: jnp.ndarray, size: int) -> jnp.ndarray:
    """(L, d) table -> (size, size, d) per-pair embeddings.

    Same-size q/k specialization of reference `get_rel_pos`
    (`image_encoder.py:292-322`).  When the stored table length L differs
    from 2*size-1 (rectangular encode: a global block runs at a grid
    smaller than the parameter's native resolution), the table is linearly
    interpolated exactly like the reference's `F.interpolate(...,
    mode="linear")` (align_corners=False = half-pixel centers, which is
    jax.image.resize "linear" without antialias).
    """
    max_rel_dist = 2 * size - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos.astype(jnp.float32),
            (max_rel_dist, rel_pos.shape[1]),
            method="linear",
            antialias=False,
        ).astype(rel_pos.dtype)
    coords = (
        jnp.arange(size)[:, None] - jnp.arange(size)[None, :] + (size - 1)
    )
    return rel_pos[coords]


def add_decomposed_rel_pos(
    attn: jnp.ndarray,
    q: jnp.ndarray,
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    hw: Tuple[int, int],
) -> jnp.ndarray:
    """attn (B*, H*W, H*W) += q·Rh + q·Rw (reference `image_encoder.py:325-361`)."""
    h, w = hw
    bh, _, dim = q.shape
    rh = _rel_pos_table(rel_pos_h, h).astype(q.dtype)
    rw = _rel_pos_table(rel_pos_w, w).astype(q.dtype)
    r_q = q.reshape(bh, h, w, dim)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw)
    attn = attn.reshape(bh, h, w, h, w)
    attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    return attn.reshape(bh, h * w, h * w)


class Attention(nn.Module):
    """MHA over an (B, H, W, C) token grid with decomposed rel-pos bias
    (reference `image_encoder.py:185-240`)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (14, 14)
    # When > 0, `x` arrives UNPARTITIONED (B, H, W, C) and windowed attention
    # runs as one fused Pallas kernel per window (scores/bias/softmax stay in
    # VMEM; no partition/unpartition transposes).  Exact same math as the
    # dense path (tests/test_window_attention.py).
    fused_window: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        if self.fused_window > 0:
            from crowdsam_tpu.models.attention import window_attention_pallas

            ws = self.fused_window
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * ws - 1, head_dim)
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * ws - 1, head_dim)
            )
            hp, wp = -(-h // ws) * ws, -(-w // ws) * ws
            # Pad BEFORE the qkv projection so pad tokens carry the qkv bias,
            # exactly like the reference's pad-then-project window partition
            # (image_encoder.py:243-254).
            x_pad = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
            qkv = nn.Dense(
                self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                name="qkv",
            )(x_pad)
            rh = _rel_pos_table(rel_pos_h, ws).astype(self.dtype)
            rw = _rel_pos_table(rel_pos_w, ws).astype(self.dtype)
            out = window_attention_pallas(
                qkv, rh, rw, num_heads=self.num_heads, scale=scale, window=ws
            )[:, :h, :w]
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)

        qkv = nn.Dense(
            self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv"
        )(x)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, b * self.num_heads, h * w, head_dim)
        q, k, v = qkv[0], qkv[1], qkv[2]

        rel_pos_h = rel_pos_w = None
        if self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h",
                nn.initializers.zeros,
                (2 * self.input_size[0] - 1, head_dim),
            )
            rel_pos_w = self.param(
                "rel_pos_w",
                nn.initializers.zeros,
                (2 * self.input_size[1] - 1, head_dim),
            )

        from crowdsam_tpu.models.attention import (
            flash_enabled,
            flash_mha_decomposed_relpos,
        )

        if (
            flash_enabled(self.dtype)
            and h * w >= 1024
            and self.use_rel_pos
        ):
            # Global block: flash attention with the rel-pos bias folded
            # into QK^T via head augmentation (exact logits).
            rh = _rel_pos_table(rel_pos_h, h)
            rw = _rel_pos_table(rel_pos_w, w)
            out = flash_mha_decomposed_relpos(
                q.reshape(b, self.num_heads, h * w, head_dim).astype(jnp.bfloat16),
                k.reshape(b, self.num_heads, h * w, head_dim).astype(jnp.bfloat16),
                v.reshape(b, self.num_heads, h * w, head_dim).astype(jnp.bfloat16),
                sm_scale=scale, rel_h=rh, rel_w=rw, hw=(h, w),
            ).reshape(b * self.num_heads, h * w, head_dim)
        else:
            attn = jnp.einsum("bqc,bkc->bqk", q * scale, k)
            if self.use_rel_pos:
                attn = add_decomposed_rel_pos(
                    attn, q, rel_pos_h, rel_pos_w, (h, w)
                )
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
            out = jnp.einsum("bqk,bkc->bqc", attn, v)
        out = out.reshape(b, self.num_heads, h, w, head_dim)
        out = out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


def window_partition(x: jnp.ndarray, window_size: int):
    """(B,H,W,C) -> (B*nW, ws, ws, C) with zero pad (reference :243-264)."""
    b, h, w, c = x.shape
    pad_h = (window_size - h % window_size) % window_size
    pad_w = (window_size - w % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window_size, window_size, wp // window_size, window_size, c)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, c)
    return windows, (hp, wp)


def window_unpartition(windows, window_size: int, pad_hw, hw):
    """Inverse of `window_partition` (reference :267-289)."""
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window_size // window_size)
    x = windows.reshape(
        b, hp // window_size, wp // window_size, window_size, window_size, -1
    )
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class Block(nn.Module):
    """Pre-LN transformer block with optional window attention
    (reference `image_encoder.py:119-182`)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_rel_pos: bool = True
    window_size: int = 0
    input_size: Tuple[int, int] = (64, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from crowdsam_tpu.models.attention import flash_enabled

        shortcut = x
        x = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm1")(x)
        fused_window = (
            self.window_size > 0
            and self.use_rel_pos
            and flash_enabled(self.dtype)
            and not os.environ.get("CROWDSAM_DISABLE_FUSED_WINDOW")
        )
        if self.window_size > 0 and not fused_window:
            h, w = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
        attn_size = (
            (self.window_size, self.window_size)
            if self.window_size > 0
            else self.input_size
        )
        x = Attention(
            dim=self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            use_rel_pos=self.use_rel_pos,
            input_size=attn_size,
            fused_window=self.window_size if fused_window else 0,
            dtype=self.dtype,
            name="attn",
        )(x)
        if self.window_size > 0 and not fused_window:
            x = window_unpartition(x, self.window_size, pad_hw, (h, w))
        x = shortcut + x
        y = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm2")(x)
        y = MLPBlock(
            mlp_dim=int(self.dim * self.mlp_ratio),
            out_dim=self.dim,
            dtype=self.dtype,
            name="mlp",
        )(y)
        return x + y


class ImageEncoderViT(nn.Module):
    """SAM image encoder (reference `image_encoder.py:17-116`).

    Input: (B, img_size, img_size, 3) normalized float.
    Output: (B, img_size/16, img_size/16, out_chans) NHWC embedding.
    """

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    out_chans: int = 256
    qkv_bias: bool = True
    use_abs_pos: bool = True
    use_rel_pos: bool = True
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (5, 11, 17, 23)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_interm: bool = False):
        """When `return_interm` is set, also returns the output of the first
        global-attention block — the early ViT feature the HQ-SAM decoder
        fuses (reference `modeling/mask_decoder_hq.py:129,188` uses
        `interm_embeddings[0]`, the first entry of the global-block outputs
        collected by the HQ image encoder)."""
        grid = self.img_size // self.patch_size
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        gh, gw = x.shape[1], x.shape[2]
        if self.use_abs_pos:
            pos_embed = self.param(
                "pos_embed", nn.initializers.zeros, (1, grid, grid, self.embed_dim)
            )
            # Rectangular encode (tpu.rect_encode): a sub-square input is
            # the top-left crop of the padded square frame, so it takes the
            # matching pos-embed crop — per-position values identical to
            # the square path.
            x = x + pos_embed[:, :gh, :gw].astype(x.dtype)

        interm = None
        first_global = min(self.global_attn_indexes) if self.global_attn_indexes else -1
        for i in range(self.depth):
            x = Block(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                use_rel_pos=self.use_rel_pos,
                window_size=self.window_size if i not in self.global_attn_indexes else 0,
                input_size=(grid, grid),
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x)
            if return_interm and i == first_global:
                interm = x

        x = nn.Conv(
            self.out_chans, (1, 1), use_bias=False, dtype=self.dtype, name="neck_0"
        )(x)
        x = ChannelLayerNorm(dtype=self.dtype, name="neck_1")(x)
        x = nn.Conv(
            self.out_chans,
            (3, 3),
            padding=1,
            use_bias=False,
            dtype=self.dtype,
            name="neck_2",
        )(x)
        x = ChannelLayerNorm(dtype=self.dtype, name="neck_3")(x)
        if return_interm:
            return x, interm
        return x

"""TinyViT image encoder — the `mobile_sam` / `vit_t` arch.

Behavioural contract: reference `segment_anything_cs/build_sam.py:47-86`
configures `TinyViT(img_size=1024, embed_dims=[64,128,160,320],
depths=[2,2,6,2], num_heads=[2,4,5,10], window_sizes=[7,7,14,7],
mlp_ratio=4., mbconv_expand_ratio=4.0, local_conv_size=3)` from the
external `mobile_sam` package (the symbol is never imported anywhere in the
reference tree, so its vit_t registry entry is dead code without that
package; here the encoder is first-party).  Architecture follows the public
TinyViT-5M SAM variant (arXiv 2207.10666 + MobileSAM arXiv 2306.14289):

- PatchEmbed: two 3x3 stride-2 convs (4x downsample) with GELU between;
- stage 0: MBConv blocks (1x1 expand -> 3x3 depthwise -> 1x1 project,
  GELU activations, post-residual GELU);
- stages 1-3: window attention (trainable attention-bias tables over
  symmetric relative offsets, no shift) -> 3x3 depthwise local conv ->
  MLP; PatchMerging (1x1 -> depthwise 3x3 stride-2 -> 1x1) between stages,
  with the MobileSAM adaptation that the merge into the 320-dim stage uses
  STRIDE 1 so the final grid stays img/16 (= SAM's 64x64 at 1024);
- SAM neck: 1x1 conv -> LayerNorm2d -> 3x3 conv -> LayerNorm2d to 256ch.

TPU-native notes: every Conv2d+BatchNorm pair is folded into a biased conv
at checkpoint conversion (inference-only encoder; `utils/checkpoint.py::
convert_tiny_vit`), so the modules here are plain convs.  Attention biases
are compact (heads, n_offsets) tables expanded through a static numpy index
map that XLA constant-folds; window partition is a reshape/transpose pair
identical to the SAM ViT encoder's.  NHWC end to end, bf16 compute with
f32 LayerNorm statistics.
"""

from __future__ import annotations

import itertools
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from crowdsam_tpu.models.common import ChannelLayerNorm, LayerNorm, gelu


def _attention_bias_idxs(h: int, w: int) -> np.ndarray:
    """Static (N, N) index map into the symmetric-offset bias table."""
    points = list(itertools.product(range(h), range(w)))
    offsets = {}
    idxs = []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    return np.asarray(idxs, dtype=np.int32).reshape(len(points), len(points))


def num_bias_offsets(h: int, w: int) -> int:
    return h * w  # symmetric |dy| in [0,h), |dx| in [0,w)


class MBConv(nn.Module):
    """Inverted-residual conv block (stage 0)."""

    dim: int
    expand_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.expand_ratio)
        shortcut = x
        x = nn.Conv(hidden, (1, 1), dtype=self.dtype, name="conv1")(x)
        x = gelu(x)
        x = nn.Conv(
            hidden, (3, 3), padding=1, feature_group_count=hidden,
            dtype=self.dtype, name="conv2",
        )(x)
        x = gelu(x)
        x = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="conv3")(x)
        return gelu(shortcut + x)


class PatchMerging(nn.Module):
    """Downsample + channel change between stages.

    MobileSAM quirk preserved: merging into a 320/448/576-dim stage uses
    stride 1 (keeps the SAM 64x64 output grid)."""

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        stride = 1 if self.out_dim in (320, 448, 576) else 2
        x = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="conv1")(x)
        x = gelu(x)
        x = nn.Conv(
            self.out_dim, (3, 3), strides=stride, padding=1,
            feature_group_count=self.out_dim, dtype=self.dtype, name="conv2",
        )(x)
        x = gelu(x)
        x = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="conv3")(x)
        return x


class TinyAttention(nn.Module):
    """Window attention with trainable relative-position bias tables.

    q/k use `key_dim` per head, v uses `attn_ratio * key_dim` (the TinyViT
    asymmetric head layout); a LayerNorm is folded into the module like the
    original (`Attention.norm`)."""

    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: float = 1.0
    resolution: Tuple[int, int] = (7, 7)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, N, dim), N == resolution[0]*resolution[1]
        b, n, _ = x.shape
        h, w = self.resolution
        d = int(self.attn_ratio * self.key_dim)
        nh = self.num_heads
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(
            (self.key_dim * 2 + d) * nh, dtype=self.dtype, name="qkv"
        )(x)
        qkv = qkv.reshape(b, n, nh, self.key_dim * 2 + d)
        q = qkv[..., : self.key_dim].transpose(0, 2, 1, 3)
        k = qkv[..., self.key_dim : 2 * self.key_dim].transpose(0, 2, 1, 3)
        v = qkv[..., 2 * self.key_dim :].transpose(0, 2, 1, 3)

        biases = self.param(
            "attention_biases", nn.initializers.zeros,
            (nh, num_bias_offsets(h, w)),
        )
        idxs = jnp.asarray(_attention_bias_idxs(h, w))  # (N, N) static
        bias = biases[:, idxs]  # (nh, N, N) — constant-folded gather

        scale = self.key_dim**-0.5
        attn = jnp.einsum("bhqc,bhkc->bhqk", q * scale, k)
        attn = attn + bias.astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d * nh)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class TinyViTBlock(nn.Module):
    """Window attention -> depthwise local conv -> MLP (one stage block)."""

    dim: int
    num_heads: int
    window_size: int
    input_resolution: Tuple[int, int]
    mlp_ratio: float = 4.0
    local_conv_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shortcut = x
        if h == ws and w == ws:
            y = TinyAttention(
                dim=self.dim, key_dim=self.dim // self.num_heads,
                num_heads=self.num_heads, attn_ratio=1.0,
                resolution=(ws, ws), dtype=self.dtype, name="attn",
            )(x.reshape(b, h * w, c)).reshape(b, h, w, c)
        else:
            pad_h = (ws - h % ws) % ws
            pad_w = (ws - w % ws) % ws
            xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            hp, wp = h + pad_h, w + pad_w
            xp = xp.reshape(b, hp // ws, ws, wp // ws, ws, c)
            xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
            y = TinyAttention(
                dim=self.dim, key_dim=self.dim // self.num_heads,
                num_heads=self.num_heads, attn_ratio=1.0,
                resolution=(ws, ws), dtype=self.dtype, name="attn",
            )(xp)
            y = y.reshape(b, hp // ws, wp // ws, ws, ws, c)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
            y = y[:, :h, :w]
        x = shortcut + y

        lc = self.local_conv_size
        # NOTE: the local conv output REPLACES x (no skip) in TinyViT.
        x = nn.Conv(
            self.dim, (lc, lc), padding=lc // 2, feature_group_count=self.dim,
            dtype=self.dtype, name="local_conv",
        )(x)

        y = LayerNorm(dtype=self.dtype, name="mlp_norm")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="fc1")(y)
        y = gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + y


class TinyViT(nn.Module):
    """TinyViT-5M SAM image encoder.

    Input: (B, img_size, img_size, 3) normalized float.
    Output: (B, img_size/16, img_size/16, out_chans) NHWC embedding —
    drop-in for ImageEncoderViT in the Sam bundle."""

    img_size: int = 1024
    embed_dims: Sequence[int] = (64, 128, 160, 320)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (2, 4, 5, 10)
    window_sizes: Sequence[int] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    mbconv_expand_ratio: float = 4.0
    local_conv_size: int = 3
    out_chans: int = 256
    dtype: Any = jnp.float32

    # Sam-bundle interface parity with ImageEncoderViT:
    patch_size: int = 16  # effective output stride

    @property
    def depth(self) -> int:
        return sum(self.depths)

    @property
    def embed_dim(self) -> int:
        return self.embed_dims[-1]

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        # PatchEmbed: two stride-2 3x3 convs (4x downsample).
        x = nn.Conv(self.embed_dims[0] // 2, (3, 3), strides=2, padding=1,
                    dtype=dt, name="patch_embed_0")(x)
        x = gelu(x)
        x = nn.Conv(self.embed_dims[0], (3, 3), strides=2, padding=1,
                    dtype=dt, name="patch_embed_2")(x)

        res = self.img_size // 4
        n_stages = len(self.depths)
        for s in range(n_stages):
            dim = self.embed_dims[s]
            if s == 0:
                for i in range(self.depths[0]):
                    x = MBConv(
                        dim=dim, expand_ratio=self.mbconv_expand_ratio,
                        dtype=dt, name=f"layers_0_blocks_{i}",
                    )(x)
            else:
                for i in range(self.depths[s]):
                    x = TinyViTBlock(
                        dim=dim,
                        num_heads=self.num_heads[s],
                        window_size=self.window_sizes[s],
                        input_resolution=(res, res),
                        mlp_ratio=self.mlp_ratio,
                        local_conv_size=self.local_conv_size,
                        dtype=dt,
                        name=f"layers_{s}_blocks_{i}",
                    )(x)
            if s < n_stages - 1:
                out_dim = self.embed_dims[s + 1]
                x = PatchMerging(
                    out_dim=out_dim, dtype=dt, name=f"layers_{s}_downsample"
                )(x)
                if out_dim not in (320, 448, 576):
                    res = res // 2

        # SAM neck (same stack as ImageEncoderViT).
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=dt,
                    name="neck_0")(x)
        x = ChannelLayerNorm(dtype=dt, name="neck_1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False,
                    dtype=dt, name="neck_2")(x)
        x = ChannelLayerNorm(dtype=dt, name="neck_3")(x)
        return x

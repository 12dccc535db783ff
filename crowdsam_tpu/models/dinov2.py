"""DINOv2 vision transformer (ViT-L/14) as a first-party JAX model.

Replaces the reference's torch.hub DINOv2 dependency
(`crowdsam/model.py:33-36`, `predictor.py:104-106`; the dinov2 repo is a git
submodule there, not vendored).  Matches the public DINOv2 architecture for
`dinov2_vitl14`: patch 14, embed 1024, depth 24, heads 16, mlp ratio 4,
LayerScale (init 1e-5), LN eps 1e-6, cls token, no register tokens;
`forward_features` returns the final-norm patch tokens.

The pipeline feeds it 1022x1022 inputs -> 73x73 patch tokens
(predictor contract, reference `predictor.py:104-106`); the 37x37 pretrain
positional grid is bicubic-interpolated to the call-time grid, which is a
static shape so XLA folds it into the weights.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from crowdsam_tpu.models.common import LayerNorm, gelu


class DinoAttention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from crowdsam_tpu.models.attention import flash_enabled, flash_mha

        b, n, _ = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if flash_enabled(self.dtype) and n >= 1024:
            out = flash_mha(
                q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                v.astype(jnp.bfloat16), sm_scale=head_dim**-0.5, valid_len=n,
            )
        else:
            attn = jnp.einsum("bhqc,bhkc->bhqk", q, k) * (head_dim**-0.5)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class DinoBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    ls_init: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma1 = self.param(
            "ls1_gamma", nn.initializers.constant(self.ls_init), (self.dim,)
        )
        gamma2 = self.param(
            "ls2_gamma", nn.initializers.constant(self.ls_init), (self.dim,)
        )
        y = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm1")(x)
        y = DinoAttention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(y)
        x = x + y * gamma1.astype(y.dtype)
        y = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        y = nn.Dense(hidden, dtype=self.dtype, name="mlp_fc1")(y)
        y = gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y * gamma2.astype(y.dtype)


class DinoVisionTransformer(nn.Module):
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    pretrain_img_size: int = 518  # -> 37x37 positional grid
    ls_init: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos_hw=None) -> Dict[str, jnp.ndarray]:
        """x: (B, H, W, 3) normalized float NHWC; H, W divisible by 14.

        `pos_hw`: optional (H_pos, W_pos) grid the positional embedding is
        interpolated TO before taking the top-left (gh, gw) crop.  Used by
        the rectangular-encode mode: a rect input that is the top band of a
        larger square frame must keep the SAME per-position embeddings as
        the square call, so pos interp targets the square grid and the rect
        grid takes its crop (documented deviation; reference DINOv2 always
        interpolates to the call grid).

        Returns {"x_norm_clstoken": (B, C), "x_norm_patchtokens": (B, N, C)}.
        """
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size

        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = x.reshape(b, gh * gw, self.embed_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )
        n_pre = self.pretrain_img_size // self.patch_size
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, n_pre * n_pre + 1, self.embed_dim),
        )
        cls_pos = pos_embed[:, :1]
        patch_pos = pos_embed[:, 1:].reshape(1, n_pre, n_pre, self.embed_dim)
        ph, pw = pos_hw if pos_hw is not None else (gh, gw)
        if (ph, pw) != (n_pre, n_pre):
            # torch-exact bicubic (a=-0.75) via static resize matrices.
            from crowdsam_tpu.ops.resize import resize_bicubic_torch

            patch_pos = resize_bicubic_torch(
                patch_pos.astype(jnp.float32), (ph, pw)
            )
        patch_pos = patch_pos[:, :gh, :gw].reshape(1, gh * gw, self.embed_dim)

        x = x + patch_pos.astype(x.dtype)
        cls = jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)) + cls_pos
        x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)

        for i in range(self.depth):
            x = DinoBlock(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                ls_init=self.ls_init,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x)

        x = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm")(x)
        return {
            "x_norm_clstoken": x[:, 0],
            "x_norm_patchtokens": x[:, 1:],
        }


def dinov2_vitl14(dtype=jnp.float32) -> DinoVisionTransformer:
    return DinoVisionTransformer(
        patch_size=14, embed_dim=1024, depth=24, num_heads=16,
        mlp_ratio=4.0, dtype=dtype,
    )


def dinov2_vitb14(dtype=jnp.float32) -> DinoVisionTransformer:
    return DinoVisionTransformer(
        patch_size=14, embed_dim=768, depth=12, num_heads=12,
        mlp_ratio=4.0, dtype=dtype,
    )


def dinov2_vits14(dtype=jnp.float32) -> DinoVisionTransformer:
    return DinoVisionTransformer(
        patch_size=14, embed_dim=384, depth=12, num_heads=6,
        mlp_ratio=4.0, dtype=dtype,
    )


dino_model_registry = {
    "dinov2_vitl14": dinov2_vitl14,
    "dinov2_vitb14": dinov2_vitb14,
    "dinov2_vits14": dinov2_vits14,
}

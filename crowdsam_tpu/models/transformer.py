"""Two-way transformer (tokens <-> image cross-attention decoder core).

Behavioural contract: reference `segment_anything_cs/modeling/transformer.py`
(2 layers x [token self-attn, token->image cross-attn with optional additive
`attn_sim` post-softmax bias + re-softmax, MLP 2048, image->token cross-attn],
then final token->image attention + LN; internal attention dim downsampled
2x, :195-254).

Runs batched over the prompt axis — (P, N_tok, C) tokens against (P, N_img, C)
image keys — so hundreds of prompts decode as one MXU-friendly einsum batch.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from crowdsam_tpu.models.common import LayerNorm, MLPBlock


class Attention(nn.Module):
    """Projection attention with internal downsampling (reference :195-254)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, attn_sim: Optional[jnp.ndarray] = None):
        internal_dim = self.embedding_dim // self.downsample_rate
        head_dim = internal_dim // self.num_heads

        q = nn.Dense(internal_dim, dtype=self.dtype, name="q_proj")(q)
        k = nn.Dense(internal_dim, dtype=self.dtype, name="k_proj")(k)
        v = nn.Dense(internal_dim, dtype=self.dtype, name="v_proj")(v)

        def split(x):
            b, n, c = x.shape
            return x.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("bhqc,bhkc->bhqk", q, k) / (head_dim**0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        if attn_sim is not None:
            # Post-softmax additive bias followed by re-softmax
            # (reference transformer.py:245-247).
            attn = jax.nn.softmax(attn + attn_sim.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn.astype(v.dtype), v)
        b, h, n, c = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * c)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    """(reference `transformer.py:117-192`)."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe, attn_sim=None):
        # 1. token self-attention
        if self.skip_first_layer_pe:
            queries = Attention(
                self.embedding_dim, self.num_heads, dtype=self.dtype,
                name="self_attn",
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            attn_out = Attention(
                self.embedding_dim, self.num_heads, dtype=self.dtype,
                name="self_attn",
            )(q, q, queries)
            queries = queries + attn_out
        queries = LayerNorm(dtype=self.dtype, name="norm1")(queries)

        # 2. token -> image cross-attention
        q = queries + query_pe
        k = keys + key_pe
        attn_out = Attention(
            self.embedding_dim, self.num_heads,
            downsample_rate=self.attention_downsample_rate, dtype=self.dtype,
            name="cross_attn_token_to_image",
        )(q, k, keys, attn_sim=attn_sim)
        queries = queries + attn_out
        queries = LayerNorm(dtype=self.dtype, name="norm2")(queries)

        # 3. MLP on tokens
        mlp_out = MLPBlock(
            mlp_dim=self.mlp_dim, out_dim=self.embedding_dim,
            act=nn.relu, dtype=self.dtype, name="mlp",
        )(queries)
        queries = queries + mlp_out
        queries = LayerNorm(dtype=self.dtype, name="norm3")(queries)

        # 4. image -> token cross-attention
        q = queries + query_pe
        k = keys + key_pe
        attn_out = Attention(
            self.embedding_dim, self.num_heads,
            downsample_rate=self.attention_downsample_rate, dtype=self.dtype,
            name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = keys + attn_out
        keys = LayerNorm(dtype=self.dtype, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """(reference `transformer.py:16-114`).

    Inputs here are sequence-major: image_embedding (B, N_img, C) with its PE,
    point_embedding (B, N_tok, C).  Returns (processed tokens, processed image).
    """

    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_embedding: jnp.ndarray,
        image_pe: jnp.ndarray,
        point_embedding: jnp.ndarray,
        attn_sim: Optional[jnp.ndarray] = None,
        target_embedding: Optional[jnp.ndarray] = None,
    ):
        queries = point_embedding
        keys = image_embedding

        for i in range(self.depth):
            if target_embedding is not None:
                queries = queries + target_embedding
            queries, keys = TwoWayAttentionBlock(
                embedding_dim=self.embedding_dim,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                attention_downsample_rate=self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                dtype=self.dtype,
                name=f"layers_{i}",
            )(queries, keys, point_embedding, image_pe, attn_sim)

        q = queries + point_embedding
        k = keys + image_pe
        if target_embedding is not None:
            q = q + target_embedding
        attn_out = Attention(
            self.embedding_dim, self.num_heads,
            downsample_rate=self.attention_downsample_rate, dtype=self.dtype,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = queries + attn_out
        queries = LayerNorm(dtype=self.dtype, name="norm_final_attn")(queries)
        return queries, keys

"""Shared layers (contract: reference `segment_anything_cs/modeling/common.py`
and the MLP/DropMLP heads in `modeling/mask_decoder.py:204-254`)."""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def gelu(x):
    """Exact (erf) GELU, matching torch nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


class MLPBlock(nn.Module):
    """lin -> act -> lin (reference `common.py:13-26`)."""

    mlp_dim: int
    out_dim: int
    act: Callable = gelu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x)
        x = self.act(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="lin2")(x)


def _ln_impl(x, weight, bias, eps, compute_dtype):
    """LayerNorm over the last axis.  On TPU with bf16 compute, dispatches
    to the fused Pallas kernel (read-once/write-once); with unaligned
    channel counts it keeps the data in bf16 with f32 statistic
    accumulation (half the HBM traffic of the f32 path).  The two-pass f32
    jnp path is the reference semantics used everywhere else."""
    if compute_dtype == jnp.bfloat16:
        from crowdsam_tpu.ops.layernorm import fused_layer_norm

        out = fused_layer_norm(x, weight, bias, eps=eps)
        if out is not None:
            return out
        xb = x.astype(jnp.bfloat16)
        u = jnp.mean(xb, axis=-1, keepdims=True, dtype=jnp.float32)
        s = jnp.mean(
            jnp.square(xb.astype(jnp.float32) - u), axis=-1, keepdims=True
        )
        y = (xb.astype(jnp.float32) - u) * jax.lax.rsqrt(s + eps)
        return (y * weight + bias).astype(x.dtype)
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    u = x.mean(axis=-1, keepdims=True)
    s = jnp.square(x - u).mean(axis=-1, keepdims=True)
    x = (x - u) / jnp.sqrt(s + eps)
    return (x * weight + bias).astype(orig_dtype)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis of NHWC tensors.

    Equivalent to the reference's `LayerNorm2d` (`common.py:31-43`, which is
    channel-wise LN on NCHW) under our NHWC layout.  Statistics in f32
    regardless of compute dtype.
    """

    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return _ln_impl(x, weight, bias, self.eps, self.dtype)


class LayerNorm(nn.Module):
    """Plain LayerNorm with torch naming (weight/bias); f32 statistics."""

    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return _ln_impl(x, weight, bias, self.eps, self.dtype)


class ConvTranspose2x2(nn.Module):
    """ConvTranspose2d(kernel=2, stride=2) as Dense + depth-to-space.

    With non-overlapping 2x2 blocks, transposed convolution is exactly a
    per-pixel linear map to (2*2*out) channels followed by pixel-shuffle —
    a pure MXU matmul with unambiguous layout (output[2i+di, 2j+dj, o] =
    sum_c x[i,j,c] * W[c, di, dj, o]), which the checkpoint converter maps
    from torch's (in, out, kh, kw) weight without kernel-flip concerns.
    """

    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        y = nn.Dense(4 * self.out_features, dtype=self.dtype, name="dense")(x)
        y = y.reshape(b, h, w, 2, 2, self.out_features)
        y = y.transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, 2 * h, 2 * w, self.out_features)


class MLP(nn.Module):
    """ReLU MLP head (reference `mask_decoder.py:204-226`)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.hidden_dim if i < self.num_layers - 1 else self.output_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


class DropMLP(nn.Module):
    """ReLU MLP with dropout after hidden layers (reference
    `mask_decoder.py:228-254`, p=0.1; dropout active only in training)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False
    p: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.num_layers):
            out = self.hidden_dim if i < self.num_layers - 1 else self.output_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
                x = nn.Dropout(rate=self.p, deterministic=deterministic)(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x

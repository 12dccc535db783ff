"""Fused LayerNorm Pallas kernel.

XLA lowers a hand-written LayerNorm to ~6 HBM passes (reduction
materializations + casts): measured 1.28 ms for (5330, 1024) f32 on the
bench chip (~317 GB/s HBM) — as expensive as the whole transformer MLP.
This kernel reads each row-block once into VMEM, computes f32 statistics
(single-pass E[x^2] - mu^2), and writes the normalized output once: the
theoretical 2-pass minimum.

Used by models.common.{LayerNorm, ChannelLayerNorm} when running on TPU
with bf16 compute; the two-pass jnp path remains the reference semantics
(and the CPU/parity-test path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, w_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=1, keepdims=True) - jnp.square(mu)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * w_ref[:] + b_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows"))
def layer_norm_2d(x, weight, bias, eps: float = 1e-6, block_rows: int = 256):
    """(N, D) -> (N, D) row-wise LayerNorm; D must be a multiple of 128."""
    n, d = x.shape
    padded = -(-n // block_rows) * block_rows
    if padded != n:
        x = jnp.pad(x, ((0, padded - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((padded, d), x.dtype),
        grid=(padded // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x, weight.reshape(1, d).astype(jnp.float32),
      bias.reshape(1, d).astype(jnp.float32))
    return out[:n] if padded != n else out


def fused_layer_norm(x, weight, bias, eps: float = 1e-6):
    """LayerNorm over the last axis of (..., D) via the Pallas kernel.

    Falls back to None (caller uses the jnp path) when the shape is
    unsuitable (D not lane-aligned) or the backend is not TPU."""
    import os

    # Default ON: with the flash/window attention kernels in place, the
    # full-encoder A/B flipped — SAM ViT-L encode 66.1 ms (jnp LN) vs
    # 48.6 ms (Pallas LN).  The original opt-in verdict (124.2 vs 117.1)
    # predates those kernels.  CROWDSAM_DISABLE_PALLAS_LN opts out.
    if os.environ.get("CROWDSAM_DISABLE_PALLAS_LN"):
        return None
    d = x.shape[-1]
    if d % 128 != 0:
        return None
    try:
        if jax.default_backend() != "tpu":
            return None
    except Exception:
        return None
    lead = x.shape[:-1]
    n = 1
    for s in lead:
        n *= s
    if n < 1024:
        # Tiny tensors (e.g. the decoder's per-token LNs inside the EPS
        # loop): a Mosaic launch costs more than the fusion saves.
        return None
    block = 256 if n >= 256 else max(16, -(-n // 16) * 16)
    out = layer_norm_2d(x.reshape(n, d), weight, bias, eps=eps,
                        block_rows=block)
    return out.reshape(*lead, d)

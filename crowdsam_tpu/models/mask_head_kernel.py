"""Fused Pallas mask-head kernel for the EPS decode loop.

The packed mask head (`fused_decode.py` packed branch, mirroring reference
`modeling/mask_decoder.py:56-62,177-183`) is HBM-bound: per 32-prompt
iteration it materializes up1 (P,4096,4,64), the LayerNorm'd/gelu'd copy,
and up2 (P,4096,16,32) — ~450 MB of intermediate traffic to produce 16 MB
of masks.  This kernel keeps the whole chain in VMEM per (prompt, m-tile)
grid step: read the keys2 tile once, write the packed masks tile once.

Layout tricks (Mosaic-friendly, no sublane reshapes):
- the (m, 4, 64) group structure stays flattened as 256 lanes; the
  group-wise LayerNorm uses matmuls against a (256, 4) group indicator to
  compute per-group mean/E[x^2] and broadcast them back;
- the second conv-transpose becomes a block-diagonal (256, 512) matmul
  (4 copies of the (64, 128) kernel), keeping the q1-major lane order;
- the hypernetwork contraction is a (512, 16*K) matmul against
  H[row, k*16+q] = hyper[k, row%32] * (row//32 == q), built from
  broadcasts and an iota compare.

Numerics match the XLA packed branch: bf16 operands, f32 accumulation,
bf16 rounding after each stage, f32 LayerNorm statistics, exact-erf GELU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def mask_head_kernel_enabled(dtype) -> bool:
    if os.environ.get("CROWDSAM_DISABLE_MASK_HEAD_KERNEL"):
        return False
    if dtype != jnp.bfloat16:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def build_mask_head_weights(dec_params, dtype):
    """Precompute the kernel's weight layout from mask-decoder params.

    Returns a dict to pass through `precompute_decode_shared`'s shared
    tensors (computed once per image, outside the decode loop):
      w0 (256, 4*c1), b0 (4*c1)        — upscale_0 dense
      ln_w/ln_b (4*c1)                 — upscale_1 LN params tiled over q1
      w1bd (4*c1, 4*4*c2), b1 (4*4*c2) — upscale_3 as block-diagonal
    """
    w0 = dec_params["upscale_0"]["dense"]["kernel"].astype(dtype)
    b0 = dec_params["upscale_0"]["dense"]["bias"].astype(jnp.float32)
    lnw = dec_params["upscale_1"]["weight"].astype(jnp.float32)
    lnb = dec_params["upscale_1"]["bias"].astype(jnp.float32)
    c1 = lnw.shape[0]
    w2 = dec_params["upscale_3"]["dense"]["kernel"]  # (c1, 4*c2)
    b2 = dec_params["upscale_3"]["dense"]["bias"]
    d2 = w2.shape[1]
    w1bd = jnp.zeros((4 * c1, 4 * d2), w2.dtype)
    for g in range(4):
        w1bd = w1bd.at[g * c1 : (g + 1) * c1, g * d2 : (g + 1) * d2].set(w2)
    return {
        "w0": w0,
        "b0": b0,
        "ln_w": jnp.tile(lnw, 4),
        "ln_b": jnp.tile(lnb, 4),
        "w1bd": w1bd.astype(dtype),
        "b1": jnp.tile(b2, 4).astype(jnp.float32),
    }


def _gelu_erf(x):
    """Exact-erf GELU via the Abramowitz-Stegun 7.1.26 rational erf
    approximation (|err| <= 1.5e-7 in f32 — invisible after the bf16
    rounding that follows).  Mosaic has no erf/erfc lowering; exp is
    supported."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    z = x * 0.7071067811865475
    az = jnp.abs(z)
    t = 1.0 / (1.0 + p * az)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    erf_abs = 1.0 - poly * jnp.exp(-az * az)
    erf = jnp.where(z >= 0, erf_abs, -erf_abs)
    return 0.5 * x * (1.0 + erf)


def _kernel(keys_ref, hyper_ref, w0_ref, b0_ref, lnw_ref, lnb_ref,
            w1_ref, b1_ref, out_ref, *refs, c1: int, c2: int, num_masks: int,
            eps: float, emit_exp: bool = False):
    f32 = jnp.float32
    x = keys_ref[0]                                   # (TM, C) bf16

    up1 = jax.lax.dot_general(
        x, w0_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=f32
    ) + b0_ref[...]                                   # (TM, 4*c1) f32
    # Round to bf16 like the XLA dense stage before the LN statistics.
    up1 = up1.astype(jnp.bfloat16).astype(f32)
    n_lanes = up1.shape[-1]

    # Group LayerNorm over each c1-lane group via indicator matmuls.
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_lanes, 4), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (n_lanes, 4), 1)
    gmat = (lane // c1 == grp).astype(f32)            # (4*c1, 4)
    inv = 1.0 / c1
    m1 = jax.lax.dot_general(
        up1, gmat, (((1,), (0,)), ((), ())), preferred_element_type=f32
    ) * inv                                           # (TM, 4)
    m2 = jax.lax.dot_general(
        up1 * up1, gmat, (((1,), (0,)), ((), ())), preferred_element_type=f32
    ) * inv
    gmat_t = gmat.T                                   # (4, 4*c1)
    mb = jax.lax.dot_general(
        m1, gmat_t, (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    vb = jax.lax.dot_general(
        m2 - m1 * m1, gmat_t, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    xn = (up1 - mb) * jax.lax.rsqrt(vb + eps)
    xn = xn * lnw_ref[...] + lnb_ref[...]
    xn = _gelu_erf(xn.astype(jnp.bfloat16).astype(f32))

    up2 = jax.lax.dot_general(
        xn.astype(jnp.bfloat16), w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b1_ref[...]                                   # (TM, 4*4*c2)
    up2 = _gelu_erf(up2.astype(jnp.bfloat16).astype(f32))
    up2 = up2.astype(jnp.bfloat16)

    # Hypernetwork contraction against the per-prompt H matrix (built in
    # XLA outside the kernel — Mosaic rejects the reshape gymnastics, and
    # it is tiny: (16*c2, K*16) per prompt).
    masks = jax.lax.dot_general(
        up2, hyper_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                 # (TM, K*16)
    # The (K, TM, 16) reorder happens outside the kernel (Mosaic rejects
    # the lane-split reshape; it's a cheap XLA transpose of the output).
    out_ref[0] = masks.astype(out_ref.dtype)

    if emit_exp:
        # PWD-pooling support: e = exp(masks - block max) and the block
        # max, so the XLA pooling needs no separate max/exp passes over
        # the mask slab.  The max is GLOBAL over the block (all K masks):
        # the softmax weights stay correct after the per-block rescale in
        # XLA (exp(c_j - M)), and a trailing mask's denominator is guarded
        # there (same scheme as decode_tail_kernel's image_update).
        import jax.experimental.pallas as pl

        e_ref, mx_ref = refs
        c_blk = jnp.max(masks)
        e_ref[0] = jnp.exp(masks - c_blk).astype(e_ref.dtype)
        j = pl.program_id(1)
        mx_ref[0, j, :] = jnp.full((mx_ref.shape[-1],), c_blk, jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("num_masks", "tile_m", "interpret", "emit_exp")
)
def mask_head_pallas(keys2, hyper_in, weights, num_masks: int = 4,
                     tile_m: int = 1024, interpret: bool = False,
                     emit_exp: bool = False):
    """keys2 (P, M, C) bf16, hyper_in (P, K, c2) -> packed masks
    (P, K, M, 16) bf16 (same values as the XLA packed branch).

    With emit_exp=True additionally returns (e, mx): e (P, M, K*16) bf16 =
    exp(mask - block max) in the kernel's pre-reorder lane layout, and
    mx (P, n_blocks) f32 block maxes — the PWD pooling's softmax
    numerator terms, combined in fused_decode._pooled_from_exp."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p, m, c = keys2.shape
    c2 = hyper_in.shape[-1]
    c1 = weights["ln_w"].shape[0] // 4
    tm = min(tile_m, m)
    assert m % tm == 0

    # Per-prompt hypernetwork matrix H[p, g16*c2 + ch, k*16 + q] =
    # hyper[p, k, ch] * (g16 == q) — built here (XLA) where reshapes are
    # free; (P, 16*c2, K*16) is ~2 MB total.
    d = 16 * c2
    n_out = num_masks * 16
    hv = jnp.broadcast_to(
        hyper_in.astype(jnp.bfloat16)[:, None, :, :], (p, 16, num_masks, c2)
    )                                                 # (P, q, K, c2)
    hv = hv.transpose(0, 1, 3, 2).reshape(p, d, num_masks)[:, :, :, None]
    hv = jnp.broadcast_to(hv, (p, d, num_masks, 16)).reshape(p, d, n_out)
    rows_q = jax.lax.broadcasted_iota(jnp.int32, (d, n_out), 0) // c2
    cols_q = jax.lax.broadcasted_iota(jnp.int32, (d, n_out), 1) % 16
    h_mat = hv * (rows_q == cols_q).astype(jnp.bfloat16)

    kern = functools.partial(
        _kernel, c1=c1, c2=c2, num_masks=num_masks, eps=1e-6,
        emit_exp=emit_exp,
    )
    grid = (p, m // tm)
    nblk = m // tm
    out_specs = [pl.BlockSpec((1, tm, n_out), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((p, m, n_out), jnp.bfloat16)]
    if emit_exp:
        out_specs += [
            pl.BlockSpec((1, tm, n_out), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # one block-max row per j step; the (i, 0, 0) block stays in
            # VMEM across the consecutive j steps of each i
            pl.BlockSpec((1, max(8, nblk), 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((p, m, n_out), jnp.bfloat16),
            jax.ShapeDtypeStruct((p, max(8, nblk), 128), jnp.float32),
        ]
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tm, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, n_out), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights["w0"].shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights["b0"].shape, lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights["ln_w"].shape, lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights["ln_b"].shape, lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights["w1bd"].shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(weights["b1"].shape, lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(
        keys2.astype(jnp.bfloat16),
        h_mat,
        weights["w0"],
        weights["b0"],
        weights["ln_w"],
        weights["ln_b"],
        weights["w1bd"],
        weights["b1"],
    )
    # (P, M, K*16) -> (P, K, M, 16): cheap XLA transpose of the output.
    if emit_exp:
        masks_o, e_o, mx_o = out
        masks_o = masks_o.reshape(p, m, num_masks, 16).transpose(0, 2, 1, 3)
        return masks_o, e_o, mx_o[:, :nblk, 0]
    (masks_o,) = out
    return masks_o.reshape(p, m, num_masks, 16).transpose(0, 2, 1, 3)

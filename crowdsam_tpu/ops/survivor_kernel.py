"""Fused Pallas survivor-tail kernel: the crowded-regime hot path.

Per post-NMS survivor the host tail needs, at image resolution: the
bilinear-upsampled binarized mask with low-res cleanup edits applied, its
bit-packed bitmap, its bounding box, and the Fortran-order RLE change
positions (reference semantics: `mask_to_rle_pytorch` amg.py:107-135 over
masks postprocessed per sam.py:132-161 + `postprocess_small_regions` edits
model.py:394-443).  The XLA pipeline for this work costs ~1.27 ms/slot at
crowded buckets — dominated by the change extraction's full-resolution
transposes/cumsum/argmax passes (~0.86 ms/slot measured; see
tools/profile_survivor_parts.py) — because every stage materializes
(K, S, S) intermediates in HBM.

This kernel processes one mask per grid step entirely in VMEM, reading the
(R, R) low-res logits once (R = S/4) and writing only compact outputs
(packed bits S*S/8 + a (16, S) i32 summary).  Everything is expressed as
matmuls over small constant operators so the MXU does the heavy lifting
and no Mosaic-unfriendly reshapes/transposes appear:

- bilinear 4x upsample  = M_row (S, R) @ logits @ M_col (R, S)
  (exact `jax.image.resize(..., "linear", antialias=False)` weights);
- nearest edit expansion = E_row @ edit @ E_col with 0/1 indicators;
- vertical predecessor   = SHIFT_DOWN (S, S) @ mask, with the Fortran
  column-start fix (first row compares against the previous column's last
  valid element) via a one-hot row and a lane-shift matmul;
- bit packing            = mask @ W_PACK (S, S/8) with power-of-two
  weights (exact in f32 accumulation);
- per-column change rows = iterative masked row-min extraction
  (_COL_SLOTS rounds of where/min reductions — no cumsum), packed three
  10-bit row positions per int32 lane so 24 slots ship in 8 i32 rows
  (rows are < S <= 1024; empty slots clamp to S-1 and are never read —
  the host walks exactly n_col entries per column).

_COL_SLOTS is 24 (r3): trained person-sized masks have ragged upsampled
boundaries whose worst column crosses ~10-22 times (measured p50 10 /
max 22 at the trained bench operating point, tools/profile_packed_fallback
.py); the r2 budget of 8 routed ~60% of crowded masks to the packed-bitmap
fallback — whose host unpack+encode cost ~40 ms/mask and dominated the r3
first bench capture (3.3 s/img).  The packing keeps the host transfer at
the r2 size.

Numerics: interpolation runs in f32 on bf16 inputs (MXU f32 accumulation);
mask bits can differ from the XLA path only where an upsampled logit sits
within float rounding of the threshold (same class of boundary-pixel
wiggle as the other bf16 kernels; the A/B tests bound it).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_COL_SLOTS = 24       # per-column change-row budget (see module docstring)
_CAND_WORDS = _COL_SLOTS // 3  # 3 x 10-bit positions packed per i32 lane


def survivor_kernel_enabled() -> bool:
    if os.environ.get("CROWDSAM_DISABLE_SURVIVOR_KERNEL"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.lru_cache(maxsize=4)
def _constants(r: int):
    """Constant operators for R -> S=4R upsampling/packing (numpy, cached)."""
    s = 4 * r
    # Bilinear resize weights (half-pixel centers, edge clamp) — identical
    # to jax.image.resize "linear" with antialias=False at scale 4.
    def lin_weights(n_out, n_in):
        w = np.zeros((n_out, n_in), np.float32)
        for o in range(n_out):
            pos = (o + 0.5) * n_in / n_out - 0.5
            lo = int(np.floor(pos))
            frac = pos - lo
            lo_c = min(max(lo, 0), n_in - 1)
            hi_c = min(max(lo + 1, 0), n_in - 1)
            w[o, lo_c] += 1.0 - frac
            w[o, hi_c] += frac
        return w

    m = lin_weights(s, r)
    m_row = m                       # (S, R)
    m_col = np.ascontiguousarray(m.T)  # (R, S)

    e = np.zeros((s, r), np.float32)
    e[np.arange(s), np.arange(s) // 4] = 1.0
    e_row = e                       # (S, R) nearest
    e_col = np.ascontiguousarray(e.T)

    w_pack = np.zeros((s, s // 8), np.float32)
    for x in range(s):
        w_pack[x, x // 8] = float(1 << (7 - (x % 8)))

    return m_row, m_col, e_row, e_col, w_pack


def _kernel(hw_ref, logits_ref, edit_ref, mrow_ref, mcol_ref, erow_ref,
            ecol_ref, wpack_ref, packed_ref, misc_ref,
            *, r: int, thresh: float, stage: int = 3):
    f32 = jnp.float32
    s = 4 * r
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    in_h = hw_ref[i, 0]
    in_w = hw_ref[i, 1]

    lg = logits_ref[0].astype(f32)                     # (R, R)
    # Separable bilinear upsample as two MXU matmuls.
    expanded = jax.lax.dot_general(
        lg, mcol_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                   # (R, S)
    up = jax.lax.dot_general(
        mrow_ref[...], expanded, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                   # (S, S)
    full = (up > thresh).astype(f32)

    # Low-res cleanup edits, nearest-expanded: +1 force on, -1 force off.
    ed = edit_ref[0].astype(f32)
    ed_cols = jax.lax.dot_general(
        ed, ecol_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    ed_full = jax.lax.dot_general(
        erow_ref[...], ed_cols, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    full = jnp.where(ed_full > 0.5, 1.0, jnp.where(ed_full < -0.5, 0.0, full))

    # Valid-region mask.
    row_i = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    inside = (row_i < in_h) & (col_i < in_w)
    full = jnp.where(inside, full, 0.0)

    # Bit-pack (bf16 operands are exact for 0/1 x power-of-two weights;
    # f32 accumulation, values <= 255).
    full_bf = full.astype(jnp.bfloat16)
    packed = jax.lax.dot_general(
        full_bf, wpack_ref[...].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=f32,
    )
    # Mosaic has no f32->uint8 cast; write i32, narrow in XLA outside.
    packed_ref[0] = packed.astype(jnp.int32)

    if stage < 1:
        misc_ref[0] = jnp.zeros((16, s), jnp.int32)
        return
    # Bounding box + nonempty.
    big = jnp.float32(s)
    col_any = jnp.max(full, axis=0, keepdims=True)      # (1, S)
    row_any = jnp.max(full, axis=1, keepdims=True)      # (S, 1)
    lane_f = col_i[:1].astype(f32)                      # (1, S)
    sub_f = row_i[:, :1].astype(f32)                    # (S, 1)
    x0 = jnp.min(jnp.where(col_any > 0, lane_f, big))
    x1 = jnp.max(jnp.where(col_any > 0, lane_f, -1.0))
    y0 = jnp.min(jnp.where(row_any > 0, sub_f, big))
    y1 = jnp.max(jnp.where(row_any > 0, sub_f, -1.0))
    nonempty = jnp.max(full)
    # Empty masks report [0,0,0,0] (reference batched_mask_to_box).
    x0 = jnp.where(nonempty > 0, x0, 0.0)
    x1 = jnp.where(nonempty > 0, x1, 0.0)
    y0 = jnp.where(nonempty > 0, y0, 0.0)
    y1 = jnp.where(nonempty > 0, y1, 0.0)

    # Fortran-order change map: within a column, compare with the row
    # above; row 0 compares with the previous column's last valid element.
    from jax.experimental.pallas import tpu as pltpu

    prev = jnp.where(
        row_i == 0, 0.0, pltpu.roll(full, 1, 0)
    )                                                   # rows 1.. <- above
    lastrow_onehot = (row_i == (in_h - 1)).astype(f32)  # (S, S) row mask
    last_valid = jnp.max(full * lastrow_onehot, axis=0, keepdims=True)
    last_shift = jnp.where(
        col_i[:1] == 0, 0.0, pltpu.roll(last_valid, 1, 1)
    )                                                   # (1, S), lane 0 = 0
    prev = prev + (row_i == 0).astype(f32) * last_shift
    change = jnp.where(inside, (full != prev).astype(f32), 0.0)

    n_col = jnp.sum(change, axis=0, keepdims=True)      # (1, S) f32 exact
    total = jnp.sum(n_col)
    overflow = jnp.max(n_col) > float(_COL_SLOTS)

    # First _COL_SLOTS change rows per column by iterative masked row-min,
    # packed 3 x 10-bit per int32 word (empty slots clamp to S-1; the host
    # walks exactly n_col entries per column, so the sentinel is never
    # read).
    remaining = change if stage >= 3 else jnp.zeros_like(change)
    cand_rows = []
    sub_iota = row_i.astype(f32)
    for _ in range(_COL_SLOTS):
        pos = jnp.min(
            jnp.where(remaining > 0, sub_iota, big), axis=0, keepdims=True
        )                                               # (1, S)
        cand_rows.append(
            jnp.minimum(pos, float(s - 1)).astype(jnp.int32))
        remaining = jnp.where(sub_iota == pos, 0.0, remaining)
    cand_words = [
        cand_rows[3 * t] * 1048576 + cand_rows[3 * t + 1] * 1024
        + cand_rows[3 * t + 2]
        for t in range(_CAND_WORDS)
    ]

    lane1 = lane_f[0]                                   # (S,)
    scal = jnp.where(lane1 == 0, x0,
           jnp.where(lane1 == 1, y0,
           jnp.where(lane1 == 2, x1,
           jnp.where(lane1 == 3, y1,
           jnp.where(lane1 == 4, nonempty,
           jnp.where(lane1 == 5, total,
           jnp.where(lane1 == 6, overflow.astype(f32), 0.0)))))))
    misc = jnp.concatenate(
        cand_words
        + [n_col.astype(jnp.int32), scal[None].astype(jnp.int32),
           jnp.zeros((16 - _CAND_WORDS - 2, s), jnp.int32)],
        axis=0,
    )                                                   # (16, S)
    misc_ref[0] = misc


@functools.partial(jax.jit, static_argnames=("thresh", "interpret", "stage"))
def survivor_rle_pallas(logits, edit, in_hw, thresh: float = 0.0,
                        interpret: bool = False, stage: int = 3):
    """logits (K, R, R) bf16/f32, edit (K, R, R) int8 in {-1, 0, +1},
    in_hw (2,) or per-mask (K, 2) int32 -> dict:
      packed (K, S, S//8) uint8 — upsampled+edited+valid-masked mask bits
      cand   (K, 8, S) int32    — first _COL_SLOTS=24 change rows per
                                  column, 3 x 10-bit packed per word
                                  (ops.rle.unpack_cand10 to decode; empty
                                  slots clamp to S-1, never read)
      n_col  (K, S) int32       — change count per column
      summary (K, 8) int32      — [x0, y0, x1, y1, nonempty, total_changes,
                                   overflow, 0]
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k, r, _ = logits.shape
    s = 4 * r
    # Keep the caller's float dtype: the kernel upcasts to f32 before the
    # upsample matmuls either way, so a bf16 downcast here would only
    # introduce threshold-adjacent bit flips vs the XLA path (which
    # binarizes f32) — at zero perf gain.  (ADVICE r2: the engine slab is
    # bf16, so production inputs are unchanged; f32 callers now match the
    # XLA path exactly.)
    lg_in = logits if logits.dtype in (jnp.bfloat16, jnp.float32) \
        else logits.astype(jnp.float32)
    in_hw = jnp.asarray(in_hw, jnp.int32)
    if in_hw.ndim == 1:
        in_hw = jnp.broadcast_to(in_hw[None], (k, 2))
    consts = [jnp.asarray(c) for c in _constants(r)]

    kern = functools.partial(_kernel, r=r, thresh=float(thresh), stage=stage)
    out = pl.pallas_call(
        kern,
        grid=(k,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, r, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(c.shape, lambda i: (0,) * c.ndim,
                         memory_space=pltpu.VMEM)
            for c in consts
        ],
        out_specs=[
            pl.BlockSpec((1, s, s // 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, s, s // 8), jnp.int32),
            jax.ShapeDtypeStruct((k, 16, s), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(in_hw.astype(jnp.int32), lg_in, edit.astype(jnp.int8), *consts)

    packed, misc = out
    return {
        "packed": packed.astype(jnp.uint8),
        # 3 x 10-bit packed change rows per lane; decode with
        # ops.rle.unpack_cand10 (host) before svals_from_cand.
        "cand": misc[:, :_CAND_WORDS, :],
        "n_col": misc[:, _CAND_WORDS, :],
        "summary": misc[:, _CAND_WORDS + 1, :8],
    }

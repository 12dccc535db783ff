"""Flash-attention dispatch for the ViT backbones.

Uses the pallas TPU flash kernel with block sizes tuned on the bench chip
(dense 5.56 ms vs flash 3.56 ms per DINOv2-sized block at 5376 tokens;
the default BlockSizes lose to dense — see PERF.md).  Sequences pad to a
block multiple with segment-id masking.  Enabled only on TPU with bf16
compute; the dense path remains the reference semantics everywhere else.

SAM's global blocks carry the decomposed relative-position bias
(image_encoder.py contract).  The bias is content-dependent
(q·Rh[qh,kh] + q·Rw[qw,kw]), so instead of materializing a (H, N, N) bias
(that materialization is exactly what flash avoids), it is folded into
QK^T exactly by augmenting the heads:

    q' = [q * scale, q@Rh[qh], q@Rw[qw]]      (head_dim 64 -> 192)
    k' = [k,        onehot(kh), onehot(kw)]

so q'·k' = scale·q·k + q·Rh[qh,kh] + q·Rw[qw,kw], bit-for-bit the same
attention logits (up to bf16 rounding).
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def flash_enabled(dtype) -> bool:
    if os.environ.get("CROWDSAM_DISABLE_FLASH"):
        return False
    if dtype != jnp.bfloat16:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@lru_cache(maxsize=128)
def _block_sizes(seq: int, head_dim: int):
    """Tile sizes tuned on the bench chip (see PERF.md), scaled down for
    large head dims so q/k/v tiles + the f32 scores tile stay inside the
    ~16 MB VMEM scoped limit.

    Kernel invariants (flash_attention.py `_verify_block` + the
    `BlockSizes.__post_init__` major/minor check) enforced by
    construction, for EVERY 128-multiple `seq`:

      - block_k_major | seq  and  block_k | seq   (picked from the
        128-multiple divisors of seq)
      - block_k | block_k_major                   (picked from the
        128-multiple divisors of block_k_major, which transitively
        divide seq)
      - block_q <= seq (need not divide: the kernel cdiv's the q axis)

    The r3 driver bench crashed here ("block_k=256 should divide
    block_k_major=640"): the old code picked block_k independently from
    the divisors of seq, so rect patch grids whose padded length had
    coprime-ish divisor structure (e.g. 40x64 -> s_pad 2560 -> bkm 640,
    bk 256) violated the major/minor invariant.  The shape sweep in
    tests/test_flash_dispatch.py brute-forces every reachable grid.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    def divs(n: int, limit: int):
        limit = max(128, min(limit, n))
        return [m * 128 for m in range(1, limit // 128 + 1) if n % (m * 128) == 0]

    scale = max(1, head_dim // 64)
    bq = max(divs(seq, 1024 // scale))
    bkm = max(divs(seq, 4096 // scale))
    bk = max(divs(bkm, min(bq, bkm)))
    return BlockSizes(
        block_q=bq, block_k_major=bkm, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bkm,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bkm, block_k_dq=bk, block_q_dq=bq,
    )


def flash_mha(q, k, v, sm_scale: float, valid_len: Optional[int] = None):
    """(B, H, S, D) flash attention; pads S to a 128 multiple with segment
    masking when valid_len < padded length.  D must be <=128 or a multiple
    of 128 (pad the head dim yourself)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    b, h, s, d = q.shape
    s_pad = -(-s // 128) * 128
    seg = None
    if s_pad != s or (valid_len is not None and valid_len < s_pad):
        pad = s_pad - s
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vlen = valid_len if valid_len is not None else s
        ids = (jnp.arange(s_pad) >= vlen).astype(jnp.int32)[None]
        ids = jnp.broadcast_to(ids, (b, s_pad))
        seg = SegmentIds(q=ids, kv=ids)
    out = flash_attention(
        q, k, v, segment_ids=seg, sm_scale=sm_scale, causal=False,
        block_sizes=_block_sizes(s_pad, q.shape[-1]),
    )
    return out[:, :, :s]


@lru_cache(maxsize=8)
def _axis_onehots(h: int, w: int):
    """(h*w, h) / (h*w, w) one-hot row / column indicators (numpy consts)."""
    rows = np.repeat(np.arange(h), w)
    cols = np.tile(np.arange(w), h)
    oh_r = np.zeros((h * w, h), np.float32)
    oh_r[np.arange(h * w), rows] = 1.0
    oh_c = np.zeros((h * w, w), np.float32)
    oh_c[np.arange(h * w), cols] = 1.0
    return oh_r, oh_c


def flash_mha_decomposed_relpos(q, k, v, sm_scale: float, rel_h, rel_w,
                                hw) -> jnp.ndarray:
    """Global SAM attention with decomposed rel-pos folded into QK^T.

    q, k, v: (B, H, S, D) with S = h*w; rel_h/rel_w: (h, h, D)/(w, w, D)
    per-pair tables (already gathered).  Exact logits vs the dense
    add_decomposed_rel_pos path.
    """
    hh, ww = hw
    b, nh, s, d = q.shape
    assert s == hh * ww

    # f_h[n, j] = sum_c q[n, c] * rel_h[row(n), j, c]
    qr = q.reshape(b, nh, hh, ww, d)
    fh = jnp.einsum("bhrwc,rjc->bhrwj", qr, rel_h.astype(q.dtype))
    fw = jnp.einsum("bhrwc,wjc->bhrwj", qr, rel_w.astype(q.dtype))
    fh = fh.reshape(b, nh, s, hh)
    fw = fw.reshape(b, nh, s, ww)

    oh_r, oh_c = _axis_onehots(hh, ww)
    oh_r = jnp.asarray(oh_r, dtype=q.dtype)
    oh_c = jnp.asarray(oh_c, dtype=q.dtype)
    kr = jnp.broadcast_to(oh_r[None, None], (b, nh, s, hh))
    kc = jnp.broadcast_to(oh_c[None, None], (b, nh, s, ww))

    q_aug = jnp.concatenate([q * sm_scale, fh, fw], axis=-1)
    k_aug = jnp.concatenate([k, kr, kc], axis=-1)
    d_aug = q_aug.shape[-1]
    d_pad = -(-d_aug // 128) * 128 if d_aug > 128 else d_aug
    if d_pad != d_aug:
        q_aug = jnp.pad(q_aug, ((0, 0),) * 3 + ((0, d_pad - d_aug),))
        k_aug = jnp.pad(k_aug, ((0, 0),) * 3 + ((0, d_pad - d_aug),))
    v_pad = jnp.pad(v, ((0, 0),) * 3 + ((0, d_pad - d),)) if d_pad != d else v
    out = flash_mha(q_aug, k_aug, v_pad, sm_scale=1.0)
    return out[..., :d]


def window_attention_pallas(qkv, rel_h_tab, rel_w_tab, num_heads: int,
                            scale: float, window: int,
                            interpret: bool = False):
    """Fused windowed attention with decomposed rel-pos bias.

    qkv: (B, Hp, Wp, 3*dim) — the qkv projection of the zero-PADDED
    normalized input (Hp/Wp multiples of `window`; pad pixels carry the qkv
    bias exactly as the reference, which pads before the projection —
    image_encoder.py:243-254).  rel_h_tab/rel_w_tab: (window, window, hd)
    same-size rel-pos tables.  Returns (B, Hp, Wp, dim).

    The rel-pos bias folds into QK^T by head augmentation (same trick as
    flash_mha_decomposed_relpos): q' = [q*scale, q@Rh[row], q@Rw[col]],
    k' = [k, onehot(row), onehot(col)].  Windows pad 196 -> 256 tokens with
    -inf key masking.  The Pallas kernel then is a pure per-window
    attention — 2D head slices, dots, masked softmax — whose f32 score
    tensors never leave VMEM (the dense path materializes ~60 MB of f32
    scores per layer in HBM).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from crowdsam_tpu.models.image_encoder import (
        window_partition,
        window_unpartition,
    )

    b, hp, wp, c3 = qkv.shape
    dim = c3 // 3
    hd = dim // num_heads
    ws = window
    n = ws * ws
    npad = -(-n // 128) * 128
    dtype = qkv.dtype

    win, _ = window_partition(qkv, ws)              # (nw, ws, ws, 3*dim)
    nw = win.shape[0]
    win = win.reshape(nw, n, c3)
    win = jnp.pad(win, ((0, 0), (0, npad - n), (0, 0)))

    q = win[..., :dim].reshape(nw, npad, num_heads, hd)
    k = win[..., dim : 2 * dim].reshape(nw, npad, num_heads, hd)
    v = win[..., 2 * dim :]

    # Head augmentation: per-token rel-pos rows/cols (static numpy indices).
    rows = np.minimum(np.arange(npad) // ws, ws - 1)
    cols = np.arange(npad) % ws
    rhq = rel_h_tab[jnp.asarray(rows)]              # (npad, ws, hd)
    rwq = rel_w_tab[jnp.asarray(cols)]
    fh = jnp.einsum("wqhc,qjc->wqhj", q, rhq.astype(dtype))
    fw = jnp.einsum("wqhc,qjc->wqhj", q, rwq.astype(dtype))
    ohr = np.zeros((npad, ws), np.float32)
    ohr[np.arange(n), rows[:n]] = 1.0
    ohc = np.zeros((npad, ws), np.float32)
    ohc[np.arange(n), cols[:n]] = 1.0

    aug = hd + 2 * ws
    augp = -(-aug // 128) * 128
    q_aug = jnp.concatenate([q * jnp.asarray(scale, dtype), fh, fw], axis=-1)
    k_aug = jnp.concatenate(
        [
            k,
            jnp.broadcast_to(jnp.asarray(ohr, dtype)[None, :, None, :],
                             (nw, npad, num_heads, ws)),
            jnp.broadcast_to(jnp.asarray(ohc, dtype)[None, :, None, :],
                             (nw, npad, num_heads, ws)),
        ],
        axis=-1,
    )
    if augp != aug:
        zpad = ((0, 0), (0, 0), (0, 0), (0, augp - aug))
        q_aug = jnp.pad(q_aug, zpad)
        k_aug = jnp.pad(k_aug, zpad)
    q_aug = q_aug.reshape(nw, npad, num_heads * augp)
    k_aug = k_aug.reshape(nw, npad, num_heads * augp)

    def kernel(qa_ref, ka_ref, v_ref, out_ref):
        valid = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 1) < n
        outs = []
        for h in range(num_heads):
            qh = qa_ref[0, :, h * augp : (h + 1) * augp]
            kh = ka_ref[0, :, h * augp : (h + 1) * augp]
            scores = jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                        # (npad, npad)
            scores = jnp.where(valid, scores, -jnp.inf)
            probs = jax.nn.softmax(scores, axis=-1)
            vh = v_ref[0, :, h * hd : (h + 1) * hd]
            outs.append(
                jax.lax.dot_general(
                    probs.astype(vh.dtype), vh,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(out_ref.dtype)
            )
        out_ref[0] = jnp.concatenate(outs, axis=-1)

    out = pl.pallas_call(
        kernel,
        grid=(nw,),
        in_specs=[
            pl.BlockSpec((1, npad, num_heads * augp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, num_heads * augp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, npad, dim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw, npad, dim), dtype),
        interpret=interpret,
    )(q_aug, k_aug, v)

    out = out[:, :n].reshape(nw, ws, ws, dim)
    return window_unpartition(out, ws, (hp, wp), (hp, wp))

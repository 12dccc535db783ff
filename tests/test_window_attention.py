"""Fused windowed attention (Pallas, interpret mode on CPU) vs the dense
reference path (window partition + einsum attention + decomposed rel-pos)."""

import jax
import jax.numpy as jnp
import numpy as np

from crowdsam_tpu.models.attention import window_attention_pallas
from crowdsam_tpu.models.image_encoder import (
    _rel_pos_table,
    add_decomposed_rel_pos,
    window_partition,
    window_unpartition,
)

WS = 7
HEADS = 4
HD = 8
DIM = HEADS * HD


def _dense_reference(x_pad, wqkv, bqkv, rel_pos_h, rel_pos_w):
    """Mirror of the module's windowed dense path on pre-padded input."""
    b, hp, wp, _ = x_pad.shape
    windows, _ = window_partition(x_pad, WS)  # (B*nw, ws, ws, dim)
    bw = windows.shape[0]
    qkv = windows @ wqkv + bqkv
    qkv = qkv.reshape(bw, WS * WS, 3, HEADS, HD)
    qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, bw * HEADS, WS * WS, HD)
    q, k, v = qkv[0], qkv[1], qkv[2]
    scale = HD ** -0.5
    attn = jnp.einsum("bqc,bkc->bqk", q * scale, k)
    attn = add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, (WS, WS))
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bqk,bkc->bqc", attn, v)
    out = out.reshape(bw, HEADS, WS, WS, HD)
    out = out.transpose(0, 2, 3, 1, 4).reshape(bw, WS, WS, DIM)
    return window_unpartition(out, WS, (hp, wp), (hp, wp))


def test_window_attention_matches_dense(rng):
    hp = wp = 2 * WS
    x_pad = jnp.asarray(rng.normal(0, 1, (1, hp, wp, DIM)).astype(np.float32))
    wqkv = jnp.asarray(rng.normal(0, 0.05, (DIM, 3 * DIM)).astype(np.float32))
    bqkv = jnp.asarray(rng.normal(0, 0.5, (3 * DIM,)).astype(np.float32))
    rel_pos_h = jnp.asarray(
        rng.normal(0, 0.5, (2 * WS - 1, HD)).astype(np.float32)
    )
    rel_pos_w = jnp.asarray(
        rng.normal(0, 0.5, (2 * WS - 1, HD)).astype(np.float32)
    )

    want = _dense_reference(x_pad, wqkv, bqkv, rel_pos_h, rel_pos_w)

    qkv = x_pad @ wqkv + bqkv
    rh = _rel_pos_table(rel_pos_h, WS)
    rw = _rel_pos_table(rel_pos_w, WS)
    got = window_attention_pallas(
        qkv, rh, rw, num_heads=HEADS, scale=HD ** -0.5, window=WS,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_window_attention_rect_grid(rng):
    """Rect-encode runs the fused window kernel on non-square padded grids
    (e.g. 3x2 windows); must match the dense path exactly there too."""
    hp, wp = 3 * WS, 2 * WS
    x_pad = jnp.asarray(rng.normal(0, 1, (1, hp, wp, DIM)).astype(np.float32))
    wqkv = jnp.asarray(rng.normal(0, 0.05, (DIM, 3 * DIM)).astype(np.float32))
    bqkv = jnp.asarray(rng.normal(0, 0.5, (3 * DIM,)).astype(np.float32))
    rel_pos_h = jnp.asarray(
        rng.normal(0, 0.5, (2 * WS - 1, HD)).astype(np.float32))
    rel_pos_w = jnp.asarray(
        rng.normal(0, 0.5, (2 * WS - 1, HD)).astype(np.float32))

    want = _dense_reference(x_pad, wqkv, bqkv, rel_pos_h, rel_pos_w)
    qkv = x_pad @ wqkv + bqkv
    got = window_attention_pallas(
        qkv, _rel_pos_table(rel_pos_h, WS), _rel_pos_table(rel_pos_w, WS),
        num_heads=HEADS, scale=HD ** -0.5, window=WS, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

"""Hoisted/low-rank mask-decoder decode path for the EPS engine hot loop.

Same math as `MaskDecoder.__call__` (reference
`segment_anything_cs/modeling/mask_decoder.py:92-199` +
`modeling/transformer.py`), reorganized for the point-prompt decode loop
where the dense prompt embedding is the shared `no_mask_embed`
(prompt_encoder.py:167-170) — i.e. the image-side input `src = image_emb +
dense` is identical for every prompt and every loop iteration.  Three
structural rewrites (all exact up to float reassociation):

1. **Hoist block-1 image projections.**  The first two-way block's
   token->image k/v and image->token q are projections of the *shared*
   `src` (+ the constant image PE), so they are computed once per image
   outside the `lax.while_loop`, not once per 32-prompt batch
   (transformer.py:156-166,183-188).

2. **Low-rank image updates.**  Each image->token attention adds
   `out_proj(attn @ v_tokens)` to the 4096-position image tensor; the update
   has rank <= n_tokens (7).  We fold `out_proj` into the 7 token value
   vectors and expand through the attention weights —
   `A @ (v_tok @ W_out)` — instead of projecting a (P, 4096, 128) tensor.

3. **PE folding + fused wide matmuls.**  `proj(keys + pe) = proj(keys) +
   proj(pe)`; the constant `proj(pe)` terms are precomputed, and block-2 /
   final-attention k, v (and block-2's image-side q) become one wide matmul
   over the per-prompt image tensor, reading it once.

The LayerNorm after every image->token attention (transformer.py norm4)
forces materialization of the per-prompt image tensor once per block —
that, the attention itself, and the upscaling head are the remaining
per-prompt work.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from crowdsam_tpu.models.common import _ln_impl, gelu


def _dense(x, p, dtype):
    return x.astype(dtype) @ p["kernel"].astype(dtype) + p["bias"].astype(dtype)


def _matmul(x, kernel, dtype):
    return x.astype(dtype) @ kernel.astype(dtype)


def _ln(x, p, dtype, eps=1e-5):
    return _ln_impl(x, p["weight"], p["bias"], eps, dtype)


def _heads(x, h):
    """(..., N, c) -> (..., h, N, c/h)."""
    *b, n, c = x.shape
    return x.reshape(*b, n, h, c // h).swapaxes(-2, -3)


def _merge(x):
    """(..., h, N, d) -> (..., N, h*d)."""
    *b, h, n, d = x.shape
    return x.swapaxes(-2, -3).reshape(*b, n, h * d)


def _softmax32(logits):
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def _token_self_attn(p, q, v, num_heads, dtype):
    """Full-dim token self-attention (transformer.py:195-254, rate 1)."""
    qh = _heads(_dense(q, p["q_proj"], dtype), num_heads)
    kh = _heads(_dense(q, p["k_proj"], dtype), num_heads)
    vh = _heads(_dense(v, p["v_proj"], dtype), num_heads)
    scale = 1.0 / math.sqrt(qh.shape[-1])
    attn = _softmax32(jnp.einsum("phtd,phsd->phts", qh, kh) * scale)
    out = jnp.einsum("phts,phsd->phtd", attn.astype(vh.dtype), vh)
    return _dense(_merge(out), p["out_proj"], dtype)


def _mlp_block(p, x, dtype):
    return _dense(jax.nn.relu(_dense(x, p["lin1"], dtype)), p["lin2"], dtype)


def _relu_mlp(params, x, depth, dtype):
    """MLP / deterministic DropMLP head (mask_decoder.py:204-254)."""
    for i in range(depth):
        x = _dense(x, params[f"layers_{i}"], dtype)
        if i < depth - 1:
            x = jax.nn.relu(x)
    return x


def _image_to_token_update(p, keys, q_img_h, queries, query_pe,
                           num_heads, dtype):
    """norm4(keys + out_proj(attn(q=image, k=tokens, v=tokens))) with the
    out-projection folded onto the 7 token value vectors (rewrite #2)."""
    k_tok = _heads(_dense(queries + query_pe, p["k_proj"], dtype), num_heads)
    v_tok = _heads(_dense(queries, p["v_proj"], dtype), num_heads)
    scale = 1.0 / math.sqrt(q_img_h.shape[-1])
    if q_img_h.ndim == 3:  # shared image-side q: (h, M, d)
        logits = jnp.einsum("hmd,phtd->phmt", q_img_h, k_tok) * scale
    else:                  # per-prompt: (p, h, M, d)
        logits = jnp.einsum("phmd,phtd->phmt", q_img_h, k_tok) * scale
    attn = _softmax32(logits).astype(dtype)
    c_out = p["out_proj"]["kernel"].shape[1]
    w_out = p["out_proj"]["kernel"].reshape(num_heads, -1, c_out)
    u = jnp.einsum("phtd,hdc->phtc", v_tok, w_out.astype(dtype))
    delta = jnp.einsum("phmt,phtc->pmc", attn, u)
    return keys + delta + p["out_proj"]["bias"].astype(dtype)


def precompute_decode_shared(
    dec_params,
    no_mask_embed: jnp.ndarray,     # (1, C) prompt_encoder no_mask_embed
    image_embeddings: jnp.ndarray,  # (1, h, w, C) or (h, w, C)
    image_pe: jnp.ndarray,          # (h, w, C)
    num_heads: int = 8,
    dtype: Any = jnp.float32,
):
    """Per-image shared tensors for `fused_decode` (rewrites #1 and #3).

    Computed once per image — inside the same jit as the EPS loop but
    outside `lax.while_loop`, so XLA runs it once.
    """
    t = dec_params["transformer"]
    emb = image_embeddings.reshape(image_embeddings.shape[-3:])
    h, w, c = emb.shape
    keys0 = (emb.astype(dtype) + no_mask_embed.reshape(1, 1, c).astype(dtype))
    keys0 = keys0.reshape(h * w, c)
    pe = image_pe.reshape(h * w, c).astype(dtype)

    l0t2i = t["layers_0"]["cross_attn_token_to_image"]
    l0i2t = t["layers_0"]["cross_attn_image_to_token"]
    l1t2i = t["layers_1"]["cross_attn_token_to_image"]
    l1i2t = t["layers_1"]["cross_attn_image_to_token"]
    fin = t["final_attn_token_to_image"]

    shared = {
        "keys0": keys0,
        "hw": (h, w),
        # Block 1: full image-side projections (shared across prompts).
        "k1h": _heads(_dense(keys0 + pe, l0t2i["k_proj"], dtype), num_heads),
        "v1h": _heads(_dense(keys0, l0t2i["v_proj"], dtype), num_heads),
        "q1ih": _heads(_dense(keys0 + pe, l0i2t["q_proj"], dtype), num_heads),
        # Block 2 + final: constant PE-side projection terms (biases folded
        # in here so the per-prompt matmul is bias-free).
        "kpe2": _dense(pe, l1t2i["k_proj"], dtype),
        "qpe2i": _dense(pe, l1i2t["q_proj"], dtype),
        "kpef": _dense(pe, fin["k_proj"], dtype),
        # Fused wide kernels (read the per-prompt image tensor once).
        "wide2": jnp.concatenate(
            [
                l1t2i["k_proj"]["kernel"],
                l1t2i["v_proj"]["kernel"],
                l1i2t["q_proj"]["kernel"],
            ],
            axis=1,
        ).astype(dtype),
        "widef": jnp.concatenate(
            [fin["k_proj"]["kernel"], fin["v_proj"]["kernel"]], axis=1
        ).astype(dtype),
        "bv2": l1t2i["v_proj"]["bias"].astype(dtype),
        "bvf": fin["v_proj"]["bias"].astype(dtype),
    }
    from crowdsam_tpu.models.mask_head_kernel import (
        build_mask_head_weights,
        mask_head_kernel_enabled,
    )

    if mask_head_kernel_enabled(dtype):
        # Weight layout for the fused Pallas mask head (built once per
        # image, outside the decode loop).
        shared["mask_head"] = build_mask_head_weights(dec_params, dtype)
    from crowdsam_tpu.models.decode_tail_kernel import (
        build_tail_params,
        tail_kernel_enabled,
    )

    if tail_kernel_enabled(dtype):
        shared["tail"] = build_tail_params(dec_params, shared, dtype)
        # Lane-major block-1 image-side projections for the kernel's
        # in-VMEM transformer (k1h/v1h/q1ih above are the _heads layout).
        shared["q1i_flat"] = _dense(keys0 + pe, l0i2t["q_proj"], dtype)
        shared["k1_flat"] = _dense(keys0 + pe, l0t2i["k_proj"], dtype)
        shared["v1_flat"] = _dense(keys0, l0t2i["v_proj"], dtype)
    return shared


def fused_decode(
    dec_params,
    shared,
    sparse_prompt_embeddings: jnp.ndarray,  # (P, N, C)
    multimask_output: bool,
    dino_feats_proj: Optional[jnp.ndarray] = None,  # (4h, 4w, C)
    num_heads: int = 8,
    dtype: Any = jnp.float32,
    n_class: int = 1,
    packed_masks: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (masks, iou_pred (P,K), cls (P,K,n_class)); same contract as
    `MaskDecoder.__call__` for point prompts (dense prompt == no_mask_embed,
    no attn_sim / target_embedding).

    With `packed_masks=False`, masks are spatial (P, K, 4h, 4w).  With
    `packed_masks=True`, masks come back in the transpose-free packed layout
    (P, K, h*w, 16) of ops.packed (measured 5x faster upscale chain on TPU);
    then `dino_feats_proj` must be the packed-flat (h*w*16, C) DINO map
    (pack_spatial over the spatial axes, reshaped)."""
    t = dec_params["transformer"]
    iou_token = dec_params["iou_token"]
    mask_tokens = dec_params["mask_tokens"]
    num_mask_tokens = mask_tokens.shape[0]
    p_cnt = sparse_prompt_embeddings.shape[0]
    h, w = shared["hw"]
    c = iou_token.shape[-1]

    output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
    tokens = jnp.concatenate(
        [
            jnp.broadcast_to(output_tokens[None], (p_cnt,) + output_tokens.shape),
            sparse_prompt_embeddings.astype(output_tokens.dtype),
        ],
        axis=1,
    ).astype(dtype)

    queries = tokens
    query_pe = tokens  # point_embedding is both the initial queries and the PE

    if "tail" in shared:
        # Fused Pallas transformer: the WHOLE two-way decoder (both blocks +
        # final attention, token and image sides) runs per prompt in VMEM —
        # keys1/keys2 never touch HBM, and the ~30 tiny token-side XLA
        # kernels per iteration collapse into the one launch
        # (models/decode_tail_kernel.py).
        from crowdsam_tpu.models.decode_tail_kernel import twoway_tail_pallas

        keys2, queries = twoway_tail_pallas(
            shared["keys0"], shared["q1i_flat"], shared["k1_flat"],
            shared["v1_flat"], tokens, shared["tail"], num_heads=num_heads,
        )
        return _decode_heads(
            dec_params, shared, queries, keys2, dino_feats_proj,
            multimask_output, num_mask_tokens, p_cnt, h, w, c,
            dtype, n_class, packed_masks,
        )

    # ---------------- block 1 (skip_first_layer_pe) -------------------------
    l0 = t["layers_0"]
    queries = _token_self_attn(l0["self_attn"], queries, queries,
                               num_heads, dtype)
    queries = _ln(queries, l0["norm1"], dtype)

    # token -> image with shared k/v.
    qh = _heads(
        _dense(queries + query_pe, l0["cross_attn_token_to_image"]["q_proj"],
               dtype),
        num_heads,
    )
    scale = 1.0 / math.sqrt(qh.shape[-1])
    attn = _softmax32(jnp.einsum("phtd,hmd->phtm", qh, shared["k1h"]) * scale)
    out = jnp.einsum("phtm,hmd->phtd", attn.astype(dtype), shared["v1h"])
    out = _dense(_merge(out), l0["cross_attn_token_to_image"]["out_proj"], dtype)
    queries = _ln(queries + out, l0["norm2"], dtype)
    queries = _ln(queries + _mlp_block(l0["mlp"], queries, dtype),
                  l0["norm3"], dtype)

    keys1 = _image_to_token_update(
        l0["cross_attn_image_to_token"], shared["keys0"][None],
        shared["q1ih"], queries, query_pe, num_heads, dtype,
    )
    keys1 = _ln(keys1, l0["norm4"], dtype)

    # ---------------- block 2 ------------------------------------------------
    l1 = t["layers_1"]
    q = queries + query_pe
    queries = _ln(
        queries + _token_self_attn(l1["self_attn"], q, queries,
                                   num_heads, dtype),
        l1["norm1"],
    dtype)

    cdown = shared["kpe2"].shape[-1]
    kvq = _matmul(keys1, shared["wide2"], dtype)  # (P, M, 3c)
    k2h = _heads(kvq[..., :cdown] + shared["kpe2"], num_heads)
    v2h = _heads(kvq[..., cdown : 2 * cdown] + shared["bv2"], num_heads)
    q2ih = _heads(kvq[..., 2 * cdown :] + shared["qpe2i"], num_heads)

    qh = _heads(
        _dense(queries + query_pe, l1["cross_attn_token_to_image"]["q_proj"],
               dtype),
        num_heads,
    )
    attn = _softmax32(jnp.einsum("phtd,phmd->phtm", qh, k2h) * scale)
    out = jnp.einsum("phtm,phmd->phtd", attn.astype(dtype), v2h)
    out = _dense(_merge(out), l1["cross_attn_token_to_image"]["out_proj"], dtype)
    queries = _ln(queries + out, l1["norm2"], dtype)
    queries = _ln(queries + _mlp_block(l1["mlp"], queries, dtype),
                  l1["norm3"], dtype)

    keys2 = _image_to_token_update(
        l1["cross_attn_image_to_token"], keys1, q2ih, queries, query_pe,
        num_heads, dtype,
    )
    keys2 = _ln(keys2, l1["norm4"], dtype)

    # ---------------- final token -> image attention ------------------------
    fin = t["final_attn_token_to_image"]
    kvf = _matmul(keys2, shared["widef"], dtype)
    kfh = _heads(kvf[..., :cdown] + shared["kpef"], num_heads)
    vfh = _heads(kvf[..., cdown:] + shared["bvf"], num_heads)
    qh = _heads(_dense(queries + query_pe, fin["q_proj"], dtype), num_heads)
    attn = _softmax32(jnp.einsum("phtd,phmd->phtm", qh, kfh) * scale)
    out = jnp.einsum("phtm,phmd->phtd", attn.astype(dtype), vfh)
    out = _dense(_merge(out), fin["out_proj"], dtype)
    queries = _ln(queries + out, t["norm_final_attn"], dtype)

    return _decode_heads(
        dec_params, shared, queries, keys2, dino_feats_proj,
        multimask_output, num_mask_tokens, p_cnt, h, w, c,
        dtype, n_class, packed_masks,
    )


def _pooled_from_exp(e, mx, dino_flat, num_mask_tokens, dtype):
    """PWD pooling from the mask-head kernel's exp terms.

    e (P, m, K*16) bf16 = exp(mask - c_j) per m-block j; mx (P, nblk) f32
    block maxes; dino_flat (npix, C) packed-flat.  Softmax weights are
    exp(v - M)/sum with M = max_j c_j — combined blockwise with f32
    rescales; the denominator is guarded like decode_tail_kernel's
    image_update (a mask trailing the block max by > ~88 would underflow
    to 0/0 otherwise)."""
    p_cnt, m, kk16 = e.shape
    k = num_mask_tokens
    nblk = mx.shape[1]
    tm = m // nblk
    npix = m * 16

    mglob = jnp.max(mx, axis=1)                       # (P,)
    w = jnp.exp(mx - mglob[:, None])                  # (P, nblk) f32

    dino = dino_flat.reshape(npix, -1).astype(dtype)
    ones = jnp.ones((npix, 1), dtype)
    daug = jnp.concatenate([dino, ones], axis=1)      # (npix, C+1)
    # blockwise contraction over (rows-in-block, q): e's lanes are k-major
    # (k*16 + q), dino packed-flat rows are (block, row, q)-major.
    e_r = e.reshape(p_cnt, nblk, tm, k, 16)
    d_r = daug.reshape(nblk, tm, 16, -1)
    nd = jnp.einsum("pjrkq,jrqc->pjkc", e_r, d_r,
                    preferred_element_type=jnp.float32)
    nd = jnp.einsum("pjkc,pj->pkc", nd, w)            # (P, K, C+1) f32
    num, den = nd[..., :-1], nd[..., -1:]
    return (num / jnp.maximum(den, 1e-30)).astype(dtype)


def _decode_heads(dec_params, shared, queries, keys2, dino_feats_proj,
                  multimask_output, num_mask_tokens, p_cnt, h, w, c,
                  dtype, n_class, packed_masks):
    """Post-transformer heads: hypernetwork masks + iou/cls (shared by the
    XLA tail and the Pallas tail-kernel path)."""
    hs = queries
    iou_token_out = hs[:, 0, :]
    mask_tokens_out = hs[:, 1 : 1 + num_mask_tokens, :]

    # ---------------- upscaling + hypernetwork masks ------------------------
    # The K per-token hypernetwork MLPs run as 3 batched matmuls (stacked
    # weights, einsum over the token batch axis) instead of K*3 tiny
    # launches per decode iteration; the stacks are loop-invariant so XLA
    # hoists them out of the while_loop.  Same math/rounding per layer.
    x = mask_tokens_out.astype(dtype)                 # (P, K, C)
    for layer in range(3):
        wk = jnp.stack(
            [dec_params[f"hyper_mlps_{i}"][f"layers_{layer}"]["kernel"]
             for i in range(num_mask_tokens)]
        ).astype(dtype)                               # (K, C, C')
        bk = jnp.stack(
            [dec_params[f"hyper_mlps_{i}"][f"layers_{layer}"]["bias"]
             for i in range(num_mask_tokens)]
        ).astype(dtype)
        x = jnp.einsum("pkc,kcd->pkd", x, wk) + bk
        if layer < 2:
            x = jax.nn.relu(x)
    hyper_in = x

    pool_e = pool_mx = None
    if packed_masks and "mask_head" in shared:
        # Fused Pallas mask head: the whole upscale chain stays in VMEM
        # (reads keys2 once, writes packed masks once — see
        # models/mask_head_kernel.py).  When PWD pooling follows, the
        # kernel also emits exp(masks - block max) + the block maxes so
        # the pooling needs no separate max/exp passes over the mask slab.
        from crowdsam_tpu.models.mask_head_kernel import mask_head_pallas

        import os

        if dino_feats_proj is not None and not os.environ.get(
            "CROWDSAM_DISABLE_EXP_POOLING"
        ):
            masks, pool_e, pool_mx = mask_head_pallas(
                keys2, hyper_in, shared["mask_head"],
                num_masks=num_mask_tokens, emit_exp=True,
            )                                         # (P, K, m, 16) bf16
        else:
            masks = mask_head_pallas(
                keys2, hyper_in, shared["mask_head"],
                num_masks=num_mask_tokens,
            )
        hh = ww = None
    elif packed_masks:
        # Transpose-free packed layout (ops.packed): the conv-transpose
        # depth-to-space stays folded into the channel axis.
        m = h * w
        up = _dense(keys2, dec_params["upscale_0"]["dense"], dtype)
        up = up.reshape(p_cnt, m, 4, -1)
        up = _ln_impl(
            up, dec_params["upscale_1"]["weight"],
            dec_params["upscale_1"]["bias"], 1e-6, dtype,
        )
        up = gelu(up)
        w2 = dec_params["upscale_3"]["dense"]
        up = jnp.einsum(
            "pxqc,cd->pxqd", up, w2["kernel"].astype(dtype)
        ) + w2["bias"].astype(dtype)
        up = gelu(up)                          # (P, m, 4, 4*c2)
        up = up.reshape(p_cnt, m, 16, -1)
        masks = jnp.einsum("pkc,pxqc->pkxq", hyper_in, up)  # (P, K, m, 16)
        hh = ww = None
    else:
        src = keys2.reshape(p_cnt, h, w, c)
        up = _dense(src, dec_params["upscale_0"]["dense"], dtype)
        up = up.reshape(p_cnt, h, w, 2, 2, -1).transpose(0, 1, 3, 2, 4, 5)
        up = up.reshape(p_cnt, 2 * h, 2 * w, -1)
        up = _ln_impl(
            up, dec_params["upscale_1"]["weight"],
            dec_params["upscale_1"]["bias"], 1e-6, dtype,
        )
        up = gelu(up)
        up = _dense(up, dec_params["upscale_3"]["dense"], dtype)
        up = up.reshape(p_cnt, 2 * h, 2 * w, 2, 2, -1).transpose(0, 1, 3, 2, 4, 5)
        up = up.reshape(p_cnt, 4 * h, 4 * w, -1)
        up = gelu(up)
        hh, ww = up.shape[1], up.shape[2]
        masks = jnp.einsum(
            "pkc,pxc->pkx", hyper_in, up.reshape(p_cnt, hh * ww, -1)
        ).reshape(p_cnt, num_mask_tokens, hh, ww)

    iou_pred = _relu_mlp(dec_params["iou_prediction_head"], iou_token_out,
                         3, dtype)

    if dino_feats_proj is None:
        cls_scores = jnp.zeros((p_cnt, num_mask_tokens, n_class))
    elif pool_e is not None:
        pooled = _pooled_from_exp(
            pool_e, pool_mx, dino_feats_proj, num_mask_tokens, dtype
        )
        cls_scores = _relu_mlp(dec_params["point_classifier"], pooled, 2, dtype)
    else:
        # PWD pooling: softmax(masks) @ dino, computed as exp-weights over
        # the npix axis with the normalization folded into the contraction
        # (num/den) — the MXU accumulates both in f32, so this matches the
        # explicit-softmax path while avoiding two (P, K, npix) f32
        # materializations (~64 MB per decode iteration).
        # In packed mode dino_feats_proj is packed-flat, so the contraction
        # pairs each weight with the matching packed DINO element.
        npix = 16 * h * w
        mflat = masks.reshape(p_cnt, num_mask_tokens, npix)
        mmax = jnp.max(mflat.astype(jnp.float32), axis=-1, keepdims=True)
        e = jnp.exp(mflat.astype(jnp.float32) - mmax).astype(dtype)
        dino_flat = dino_feats_proj.reshape(npix, -1).astype(dtype)
        num = jnp.einsum("pkx,xc->pkc", e, dino_flat,
                         preferred_element_type=jnp.float32)
        den = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        pooled = (num / den).astype(dtype)
        cls_scores = _relu_mlp(dec_params["point_classifier"], pooled, 2, dtype)

    fused_token = jnp.concatenate(
        [
            jnp.broadcast_to(iou_token_out[:, None, :],
                             (p_cnt, num_mask_tokens, c)),
            mask_tokens_out,
        ],
        axis=-1,
    )
    res_iou = _relu_mlp(dec_params["parallel_iou_head"], fused_token,
                        3, dtype)[..., 0]
    iou_pred = iou_pred + res_iou

    sl = slice(0, None) if multimask_output else slice(0, 1)
    return (
        masks[:, sl].astype(jnp.float32),
        iou_pred[:, sl].astype(jnp.float32),
        cls_scores[:, sl].astype(jnp.float32),
    )

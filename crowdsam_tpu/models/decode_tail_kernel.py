"""Fused Pallas kernel for the two-way decoder tail (block 2 -> final attn).

After `fused_decode`'s block 1, each prompt owns a (4096, 256) image tensor
that block 2 and the final attention read and rewrite several times in XLA
(kvq/kvf wide matmuls, the image->token update, three LayerNorms) —
~600 MB of HBM traffic per 32-prompt iteration.  This kernel runs the whole
tail per prompt in VMEM: in keys1 (one read), out keys2 + final token state
(one write each).

Head handling without Mosaic-hostile lane reshapes: all internal-128
tensors stay lane-major with head h occupying lanes [h*16, (h+1)*16); a
per-head attention score is a full-width dot with ONE side masked to the
head's lanes (the 7-token side is tiny, so the 8x FLOP overhead is
negligible), and merged outputs accumulate naturally because each head's
contribution lands in its own lanes.

Numerics mirror fused_decode's XLA path: bf16 operands with f32
accumulation and bf16 rounding after each dense stage, f32 softmax and
LayerNorm statistics (eps 1e-5), ReLU MLP.  Reference math:
`segment_anything_cs/modeling/transformer.py:55-254` (block 2 + final
token->image attention).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp


# Shared-parameter names in the order they are passed to the kernel.
_PARAM_NAMES = (
    "kpe2", "qpe2i", "kpef",          # (M, 128) PE-side projections
    "wide2", "widef",                  # (256, 384) / (256, 256)
    "bv2", "bvf",                      # (128,)
    "t2i_q_w", "t2i_q_b",              # (256, 128), (128,)
    "t2i_o_w", "t2i_o_b",              # (128, 256), (256,)
    "n2_w", "n2_b", "n3_w", "n3_b", "n4_w", "n4_b", "nf_w", "nf_b",
    "mlp1_w", "mlp1_b", "mlp2_w", "mlp2_b",
    "i2t_k_w", "i2t_k_b", "i2t_v_w", "i2t_v_b", "i2t_o_w", "i2t_o_b",
    "fin_q_w", "fin_q_b", "fin_o_w", "fin_o_b",
    # block-1 image->token update (keys0 -> keys1 stays in VMEM)
    "i2t1_k_w", "i2t1_k_b", "i2t1_v_w", "i2t1_v_b", "i2t1_o_w", "i2t1_o_b",
    "n4l0_w", "n4l0_b",
    # token-side path (block-1 self-attn + t2i + MLP, block-2 self-attn) —
    # tiny dots, but ~30 XLA kernel launches per decode iteration when run
    # outside; in-kernel they ride along for free.
    "l0sa_q_w", "l0sa_q_b", "l0sa_k_w", "l0sa_k_b",
    "l0sa_v_w", "l0sa_v_b", "l0sa_o_w", "l0sa_o_b", "n1l0_w", "n1l0_b",
    "t2i1_q_w", "t2i1_q_b", "t2i1_o_w", "t2i1_o_b", "n2l0_w", "n2l0_b",
    "mlp1l0_w", "mlp1l0_b", "mlp2l0_w", "mlp2l0_b", "n3l0_w", "n3l0_b",
    "l1sa_q_w", "l1sa_q_b", "l1sa_k_w", "l1sa_k_b",
    "l1sa_v_w", "l1sa_v_b", "l1sa_o_w", "l1sa_o_b", "n1l1_w", "n1l1_b",
)


def tail_kernel_enabled(dtype) -> bool:
    if os.environ.get("CROWDSAM_DISABLE_TAIL_KERNEL"):
        return False
    if os.environ.get("CROWDSAM_FORCE_TAIL_KERNEL"):
        return True  # tests: run in interpret mode on CPU
    if dtype != jnp.bfloat16:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def build_tail_params(dec_params, shared, dtype):
    """Kernel parameter dict from decoder params + the precomputed shared
    PE-side tensors (see fused_decode.precompute_decode_shared)."""
    t = dec_params["transformer"]
    l0 = t["layers_0"]
    l1 = t["layers_1"]
    fin = t["final_attn_token_to_image"]
    bf = dtype

    def w(p):
        return p["kernel"].astype(bf)

    def b(p):
        return p["bias"].astype(jnp.float32)

    return {
        "kpe2": shared["kpe2"].astype(bf),
        "qpe2i": shared["qpe2i"].astype(bf),
        "kpef": shared["kpef"].astype(bf),
        "wide2": shared["wide2"].astype(bf),
        "widef": shared["widef"].astype(bf),
        "bv2": shared["bv2"].astype(jnp.float32),
        "bvf": shared["bvf"].astype(jnp.float32),
        "t2i_q_w": w(l1["cross_attn_token_to_image"]["q_proj"]),
        "t2i_q_b": b(l1["cross_attn_token_to_image"]["q_proj"]),
        "t2i_o_w": w(l1["cross_attn_token_to_image"]["out_proj"]),
        "t2i_o_b": b(l1["cross_attn_token_to_image"]["out_proj"]),
        "n2_w": l1["norm2"]["weight"].astype(jnp.float32),
        "n2_b": l1["norm2"]["bias"].astype(jnp.float32),
        "n3_w": l1["norm3"]["weight"].astype(jnp.float32),
        "n3_b": l1["norm3"]["bias"].astype(jnp.float32),
        "n4_w": l1["norm4"]["weight"].astype(jnp.float32),
        "n4_b": l1["norm4"]["bias"].astype(jnp.float32),
        "nf_w": t["norm_final_attn"]["weight"].astype(jnp.float32),
        "nf_b": t["norm_final_attn"]["bias"].astype(jnp.float32),
        "mlp1_w": w(l1["mlp"]["lin1"]),
        "mlp1_b": b(l1["mlp"]["lin1"]),
        "mlp2_w": w(l1["mlp"]["lin2"]),
        "mlp2_b": b(l1["mlp"]["lin2"]),
        "i2t_k_w": w(l1["cross_attn_image_to_token"]["k_proj"]),
        "i2t_k_b": b(l1["cross_attn_image_to_token"]["k_proj"]),
        "i2t_v_w": w(l1["cross_attn_image_to_token"]["v_proj"]),
        "i2t_v_b": b(l1["cross_attn_image_to_token"]["v_proj"]),
        "i2t_o_w": w(l1["cross_attn_image_to_token"]["out_proj"]),
        "i2t_o_b": b(l1["cross_attn_image_to_token"]["out_proj"]),
        "fin_q_w": w(fin["q_proj"]),
        "fin_q_b": b(fin["q_proj"]),
        "fin_o_w": w(fin["out_proj"]),
        "fin_o_b": b(fin["out_proj"]),
        "i2t1_k_w": w(l0["cross_attn_image_to_token"]["k_proj"]),
        "i2t1_k_b": b(l0["cross_attn_image_to_token"]["k_proj"]),
        "i2t1_v_w": w(l0["cross_attn_image_to_token"]["v_proj"]),
        "i2t1_v_b": b(l0["cross_attn_image_to_token"]["v_proj"]),
        "i2t1_o_w": w(l0["cross_attn_image_to_token"]["out_proj"]),
        "i2t1_o_b": b(l0["cross_attn_image_to_token"]["out_proj"]),
        "n4l0_w": l0["norm4"]["weight"].astype(jnp.float32),
        "n4l0_b": l0["norm4"]["bias"].astype(jnp.float32),
        "l0sa_q_w": w(l0["self_attn"]["q_proj"]),
        "l0sa_q_b": b(l0["self_attn"]["q_proj"]),
        "l0sa_k_w": w(l0["self_attn"]["k_proj"]),
        "l0sa_k_b": b(l0["self_attn"]["k_proj"]),
        "l0sa_v_w": w(l0["self_attn"]["v_proj"]),
        "l0sa_v_b": b(l0["self_attn"]["v_proj"]),
        "l0sa_o_w": w(l0["self_attn"]["out_proj"]),
        "l0sa_o_b": b(l0["self_attn"]["out_proj"]),
        "n1l0_w": l0["norm1"]["weight"].astype(jnp.float32),
        "n1l0_b": l0["norm1"]["bias"].astype(jnp.float32),
        "t2i1_q_w": w(l0["cross_attn_token_to_image"]["q_proj"]),
        "t2i1_q_b": b(l0["cross_attn_token_to_image"]["q_proj"]),
        "t2i1_o_w": w(l0["cross_attn_token_to_image"]["out_proj"]),
        "t2i1_o_b": b(l0["cross_attn_token_to_image"]["out_proj"]),
        "n2l0_w": l0["norm2"]["weight"].astype(jnp.float32),
        "n2l0_b": l0["norm2"]["bias"].astype(jnp.float32),
        "mlp1l0_w": w(l0["mlp"]["lin1"]),
        "mlp1l0_b": b(l0["mlp"]["lin1"]),
        "mlp2l0_w": w(l0["mlp"]["lin2"]),
        "mlp2l0_b": b(l0["mlp"]["lin2"]),
        "n3l0_w": l0["norm3"]["weight"].astype(jnp.float32),
        "n3l0_b": l0["norm3"]["bias"].astype(jnp.float32),
        "l1sa_q_w": w(l1["self_attn"]["q_proj"]),
        "l1sa_q_b": b(l1["self_attn"]["q_proj"]),
        "l1sa_k_w": w(l1["self_attn"]["k_proj"]),
        "l1sa_k_b": b(l1["self_attn"]["k_proj"]),
        "l1sa_v_w": w(l1["self_attn"]["v_proj"]),
        "l1sa_v_b": b(l1["self_attn"]["v_proj"]),
        "l1sa_o_w": w(l1["self_attn"]["out_proj"]),
        "l1sa_o_b": b(l1["self_attn"]["out_proj"]),
        "n1l1_w": l1["norm1"]["weight"].astype(jnp.float32),
        "n1l1_b": l1["norm1"]["bias"].astype(jnp.float32),
    }


def _kernel(keys0_ref, q1i_ref, k1_ref, v1_ref, tok_ref, *refs,
            num_heads: int, eps: float):
    out_keys_ref, out_q_ref = refs[-2], refs[-1]
    P = {n: r for n, r in zip(_PARAM_NAMES, refs[: len(_PARAM_NAMES)])}
    f32 = jnp.float32
    bf = jnp.bfloat16
    cdown = P["kpe2"].shape[-1]
    hd = cdown // num_heads
    scale = 1.0 / math.sqrt(hd)

    def rnd(x):  # match XLA's bf16 rounding after each dense stage
        return x.astype(bf).astype(f32)

    def rnd_bf(x):  # round AND keep bf16 (halves VMEM for big tensors)
        return x.astype(bf)

    def dot(a, bmat):
        return jax.lax.dot_general(
            a.astype(bf), bmat.astype(bf), (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    def dot_t(a, bmat):  # contract both minor dims: (N,C)x(M,C) -> (N,M)
        return jax.lax.dot_general(
            a.astype(bf), bmat.astype(bf), (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )

    def dense(x, wn, bn):
        return rnd(dot(x, P[wn][...]) + P[bn][...])

    def ln(x, wn, bn):
        xb = rnd(x)
        u = jnp.mean(xb, axis=-1, keepdims=True)
        s = jnp.mean(jnp.square(xb - u), axis=-1, keepdims=True)
        y = (xb - u) * jax.lax.rsqrt(s + eps)
        return rnd(y * P[wn][...] + P[bn][...])

    keys0 = keys0_ref[0]                              # (M, C) bf16, shared
    q1i = q1i_ref[0]                                  # (M, 128) bf16, shared
    k1 = k1_ref[0]                                    # (M, 128) bf16, shared
    v1 = v1_ref[0]                                    # (M, 128) bf16, shared
    pe = tok_ref[0].astype(f32)                       # (T, C) initial tokens
    c_full = pe.shape[-1]                             # == query_pe
    tcnt = pe.shape[0]

    # Stacked-row head layout: row (h, t) of an (H*T, 128) matrix carries
    # token t masked to head h's lanes, so every attention needs ONE wide
    # dot instead of a per-head loop (which serializes on the VPU).
    ht = num_heads * tcnt
    row_head = jax.lax.broadcasted_iota(jnp.int32, (ht, cdown), 0) // tcnt
    row_lane_h = jax.lax.broadcasted_iota(jnp.int32, (ht, cdown), 1) // hd
    row_mask = (row_head == row_lane_h)               # (H*T, 128)

    def stack_rows(x):
        """(T, 128) -> (H*T, 128) with row (h, t) = x[t] masked to head h."""
        xs = jnp.broadcast_to(x[None], (num_heads,) + x.shape)
        xs = xs.reshape(ht, x.shape[-1])
        return jnp.where(row_mask, xs, jnp.zeros((), x.dtype))

    def fold_rows(x):
        """(H*T, 128) -> (T, 128): keep each row's own-head lanes, sum heads."""
        x = jnp.where(row_mask, x, 0.0)
        return x.reshape(num_heads, tcnt, x.shape[-1]).sum(axis=0)

    def cross_attn_t2i(q_tok, k_img, v_img, own, obn):
        """Token->image attention, all heads in two dots."""
        q_stack = stack_rows(q_tok.astype(bf))        # (H*T, 128)
        s = dot_t(q_stack, k_img) * scale             # (H*T, M)
        p_att = jax.nn.softmax(s, axis=-1)
        out = dot(p_att, v_img)                       # (H*T, 128)
        out = fold_rows(out)                          # (T, 128)
        return rnd(dot(rnd(out), P[own][...]) + P[obn][...])

    seg = (
        jax.lax.broadcasted_iota(jnp.int32, (ht, num_heads), 0) // tcnt
        == jax.lax.broadcasted_iota(jnp.int32, (ht, num_heads), 1)
    ).astype(f32)                                     # (H*T, H)

    # Full-width (rate-1) head layout for the token self-attentions.
    hd2 = c_full // num_heads
    scale2 = 1.0 / math.sqrt(hd2)
    row_lane_h2 = jax.lax.broadcasted_iota(jnp.int32, (ht, c_full), 1) // hd2
    row_head2 = jax.lax.broadcasted_iota(jnp.int32, (ht, c_full), 0) // tcnt
    row_mask2 = (row_head2 == row_lane_h2)            # (H*T, C)

    def token_self_attn(x_qk, x_v, pfx):
        """Full-dim token self-attention (transformer.py:195-254, rate 1):
        per-head scores via head-masked stacked q rows against unmasked k
        (only the head's lanes contribute to the contraction)."""
        qh = dense(x_qk, f"{pfx}_q_w", f"{pfx}_q_b")  # (T, C)
        kh = dense(x_qk, f"{pfx}_k_w", f"{pfx}_k_b")
        vh = dense(x_v, f"{pfx}_v_w", f"{pfx}_v_b")
        qs = jnp.broadcast_to(
            qh.astype(bf)[None], (num_heads, tcnt, c_full)
        ).reshape(ht, c_full)
        qs = jnp.where(row_mask2, qs, jnp.zeros((), qs.dtype))
        s = dot_t(qs, kh.astype(bf)) * scale2         # (H*T, T)
        p_att = jax.nn.softmax(s, axis=-1)
        out = dot(p_att, vh.astype(bf))               # (H*T, C) full-width
        out = jnp.where(row_mask2, out, 0.0)
        out = out.reshape(num_heads, tcnt, c_full).sum(axis=0)
        return rnd(dot(rnd(out), P[f"{pfx}_o_w"][...]) + P[f"{pfx}_o_b"][...])

    def image_update(keys_prev, q_img, tok_state, pfx, nwn, nbn):
        """Image->token cross attention + residual + LN: keys_prev ->
        keys_next, entirely in VMEM.  Per-(m, h) softmax over tokens uses
        the global row max (identical result) + indicator-matmul segment
        sums; the out-projection folds onto the stacked token values."""
        k_tok = dense(tok_state + pe, f"{pfx}_k_w", f"{pfx}_k_b")
        v_tok = dense(tok_state, f"{pfx}_v_w", f"{pfx}_v_b")
        k_stack = stack_rows(k_tok.astype(bf))        # (H*T, 128)
        s = dot_t(q_img, k_stack) * scale             # (M, H*T)
        smax = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - smax)
        denom = jax.lax.dot_general(
            e, seg, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )                                             # (M, H)
        # Guard against f32 exp underflow: the row max is global across
        # heads, so a head trailing the best head by >~88 would see all
        # its exp() terms flush to 0 and denom==0 -> NaN.  Clamping to a
        # tiny positive value turns that (degenerate, all-underflowed)
        # head's output into ~0 instead of NaN.  Documented deviation
        # (PARITY.md): the reference's per-head softmax would still return
        # a valid average for such a head; a >88-logit cross-head spread
        # does not occur with LayerNormed QK^T at 1/sqrt(d) scale, and
        # computing true per-head maxes would need H extra lane-masked
        # reductions per hot-loop iteration.
        denom = jnp.maximum(denom, jnp.float32(1e-30))
        denom_b = jax.lax.dot_general(
            denom, seg.T, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )                                             # (M, H*T)
        p_att = e / denom_b
        u_stack = rnd(dot(stack_rows(v_tok.astype(bf)), P[f"{pfx}_o_w"][...]))
        delta = dot(p_att, u_stack.astype(bf))        # (M, 256)
        return ln(
            keys_prev.astype(f32) + rnd(delta) + P[f"{pfx}_o_b"][...],
            nwn, nbn,
        )

    # ---- block-1 token path (reference: skip_first_layer_pe) ----
    queries = ln(token_self_attn(pe, pe, "l0sa"), "n1l0_w", "n1l0_b")
    qh = dense(queries + pe, "t2i1_q_w", "t2i1_q_b")
    att = cross_attn_t2i(qh, k1, v1, "t2i1_o_w", "t2i1_o_b")
    queries = ln(queries + att, "n2l0_w", "n2l0_b")
    mlp = dense(queries, "mlp1l0_w", "mlp1l0_b")
    mlp = jnp.maximum(mlp, 0.0)
    mlp = dense(mlp, "mlp2l0_w", "mlp2l0_b")
    qb1 = ln(queries + mlp, "n3l0_w", "n3l0_b")

    # ---- block 1: image -> token update (keys0 -> keys1, VMEM-only) ----
    keys1 = image_update(keys0, q1i, qb1, "i2t1", "n4l0_w", "n4l0_b")
    keys1 = keys1.astype(bf)

    # ---- block-2 token self-attention ----
    queries = ln(
        qb1 + token_self_attn(qb1 + pe, qb1, "l1sa"), "n1l1_w", "n1l1_b"
    )

    # ---- block 2: token -> image attention ----
    kvq = dot(keys1, P["wide2"][...])                 # (M, 3*128) f32
    k2 = rnd_bf(kvq[:, :cdown] + P["kpe2"][...].astype(f32))
    v2 = rnd_bf(kvq[:, cdown : 2 * cdown] + P["bv2"][...])
    q2i = rnd_bf(kvq[:, 2 * cdown :] + P["qpe2i"][...].astype(f32))
    del kvq

    qh = dense(queries + pe, "t2i_q_w", "t2i_q_b")    # (T, 128)
    att = cross_attn_t2i(qh, k2, v2, "t2i_o_w", "t2i_o_b")
    queries = ln(queries + att, "n2_w", "n2_b")

    mlp = dense(queries, "mlp1_w", "mlp1_b")
    mlp = jnp.maximum(mlp, 0.0)
    mlp = dense(mlp, "mlp2_w", "mlp2_b")
    queries = ln(queries + mlp, "n3_w", "n3_b")

    # ---- block 2: image -> token update ----
    keys2 = image_update(keys1, q2i, queries, "i2t", "n4_w", "n4_b")

    # ---- final token -> image attention ----
    kvf = dot(keys2, P["widef"][...])
    kf = rnd_bf(kvf[:, :cdown] + P["kpef"][...].astype(f32))
    vf = rnd_bf(kvf[:, cdown:] + P["bvf"][...])
    del kvf
    qh = dense(queries + pe, "fin_q_w", "fin_q_b")
    att = cross_attn_t2i(qh, kf, vf, "fin_o_w", "fin_o_b")
    queries = ln(queries + att, "nf_w", "nf_b")

    out_keys_ref[0] = keys2.astype(out_keys_ref.dtype)
    out_q_ref[0] = queries.astype(out_q_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "interpret")
)
def twoway_tail_pallas(keys0, q1i, k1, v1, tokens, params,
                       num_heads: int = 8, interpret: bool = False):
    """keys0 (M, C) + lane-major block-1 image projections q1i/k1/v1
    (M, 128) shared per image; `tokens` (P, T, C) per prompt (the initial
    output+sparse token embeddings — both the initial queries and the
    query PE) -> (keys2 (P, M, C) bf16, queries_final (P, T, C) bf16).

    Covers the WHOLE two-way transformer: block-1 self-attn + t2i + MLP +
    image->token update, block-2 self-attn + t2i + MLP + image->token
    update, final token->image attention — one kernel launch per prompt
    batch instead of ~30 XLA kernels."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not interpret:
        try:
            interpret = jax.default_backend() != "tpu"
        except Exception:
            interpret = True

    p, t, c = tokens.shape
    m = keys0.shape[0]

    kern = functools.partial(_kernel, num_heads=num_heads, eps=1e-5)
    in_specs = [
        pl.BlockSpec((1, m, c), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, q1i.shape[-1]), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, k1.shape[-1]), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, v1.shape[-1]), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, c), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [
        keys0.astype(jnp.bfloat16)[None],
        q1i.astype(jnp.bfloat16)[None],
        k1.astype(jnp.bfloat16)[None],
        v1.astype(jnp.bfloat16)[None],
        tokens.astype(jnp.bfloat16),
    ]
    for name in _PARAM_NAMES:
        arr = params[name]
        in_specs.append(
            pl.BlockSpec(arr.shape, lambda i, nd=arr.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
        )
        operands.append(arr)

    keys2, q_out = pl.pallas_call(
        kern,
        grid=(p,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, m, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p, m, c), jnp.bfloat16),
            jax.ShapeDtypeStruct((p, t, c), jnp.bfloat16),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return keys2, q_out

"""Pallas two-way tail kernel vs fused_decode's XLA tail (interpret mode).

The kernel covers block-1's image->token update (keys0 -> keys1), block 2
(cross attentions + MLP + image->token update), and the final
token->image attention — everything image-sided after the block-1 token
path (models/decode_tail_kernel.py).
"""

import numpy as np
import jax.numpy as jnp

from crowdsam_tpu.models.decode_tail_kernel import (
    build_tail_params,
    twoway_tail_pallas,
)
from crowdsam_tpu.models.fused_decode import (
    _dense,
    _heads,
    _image_to_token_update,
    _ln,
    _matmul,
    _merge,
    _mlp_block,
    _softmax32,
)


def _rand_lin(rng, ci, co):
    return {
        "kernel": jnp.asarray(rng.normal(0, 0.08, (ci, co)).astype(np.float32)),
        "bias": jnp.asarray(rng.normal(0, 0.05, (co,)).astype(np.float32)),
    }


def _rand_ln(rng, c):
    return {
        "weight": jnp.asarray(rng.normal(1, 0.05, (c,)).astype(np.float32)),
        "bias": jnp.asarray(rng.normal(0, 0.05, (c,)).astype(np.float32)),
    }


def _rand_xattn(rng, c, cd):
    return {
        "q_proj": _rand_lin(rng, c, cd),
        "k_proj": _rand_lin(rng, c, cd),
        "v_proj": _rand_lin(rng, c, cd),
        "out_proj": _rand_lin(rng, cd, c),
    }


def _xla_tail(dec_params, shared, queries_b1, queries, query_pe,
              num_heads, dtype):
    """fused_decode's XLA path: block-1 i2t + block-2 + final attention."""
    import math

    t = dec_params["transformer"]
    l0 = t["layers_0"]
    l1 = t["layers_1"]
    cdown = shared["kpe2"].shape[-1]
    scale = 1.0 / math.sqrt(cdown // num_heads)

    keys1 = _image_to_token_update(
        l0["cross_attn_image_to_token"], shared["keys0"][None],
        shared["q1ih"], queries_b1, query_pe, num_heads, dtype,
    )
    keys1 = _ln(keys1, l0["norm4"], dtype)

    kvq = _matmul(keys1, shared["wide2"], dtype)
    k2h = _heads(kvq[..., :cdown] + shared["kpe2"], num_heads)
    v2h = _heads(kvq[..., cdown : 2 * cdown] + shared["bv2"], num_heads)
    q2ih = _heads(kvq[..., 2 * cdown :] + shared["qpe2i"], num_heads)

    qh = _heads(
        _dense(queries + query_pe, l1["cross_attn_token_to_image"]["q_proj"],
               dtype), num_heads,
    )
    attn = _softmax32(jnp.einsum("phtd,phmd->phtm", qh, k2h) * scale)
    out = jnp.einsum("phtm,phmd->phtd", attn.astype(dtype), v2h)
    out = _dense(_merge(out), l1["cross_attn_token_to_image"]["out_proj"],
                 dtype)
    queries = _ln(queries + out, l1["norm2"], dtype)
    queries = _ln(queries + _mlp_block(l1["mlp"], queries, dtype),
                  l1["norm3"], dtype)

    keys2 = _image_to_token_update(
        l1["cross_attn_image_to_token"], keys1, q2ih, queries, query_pe,
        num_heads, dtype,
    )
    keys2 = _ln(keys2, l1["norm4"], dtype)

    fin = t["final_attn_token_to_image"]
    kvf = _matmul(keys2, shared["widef"], dtype)
    kfh = _heads(kvf[..., :cdown] + shared["kpef"], num_heads)
    vfh = _heads(kvf[..., cdown:] + shared["bvf"], num_heads)
    qh = _heads(_dense(queries + query_pe, fin["q_proj"], dtype), num_heads)
    attn = _softmax32(jnp.einsum("phtd,phmd->phtm", qh, kfh) * scale)
    out = jnp.einsum("phtm,phmd->phtd", attn.astype(dtype), vfh)
    out = _dense(_merge(out), fin["out_proj"], dtype)
    queries = _ln(queries + out, t["norm_final_attn"], dtype)
    return keys2, queries


def test_tail_kernel_matches_xla(rng):
    p, m, c, tcnt, nh, cd = 3, 256, 256, 7, 8, 128
    dtype = jnp.bfloat16

    l0 = {
        "cross_attn_image_to_token": _rand_xattn(rng, c, cd),
        "norm4": _rand_ln(rng, c),
    }
    l1 = {
        "cross_attn_token_to_image": _rand_xattn(rng, c, cd),
        "cross_attn_image_to_token": _rand_xattn(rng, c, cd),
        "mlp": {"lin1": _rand_lin(rng, c, 2048),
                "lin2": _rand_lin(rng, 2048, c)},
        "norm2": _rand_ln(rng, c),
        "norm3": _rand_ln(rng, c),
        "norm4": _rand_ln(rng, c),
    }
    fin = _rand_xattn(rng, c, cd)
    dec_params = {"transformer": {
        "layers_0": l0,
        "layers_1": l1,
        "final_attn_token_to_image": fin,
        "norm_final_attn": _rand_ln(rng, c),
    }}
    keys0 = jnp.asarray(rng.normal(0, 1, (m, c)).astype(np.float32)).astype(dtype)
    pe_img = jnp.asarray(rng.normal(0, 0.5, (m, c)).astype(np.float32))

    def dense_np(x, pp):
        return (x @ pp["kernel"] + pp["bias"]).astype(dtype)

    q1i_flat = dense_np(
        keys0.astype(jnp.float32) + pe_img, l0["cross_attn_image_to_token"]["q_proj"]
    )
    shared = {
        "keys0": keys0,
        "q1ih": _heads(q1i_flat, nh),
        "kpe2": dense_np(pe_img, l1["cross_attn_token_to_image"]["k_proj"]),
        "qpe2i": dense_np(pe_img, l1["cross_attn_image_to_token"]["q_proj"]),
        "kpef": dense_np(pe_img, fin["k_proj"]),
        "wide2": jnp.concatenate(
            [l1["cross_attn_token_to_image"]["k_proj"]["kernel"],
             l1["cross_attn_token_to_image"]["v_proj"]["kernel"],
             l1["cross_attn_image_to_token"]["q_proj"]["kernel"]], axis=1
        ).astype(dtype),
        "widef": jnp.concatenate(
            [fin["k_proj"]["kernel"], fin["v_proj"]["kernel"]], axis=1
        ).astype(dtype),
        "bv2": l1["cross_attn_token_to_image"]["v_proj"]["bias"].astype(dtype),
        "bvf": fin["v_proj"]["bias"].astype(dtype),
    }

    queries_b1 = jnp.asarray(
        rng.normal(0, 1, (p, tcnt, c)).astype(np.float32)).astype(dtype)
    queries = jnp.asarray(
        rng.normal(0, 1, (p, tcnt, c)).astype(np.float32)).astype(dtype)
    query_pe = jnp.asarray(
        rng.normal(0, 1, (p, tcnt, c)).astype(np.float32)).astype(dtype)

    want_k, want_q = _xla_tail(dec_params, shared, queries_b1, queries,
                               query_pe, nh, dtype)
    params = build_tail_params(dec_params, shared, dtype)
    got_k, got_q = twoway_tail_pallas(keys0, q1i_flat, queries_b1, queries,
                                      query_pe, params, num_heads=nh,
                                      interpret=True)

    for got, want, name in ((got_k, want_k, "keys2"), (got_q, want_q, "queries")):
        got = np.asarray(got, np.float32)
        want = np.asarray(want, np.float32)
        scale = np.maximum(np.abs(want), 1.0)
        err = np.abs(got - want) / scale
        assert err.max() < 0.08, (name, err.max())
        assert np.median(err) < 0.01, (name, np.median(err))

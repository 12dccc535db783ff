"""Where do the EPS engine's 238 ms go?  Decoder-only scan vs loop floor vs
full engine.  python tools/profile_engine_parts.py [N]"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from crowdsam_tpu.config import load_config, modify_config
    from crowdsam_tpu.models.fused_decode import (
        fused_decode, precompute_decode_shared,
    )
    from crowdsam_tpu.ops.amg import (
        batched_mask_to_box, calculate_stability_score,
    )
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM
    from crowdsam_tpu.utils.profiling import force_sync

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    ITERS = 16
    K = 32

    cfg = modify_config(load_config("configs/crowdhuman.yaml"), [
        "model.sam_checkpoint", "",
        "model.dino_checkpoint", "",
        "model.sam_adapter_checkpoint", "",
        "test.pos_sim_thresh", "0.4",
        "test.pred_iou_thresh", "0.0",
        "test.stability_score_thresh", "0.0",
    ])
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (683, 1024, 3), dtype=np.uint8)
    model = CrowdSAM(cfg)
    model.generate(image)

    model.crop_image(image, [0, 0, 1024, 683])
    model.predictor.set_image_presized(model.image)
    emb = model.predictor.get_image_embedding()
    dino_proj = model.predictor.dino_proj_256
    pe = model.predictor.dense_pe
    params = model.sam.params
    force_sync(emb)

    dec_dtype = model.sam.mask_decoder.dtype

    def bench(name, fn, *args):
        out = fn(*args)
        force_sync(out)
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        force_sync(out)
        print(f"{name:<52}{(time.time()-t0)/n*1000:>9.1f} ms")

    coords = jnp.asarray(
        rng.uniform(0, 1024, (ITERS, K, 1, 2)).astype(np.float32)
    )

    @jax.jit
    def scan_decode_fused(params, emb, pe, dino_proj, coords):
        # PACKED path — what the engine actually runs (engine.py:240-246).
        from crowdsam_tpu.ops.packed import pack_spatial

        shared = precompute_decode_shared(
            params["mask_decoder"], params["prompt_encoder"]["no_mask_embed"],
            emb, pe, num_heads=8, dtype=dec_dtype,
        )
        dino_packed = pack_spatial(
            jnp.moveaxis(dino_proj, -1, 0)
        ).reshape(dino_proj.shape[-1], -1).T

        def body(carry, c):
            sparse, _ = model.sam.prompt_encoder.apply(
                {"params": params["prompt_encoder"]},
                points=(c, jnp.ones((K, 1), jnp.int32)),
            )
            masks, iou, cls = fused_decode(
                params["mask_decoder"], shared, sparse, True,
                dino_feats_proj=dino_packed, num_heads=8, dtype=dec_dtype,
                n_class=1, packed_masks=True,
            )
            return carry + iou.sum() + masks.mean() + cls.sum(), None

        out, _ = jax.lax.scan(body, jnp.float32(0), coords)
        return out

    @jax.jit
    def scan_decode_module(params, emb, pe, dino_proj, coords):
        def body(carry, c):
            sparse, dense = model.sam.prompt_encoder.apply(
                {"params": params["prompt_encoder"]},
                points=(c, jnp.ones((K, 1), jnp.int32)),
            )
            masks, iou, cls = model.sam.mask_decoder.apply(
                {"params": params["mask_decoder"]}, emb, pe, sparse, dense,
                True, dino_feats_proj=dino_proj,
            )
            return carry + iou.sum() + masks.mean() + cls.sum(), None

        out, _ = jax.lax.scan(body, jnp.float32(0), coords)
        return out

    @jax.jit
    def scan_filters(masks_in):
        def body(carry, m):
            stab = calculate_stability_score(m, 0.0, 1.0)
            binm = m > 0.0
            boxes = batched_mask_to_box(binm)
            occ = jnp.any(binm, axis=0)
            return carry + stab.sum() + boxes.sum() + occ.sum(), None

        out, _ = jax.lax.scan(body, jnp.float32(0), masks_in)
        return out

    @jax.jit
    def loop_floor(x):
        def body(carry, _):
            return carry * 1.000001 + 1.0, None

        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return out

    masks_in = jnp.asarray(
        rng.normal(0, 1, (ITERS, K, 256, 256)).astype(np.float32)
    )

    bench("16x fused decode only (scan)", scan_decode_fused,
          params, emb, pe, dino_proj, coords)
    bench("16x module decode only (scan)", scan_decode_module,
          params, emb, pe, dino_proj, coords)
    bench("16x filter stage only (scan)", scan_filters, masks_in)
    bench("16x trivial loop floor", loop_floor, jnp.float32(1))


def breakdown():
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from crowdsam_tpu.models.build import sam_model_registry
    from crowdsam_tpu.models import fused_decode as fd
    from crowdsam_tpu.utils.profiling import force_sync

    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ITERS, K, M, C = 16, 32, 4096, 256
    rng = np.random.default_rng(0)

    sam = sam_model_registry["vit_l"](n_class=1)  # random init, bf16
    params = sam.params["mask_decoder"]
    dtype = sam.mask_decoder.dtype
    no_mask = sam.params["prompt_encoder"]["no_mask_embed"]
    emb = jnp.asarray(rng.normal(0, 1, (1, 64, 64, C)).astype(np.float32))
    pe = sam.prompt_encoder.apply(
        {"params": sam.params["prompt_encoder"]},
        method=sam.prompt_encoder.get_dense_pe,
    )
    dino_proj = jnp.asarray(
        rng.normal(0, 1, (256, 256, C)).astype(np.float32)
    )
    sparse_all = jnp.asarray(
        rng.normal(0, 1, (ITERS, K, 2, C)).astype(np.float32)
    )
    keys2_fixed = jnp.asarray(
        rng.normal(0, 1, (K, M, C)).astype(np.float32)
    ).astype(dtype)
    masks_fixed = jnp.asarray(
        rng.normal(0, 1, (K, 4, 256, 256)).astype(np.float32)
    )
    tokens_fixed = jnp.asarray(
        rng.normal(0, 1, (K, 7, C)).astype(np.float32)
    ).astype(dtype)

    def bench(name, fn, *args):
        out = fn(*args)
        force_sync(out)
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        force_sync(out)
        print(f"{name:<52}{(time.time()-t0)/n*1000:>9.1f} ms")

    shared_ = fd.precompute_decode_shared(params, no_mask, emb, pe,
                                          num_heads=8, dtype=dtype)

    import math as _math

    @jax.jit
    def scan_transformer(params, shared, sparse_all):
        t = params["transformer"]

        def body(carry, sparse):
            iou_token = params["iou_token"]
            mask_tokens = params["mask_tokens"]
            output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
            tokens = jnp.concatenate(
                [jnp.broadcast_to(output_tokens[None], (K,) + output_tokens.shape),
                 sparse.astype(output_tokens.dtype)], axis=1
            ).astype(dtype)
            queries = tokens
            query_pe = tokens
            l0 = t["layers_0"]
            queries = fd._token_self_attn(l0["self_attn"], queries, queries, 8, dtype)
            queries = fd._ln(queries, l0["norm1"], dtype)
            qh = fd._heads(fd._dense(queries + query_pe,
                                     l0["cross_attn_token_to_image"]["q_proj"],
                                     dtype), 8)
            scale = 1.0 / _math.sqrt(qh.shape[-1])
            attn = fd._softmax32(
                jnp.einsum("phtd,hmd->phtm", qh, shared["k1h"]) * scale)
            out = jnp.einsum("phtm,hmd->phtd", attn.astype(dtype), shared["v1h"])
            out = fd._dense(fd._merge(out),
                            l0["cross_attn_token_to_image"]["out_proj"], dtype)
            queries = fd._ln(queries + out, l0["norm2"], dtype)
            queries = fd._ln(queries + fd._mlp_block(l0["mlp"], queries, dtype),
                             l0["norm3"], dtype)
            keys1 = fd._image_to_token_update(
                l0["cross_attn_image_to_token"], shared["keys0"][None],
                shared["q1ih"], queries, query_pe, 8, dtype)
            keys1 = fd._ln(keys1, l0["norm4"], dtype)

            l1 = t["layers_1"]
            q = queries + query_pe
            queries = fd._ln(queries + fd._token_self_attn(
                l1["self_attn"], q, queries, 8, dtype), l1["norm1"], dtype)
            cdown = shared["kpe2"].shape[-1]
            kvq = fd._matmul(keys1, shared["wide2"], dtype)
            k2h = fd._heads(kvq[..., :cdown] + shared["kpe2"], 8)
            v2h = fd._heads(kvq[..., cdown:2 * cdown] + shared["bv2"], 8)
            q2ih = fd._heads(kvq[..., 2 * cdown:] + shared["qpe2i"], 8)
            qh = fd._heads(fd._dense(queries + query_pe,
                                     l1["cross_attn_token_to_image"]["q_proj"],
                                     dtype), 8)
            attn = fd._softmax32(jnp.einsum("phtd,phmd->phtm", qh, k2h) * scale)
            out = jnp.einsum("phtm,phmd->phtd", attn.astype(dtype), v2h)
            out = fd._dense(fd._merge(out),
                            l1["cross_attn_token_to_image"]["out_proj"], dtype)
            queries = fd._ln(queries + out, l1["norm2"], dtype)
            queries = fd._ln(queries + fd._mlp_block(l1["mlp"], queries, dtype),
                             l1["norm3"], dtype)
            keys2 = fd._image_to_token_update(
                l1["cross_attn_image_to_token"], keys1, q2ih, queries,
                query_pe, 8, dtype)
            keys2 = fd._ln(keys2, l1["norm4"], dtype)

            fin = t["final_attn_token_to_image"]
            kvf = fd._matmul(keys2, shared["widef"], dtype)
            kfh = fd._heads(kvf[..., :cdown] + shared["kpef"], 8)
            vfh = fd._heads(kvf[..., cdown:] + shared["bvf"], 8)
            qh = fd._heads(fd._dense(queries + query_pe, fin["q_proj"], dtype), 8)
            attn = fd._softmax32(jnp.einsum("phtd,phmd->phtm", qh, kfh) * scale)
            out = jnp.einsum("phtm,phmd->phtd", attn.astype(dtype), vfh)
            out = fd._dense(fd._merge(out), fin["out_proj"], dtype)
            queries = fd._ln(queries + out, t["norm_final_attn"], dtype)
            out_sum = queries.sum().astype(jnp.float32)
            out_sum = out_sum + keys2.mean().astype(jnp.float32)
            return carry + out_sum, None

        out, _ = jax.lax.scan(body, jnp.float32(0), sparse_all)
        return out

    @jax.jit
    def scan_upscale_masks(params, keys2, tokens):
        def body(carry, eps):
            src = (keys2 + eps).reshape(K, 64, 64, C)
            up = fd._dense(src, params["upscale_0"]["dense"], dtype)
            up = up.reshape(K, 64, 64, 2, 2, -1).transpose(0, 1, 3, 2, 4, 5)
            up = up.reshape(K, 128, 128, -1)
            from crowdsam_tpu.models.common import _ln_impl, gelu
            up = _ln_impl(up, params["upscale_1"]["weight"],
                          params["upscale_1"]["bias"], 1e-6, dtype)
            up = gelu(up)
            up = fd._dense(up, params["upscale_3"]["dense"], dtype)
            up = up.reshape(K, 128, 128, 2, 2, -1).transpose(0, 1, 3, 2, 4, 5)
            up = up.reshape(K, 256, 256, -1)
            up = gelu(up)
            hyper_in = jnp.stack(
                [fd._relu_mlp(params[f"hyper_mlps_{i}"], tokens[:, i + 1, :],
                              3, dtype) for i in range(4)], axis=1)
            masks = jnp.einsum("pkc,pxc->pkx", hyper_in,
                               up.reshape(K, 256 * 256, -1))
            return carry + masks.astype(jnp.float32).mean(), None

        out, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(ITERS, dtype=dtype) * 1e-6)
        return out

    @jax.jit
    def scan_pool_cls(params, masks, dino_proj):
        def body(carry, eps):
            mw = jax.nn.softmax(
                (masks + eps).reshape(K, 4, 256 * 256).astype(jnp.float32),
                axis=-1)
            pooled = jnp.einsum("pkx,xc->pkc", mw.astype(dtype),
                                dino_proj.reshape(256 * 256, -1).astype(dtype))
            cls = fd._relu_mlp(params["point_classifier"], pooled, 2, dtype)
            return carry + cls.astype(jnp.float32).sum(), None

        out, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(ITERS, dtype=jnp.float32) * 1e-6)
        return out

    bench("16x transformer only", scan_transformer, params, shared_, sparse_all)
    bench("16x upscale+hyper masks only", scan_upscale_masks, params,
          keys2_fixed, tokens_fixed)
    bench("16x softmax-pool + classifier only", scan_pool_cls, params,
          masks_fixed, dino_proj)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "breakdown":
        breakdown()
    else:
        main()

"""Parity of the hoisted/low-rank fused decode path vs MaskDecoder.apply.

The fused path (models/fused_decode.py) is the EPS-engine hot loop; it must
match the module decode bit-for-bit up to float reassociation for the
point-prompt case (dense prompt == no_mask_embed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowdsam_tpu.models.build import sam_model_registry
from crowdsam_tpu.models.fused_decode import (
    fused_decode,
    precompute_decode_shared,
)


@pytest.fixture(scope="module")
def setup():
    sam = sam_model_registry["vit_tiny"](n_class=3, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    h = sam.image_encoder.img_size // sam.image_encoder.patch_size
    feats = jnp.asarray(rng.normal(0, 1, (1, h, h, 256)).astype(np.float32))
    pe = sam.prompt_encoder.apply(
        {"params": sam.params["prompt_encoder"]},
        method=sam.prompt_encoder.get_dense_pe,
    )
    p = 5
    coords = jnp.asarray(
        rng.uniform(0, sam.image_encoder.img_size, (p, 1, 2)).astype(np.float32)
    )
    labels = jnp.ones((p, 1), jnp.int32)
    sparse, dense = sam.prompt_encoder.apply(
        {"params": sam.params["prompt_encoder"]},
        points=(coords, labels),
    )
    dino = jnp.asarray(
        rng.normal(0, 1, (4 * h, 4 * h, 256)).astype(np.float32)
    )
    return sam, feats, pe, sparse, dense, dino


@pytest.mark.parametrize("multimask", [True, False])
def test_fused_decode_matches_module(setup, multimask):
    sam, feats, pe, sparse, dense, dino = setup

    ref_masks, ref_iou, ref_cls = sam.mask_decoder.apply(
        {"params": sam.params["mask_decoder"]},
        feats, pe, sparse, dense, multimask, dino_feats_proj=dino,
    )

    shared = precompute_decode_shared(
        sam.params["mask_decoder"],
        sam.params["prompt_encoder"]["no_mask_embed"],
        feats, pe,
        num_heads=sam.mask_decoder.transformer_num_heads,
        dtype=jnp.float32,
    )
    masks, iou, cls = fused_decode(
        sam.params["mask_decoder"], shared, sparse, multimask,
        dino_feats_proj=dino,
        num_heads=sam.mask_decoder.transformer_num_heads,
        dtype=jnp.float32,
        n_class=sam.mask_decoder.n_class,
    )

    assert masks.shape == ref_masks.shape
    assert iou.shape == ref_iou.shape
    assert cls.shape == ref_cls.shape
    np.testing.assert_allclose(masks, ref_masks, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(iou, ref_iou, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(cls, ref_cls, rtol=2e-4, atol=2e-4)


def test_fused_decode_jits(setup):
    sam, feats, pe, sparse, dense, dino = setup

    @jax.jit
    def run(params, feats, pe, sparse, dino):
        shared = precompute_decode_shared(
            params["mask_decoder"],
            params["prompt_encoder"]["no_mask_embed"],
            feats, pe, num_heads=8, dtype=jnp.float32,
        )
        return fused_decode(
            params["mask_decoder"], shared, sparse, True,
            dino_feats_proj=dino, num_heads=8, dtype=jnp.float32, n_class=3,
        )

    masks, iou, cls = run(sam.params, feats, pe, sparse, dino)
    assert np.isfinite(np.asarray(masks)).all()
    assert np.isfinite(np.asarray(iou)).all()


def test_engine_fused_vs_module_path():
    """The EPS engine must produce the same detections with the fused
    decoder as with the plain MaskDecoder.apply path."""
    import dataclasses

    from crowdsam_tpu.pipeline.engine import EngineConfig, make_eps_engine

    sam = sam_model_registry["vit_tiny"](n_class=1, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    h = sam.image_encoder.img_size // sam.image_encoder.patch_size
    feats = jnp.asarray(rng.normal(0, 1, (1, h, h, 256)).astype(np.float32))
    pe = sam.prompt_encoder.apply(
        {"params": sam.params["prompt_encoder"]},
        method=sam.prompt_encoder.get_dense_pe,
    )
    cfg = EngineConfig(
        grid_size=24, points_per_batch=8, max_prompts=32, n_class=1,
        img_size=sam.img_size, low_res=sam.img_size // 4,
        pos_sim_thresh=0.3, pred_iou_thresh=0.0, stability_score_thresh=0.0,
        min_mask_region_area=0.0, max_keep=32,
    )
    r = cfg.low_res
    args = dict(
        params=sam.params,
        features=feats,
        dense_pe=pe,
        dino_feats_proj=jnp.asarray(
            rng.normal(0, 1, (r, r, 256)).astype(np.float32)
        ),
        sim_map=jnp.asarray(
            rng.uniform(0, 1, (24, 24)).astype(np.float32)
        ),
        feat_hw=jnp.asarray([24, 18]),
        input_hw=jnp.asarray([sam.img_size, sam.img_size * 3 // 4]),
        crop_box=jnp.asarray([0, 0, sam.img_size * 3 // 4, sam.img_size]),
        orig_hw=jnp.asarray([sam.img_size, sam.img_size * 3 // 4]),
        downscale=jnp.asarray(1.0),
        key=jax.random.PRNGKey(0),
    )
    out_fused = make_eps_engine(sam.prompt_encoder, sam.mask_decoder, cfg)(
        **args
    )
    out_ref = make_eps_engine(
        sam.prompt_encoder, sam.mask_decoder,
        dataclasses.replace(cfg, fused_decode=False),
    )(**args)

    assert int(out_fused["num_consumed"]) == int(out_ref["num_consumed"])
    np.testing.assert_array_equal(
        np.asarray(out_fused["valid"]), np.asarray(out_ref["valid"])
    )
    np.testing.assert_allclose(
        np.asarray(out_fused["summary"]), np.asarray(out_ref["summary"]),
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(out_fused["masks"]), np.asarray(out_ref["masks"])
    )


def test_fused_decode_packed_matches_spatial(setup):
    from crowdsam_tpu.ops.packed import pack_spatial, unpack_spatial

    sam, feats, pe, sparse, dense, dino = setup
    h = sam.image_encoder.img_size // sam.image_encoder.patch_size

    shared = precompute_decode_shared(
        sam.params["mask_decoder"],
        sam.params["prompt_encoder"]["no_mask_embed"],
        feats, pe, num_heads=8, dtype=jnp.float32,
    )
    m_sp, iou_sp, cls_sp = fused_decode(
        sam.params["mask_decoder"], shared, sparse, True,
        dino_feats_proj=dino, num_heads=8, dtype=jnp.float32, n_class=3,
    )
    dino_packed = pack_spatial(
        jnp.moveaxis(dino, -1, 0)            # (C, 4h, 4w)
    ).reshape(dino.shape[-1], -1).T           # (h*w*16, C)
    m_pk, iou_pk, cls_pk = fused_decode(
        sam.params["mask_decoder"], shared, sparse, True,
        dino_feats_proj=dino_packed, num_heads=8, dtype=jnp.float32,
        n_class=3, packed_masks=True,
    )
    assert m_pk.shape == (sparse.shape[0], 4, h * h, 16)
    m_pk_sp = unpack_spatial(m_pk, h, h)
    np.testing.assert_allclose(m_pk_sp, m_sp, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(iou_pk, iou_sp, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(cls_pk, cls_sp, rtol=2e-4, atol=2e-4)

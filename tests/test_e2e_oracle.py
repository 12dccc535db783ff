"""End-to-end loop-level parity: CrowdSAM.generate vs the reference-shaped
dynamic loop oracle (tests/ref_loop_oracle.py).

The strict test must agree detection-for-detection with the engine
(boxes/scores/categories/points/stability/masks/consumed-prompt count) —
it fails if any EPS-loop logic (coord scaling, occupy pruning, filter
order, NMS, small-region postprocess, score/uncrop assembly) diverges from
reference `crowdsam/model.py:192-443` semantics modulo the deviations
documented in PARITY.md.

The bound test runs the oracle in mode="exact" (full reference semantics:
image-frame masks before filtering, image-coordinate occupy, full-res NMS
boxes, unscaled cleanup threshold) and quantifies the deviations' effect.
"""

import jax
import numpy as np
import pytest

from crowdsam_tpu.config import load_config, modify_config
from crowdsam_tpu.ops.rle import coco_decode_rle
from crowdsam_tpu.pipeline.crowdsam import CrowdSAM

from ref_loop_oracle import oracle_generate


def oracle_config(**overrides):
    cfg = load_config(None)
    opts = [
        "model.sam_model", "vit_tiny",
        "model.dino_model", "dinov2_vits14",
        "model.sam_checkpoint", "",
        "model.dino_checkpoint", "",
        "model.sam_adapter_checkpoint", "",
        "test.max_size", "256",
        "test.grid_size", "48",
        "test.max_prompts", "96",
        "test.points_per_batch", "8",
        # exercise every filter with the amplified random model (see the
        # `model` fixture): pred-IoU, stability, and occupy pruning are all
        # partially active at these values (probed: pre-NMS survivors
        # 37-70 of 96 consumed, final detections 8/2/13 across the three
        # trials — multi-survivor NMS)
        "test.pred_iou_thresh", "0.004",
        "test.stability_score_thresh", "0.03",
        "test.stability_score_offset", "8.0",
        "test.filter_thresh", "0.010",
        "test.pos_sim_thresh", "0.3",
        "tpu.compute_dtype", "float32",
        # the engine's unfused path calls the same decoder module the
        # oracle does (fused-decode numerics are A/B'd elsewhere)
        "tpu.fused_decode", "False",
    ]
    for k, v in overrides.items():
        opts += [k, str(v)]
    return modify_config(cfg, opts)


def _structured_image(rng, h, w):
    """Blob-structured image: smoother FG maps than pure noise, so the
    occupy/NMS/cleanup paths see object-like masks."""
    img = rng.integers(0, 120, (h, w, 3), dtype=np.uint8).astype(np.int32)
    for _ in range(6):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        ry, rx = rng.integers(10, h // 3), rng.integers(10, w // 3)
        yy, xx = np.mgrid[0:h, 0:w]
        blob = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
        img[blob] += int(rng.integers(60, 135))
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def model():
    """Tiny CrowdSAM with targeted weight amplification so random-weight
    masks are partial, prompt-dependent, and varied: the prompt encoder's
    Fourier matrix and point embeddings x8 (decorrelates prompts), the
    hypernetwork output layers x6 and the final upscale conv x8 (spreads
    mask logits to ~±20 without touching the token/iou/cls paths, which
    keeps cross-compile numerics tight), and the mask threshold moved into
    the logit spread.  At default scale every prompt decodes to a nearly
    identical low-amplitude mask and the loop degenerates to one
    detection; amplifying EVERYTHING instead makes the PWD pooling softmax
    a hard max over huge logits, which is numerically chaotic across
    compile contexts."""
    import dataclasses

    import jax
    from flax import traverse_util as tu

    from crowdsam_tpu.pipeline.engine import make_eps_engine

    def _amp(params, rules):
        flat = tu.flatten_dict(params, sep="/")
        for k in list(flat):
            for pat, f in rules:
                if pat in k:
                    flat[k] = flat[k] * f
        return tu.unflatten_dict(
            {tuple(k.split("/")): v for k, v in flat.items()})

    m = CrowdSAM(oracle_config())
    m.sam.params["prompt_encoder"] = _amp(
        m.sam.params["prompt_encoder"],
        [("pe_gaussian", 8.0), ("point_embeddings", 8.0)])
    m.sam.params["mask_decoder"] = _amp(
        m.sam.params["mask_decoder"],
        [("hyper_mlps", 6.0), ("upscale_3", 8.0)])
    m.engine_cfg = dataclasses.replace(m.engine_cfg, mask_threshold=28.0)
    m.engine = make_eps_engine(
        m.sam.prompt_encoder, m.sam.mask_decoder, m.engine_cfg,
        spec_with_masks=m.output_rles)
    m._build_survivor_programs()
    return m


def _run_engine(model, image):
    """Single-crop generate via the dispatch/finalize pair so we can also
    read the engine's consumed-prompt counter and pre-NMS summary."""
    img = np.asarray(image, np.uint8)
    crop_box = [0, 0, img.shape[1], img.shape[0]]
    key0 = model._key
    res, meta = model._dispatch_crop(img, crop_box)
    consumed = int(np.asarray(res["num_consumed"]))
    summary = np.asarray(res["summary"])
    data = model._finalize_crop(res, meta)
    sub = jax.random.split(key0)[1]
    return data, consumed, sub, summary


def _sorted(dets_scores):
    return np.argsort(-np.asarray(dets_scores), kind="stable")


@pytest.mark.slow
def test_engine_matches_reference_loop_oracle(model, rng):
    mismatches = []
    total_pre, max_final = 0, 0
    for t in range(3):
        image = _structured_image(rng, 160 + 16 * t, 256)
        data, consumed, sub, summary = _run_engine(model, image)
        o = oracle_generate(model, image, sub, mode="parity")

        assert consumed == o["num_consumed"], (
            f"trial {t}: engine consumed {consumed} prompts, "
            f"oracle {o['num_consumed']} — batch/occupy semantics diverge")

        # --- pre-NMS detection set: every prompt that passed the batch
        # filters must agree row-for-row (iou/category/stability/low-res
        # box/point), plus its NMS survival flag.  The engine summary keeps
        # finite iou for all filter-passing rows (engine.py:334,440-455).
        pre = summary[summary[:, 1] > -1e30]
        p = o["prenms"]
        assert len(pre) == len(p["iou"]), (
            f"trial {t}: engine pre-NMS {len(pre)} rows, oracle "
            f"{len(p['iou'])} — filter semantics diverge")
        if len(pre):
            ei_p = np.lexsort((pre[:, 1], pre[:, 11], pre[:, 10]))
            oi_p = np.lexsort((p["iou"], p["pt"][:, 1], p["pt"][:, 0]))
            np.testing.assert_allclose(
                pre[ei_p][:, 10:12], p["pt"][oi_p], atol=1e-3,
                err_msg=f"trial {t}: pre-NMS points")
            np.testing.assert_allclose(
                pre[ei_p][:, 1], p["iou"][oi_p], atol=2e-4,
                err_msg=f"trial {t}: pre-NMS iou")
            np.testing.assert_array_equal(
                pre[ei_p][:, 3].astype(int), p["cat"][oi_p],
                err_msg=f"trial {t}: pre-NMS categories")
            np.testing.assert_allclose(
                pre[ei_p][:, 4], p["stab"][oi_p], atol=1e-4,
                err_msg=f"trial {t}: pre-NMS stability")
            np.testing.assert_allclose(
                pre[ei_p][:, 6:10], p["box"][oi_p], atol=0.01,
                err_msg=f"trial {t}: pre-NMS low-res boxes")
            np.testing.assert_array_equal(
                pre[ei_p][:, 0] > 0.5, p["keep"][oi_p],
                err_msg=f"trial {t}: NMS keep flags")

        n_e = 0 if data is None else len(data["boxes"])
        n_o = len(o["boxes"])
        assert n_e == n_o, (
            f"trial {t}: engine produced {n_e} detections, oracle {n_o}")
        total_pre += len(pre)
        max_final = max(max_final, n_e)
        if n_e == 0:
            continue

        ei = _sorted(data["scores"])
        oi = _sorted(o["scores"])
        np.testing.assert_allclose(
            np.asarray(data["scores"])[ei], o["scores"][oi], atol=2e-4,
            err_msg=f"trial {t}: scores")
        np.testing.assert_array_equal(
            np.asarray(data["categories"])[ei], o["categories"][oi],
            err_msg=f"trial {t}: categories")
        np.testing.assert_allclose(
            np.asarray(data["stability_score"])[ei], o["stability"][oi],
            atol=1e-4, err_msg=f"trial {t}: stability")
        np.testing.assert_allclose(
            np.asarray(data["points"])[ei], o["points"][oi], atol=1e-3,
            err_msg=f"trial {t}: prompt points")
        np.testing.assert_allclose(
            np.asarray(data["boxes"])[ei], o["boxes"][oi], atol=0.5,
            err_msg=f"trial {t}: boxes")

        # Masks: engine RLEs decode to the oracle's full-res masks.
        in_h, in_w = o["in_hw"]
        for k in range(n_e):
            m_e = coco_decode_rle(data["rles"][ei[k]]).astype(bool)
            m_o = o["masks"][oi[k]]
            assert m_e.shape == (in_h, in_w)
            inter = (m_e & m_o).sum()
            union = (m_e | m_o).sum()
            iou = inter / union if union else 1.0
            if iou < 0.999:
                mismatches.append((t, k, iou))
    assert not mismatches, f"mask mismatches: {mismatches}"
    # Non-vacuity: the tuned regime must actually exercise the loop — many
    # filter-passing prompts and a multi-detection NMS outcome.
    assert total_pre >= 30, f"only {total_pre} pre-NMS rows across trials"
    assert max_final >= 3, f"max final detections {max_final} — NMS never " \
                           "kept multiple survivors"


@pytest.fixture(scope="module")
def bound_model():
    """Variant model for the deviation-bound test: the same amplification
    but a LOWER mask threshold (smooth, larger masks — random-weight masks
    at a high threshold are knife-edge pointy, so the stability score
    computed at image resolution collapses to ~0 while the low-res one
    doesn't; real-weight masks are flat-topped and don't have that
    artifact) and the stability/pred-IoU filters off, so the bound
    isolates the deviations it targets: the 256^2 occupy bitmap vs
    image-coordinate occupy, and low-res vs full-res NMS boxes."""
    import dataclasses

    import jax
    from flax import traverse_util as tu

    from crowdsam_tpu.pipeline.engine import make_eps_engine

    def _amp(params, rules):
        flat = tu.flatten_dict(params, sep="/")
        for k in list(flat):
            for pat, f in rules:
                if pat in k:
                    flat[k] = flat[k] * f
        return tu.unflatten_dict(
            {tuple(k.split("/")): v for k, v in flat.items()})

    m = CrowdSAM(oracle_config(**{
        "test.pred_iou_thresh": "0.0",
        "test.stability_score_thresh": "0.0",
    }))
    m.sam.params["prompt_encoder"] = _amp(
        m.sam.params["prompt_encoder"],
        [("pe_gaussian", 8.0), ("point_embeddings", 8.0)])
    m.sam.params["mask_decoder"] = _amp(
        m.sam.params["mask_decoder"],
        [("hyper_mlps", 6.0), ("upscale_3", 8.0)])
    m.engine_cfg = dataclasses.replace(m.engine_cfg, mask_threshold=20.0)
    m.engine = make_eps_engine(
        m.sam.prompt_encoder, m.sam.mask_decoder, m.engine_cfg,
        spec_with_masks=m.output_rles)
    m._build_survivor_programs()
    return m


@pytest.mark.slow
def test_occupy_quantization_bound(bound_model, rng):
    """Bound the 256^2 occupy-bitmap deviation (PARITY.md #6) against full
    reference semantics (image-coordinate occupy over full-res masks):
    prompt consumption must agree within 10%.  Detection-level agreement
    is NOT asserted here — random-weight mask logits are knife-edge
    pointy, so binarize-before vs binarize-after the 4x upsample collapses
    masks by orders of magnitude (measured: a half-frame low-res mask
    becomes 45 px at image res), an artifact real flat-topped SAM masks do
    not have; the resolution deviation is bounded on realistic mask
    shapes by test_resolution_deviation_bound_on_blobs below."""
    model = bound_model
    for t in range(2):
        # Square images: no bottom pad (PARITY.md deviation #7 otherwise
        # dominates in this synthetic regime).
        image = _structured_image(rng, 256, 256)
        data, consumed, sub, _summary = _run_engine(model, image)
        o = oracle_generate(model, image, sub, mode="exact")
        assert abs(consumed - o["num_consumed"]) <= max(
            8, 0.1 * max(consumed, o["num_consumed"])), (
            f"trial {t}: consumed {consumed} vs exact {o['num_consumed']}")


def test_resolution_deviation_bound_on_blobs(rng):
    """Bound the low-res-cleanup deviation (PARITY.md #1/#3) on realistic
    flat-topped blob masks: the engine's survivor pass (256^2 cleanup with
    the rescaled threshold + nearest-upsampled corrections) must agree
    with exact reference semantics (binarize the upsampled logits, cv2-
    style cleanup at image resolution with the unscaled threshold) to
    mask IoU >= 0.98 and box error <= 4 px — except for features whose
    area falls within the quantization band around the threshold, which
    are constructed and asserted separately."""
    import jax.numpy as jnp

    from ref_loop_oracle import np_mask_to_box, np_remove_small_regions
    from crowdsam_tpu.pipeline.engine import EngineConfig, make_survivor_pass

    cfg = EngineConfig(img_size=1024, low_res=256, min_mask_region_area=100.0)
    sp = make_survivor_pass(cfg, with_masks=True)
    in_h, in_w = 1024, 1024

    k = 8
    logits = np.full((k, 256, 256), -8.0, np.float32)
    for i in range(k):
        cy, cx = rng.integers(40, 200, 2)
        ry, rx = rng.integers(15, 50, 2)
        yy, xx = np.mgrid[0:256, 0:256]
        blob = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
        logits[i][blob] = 8.0
        # island well below threshold (removed at both resolutions:
        # 2x2 low-res = 64 px full-res < 100)
        logits[i, 220:222, 220:222] = 8.0
        # island well above threshold (kept at both: 4x4 = 256 px > 100)
        logits[i, 10:14, 10:14] = 8.0
        # hole well below threshold (filled at both)
        logits[i, cy - 1 : cy + 1, cx - 1 : cx + 1] = -8.0

    out = sp(jnp.asarray(logits), jnp.int32(k),
             jnp.asarray((in_h, in_w), jnp.int32))
    engine_full = np.unpackbits(np.asarray(out["packed"]), axis=-1).astype(bool)
    summary = np.asarray(out["summary"])

    up = np.asarray(jax.image.resize(
        jnp.asarray(logits), (k, in_h, in_w), "linear", antialias=False))
    for i in range(k):
        m = up[i] > cfg.mask_threshold
        m, _ = np_remove_small_regions(m, cfg.min_mask_region_area, "holes")
        m, _ = np_remove_small_regions(m, cfg.min_mask_region_area, "islands")
        inter = (engine_full[i] & m).sum()
        union = (engine_full[i] | m).sum()
        assert union > 0
        iou = inter / union
        assert iou >= 0.98, f"mask {i}: engine-vs-exact IoU {iou:.4f}"
        eb = summary[i, 6:10]
        ob = np_mask_to_box(m[None])[0]
        assert np.abs(eb - ob).max() <= 4.0, (
            f"mask {i}: box {eb} vs exact {ob}")

    # Quantization band: a 6-px island at low res (~96 px full-res after
    # bilinear) sits inside the band [~88, ~113] where the two resolutions
    # may legitimately disagree — assert both verdicts stay within the
    # documented bound (removed or kept, never corrupted).
    band = np.full((1, 256, 256), -8.0, np.float32)
    band[0, 100:140, 100:140] = 8.0
    band[0, 200:203, 200:202] = 8.0  # 6 low-res px
    outb = sp(jnp.asarray(np.repeat(band, k, 0)), jnp.int32(1),
              jnp.asarray((in_h, in_w), jnp.int32))
    eng = np.unpackbits(np.asarray(outb["packed"]), axis=-1).astype(bool)[0]
    upb = np.asarray(jax.image.resize(
        jnp.asarray(band), (1, in_h, in_w), "linear", antialias=False))[0]
    mb = upb > cfg.mask_threshold
    mb, _ = np_remove_small_regions(mb, cfg.min_mask_region_area, "holes")
    mb, _ = np_remove_small_regions(mb, cfg.min_mask_region_area, "islands")
    # main blob identical either way
    assert (eng[400:560, 400:560] == mb[400:560, 400:560]).all()
    # the band island differs by at most its own area
    diff = (eng != mb).sum()
    assert diff <= 16 * 16 * 6, f"quantization-band disagreement {diff} px"


@pytest.fixture(scope="module")
def multicrop_model():
    """Amplified tiny model with crop_n_layers=1 (the reference's
    multi-crop path: per-crop EPS loops + cross-crop NMS preferring
    smaller crops, model.py:151-190)."""
    import dataclasses

    import jax
    from flax import traverse_util as tu

    from crowdsam_tpu.pipeline.engine import make_eps_engine

    def _amp(params, rules):
        flat = tu.flatten_dict(params, sep="/")
        for k in list(flat):
            for pat, f in rules:
                if pat in k:
                    flat[k] = flat[k] * f
        return tu.unflatten_dict(
            {tuple(k.split("/")): v for k, v in flat.items()})

    m = CrowdSAM(oracle_config(**{"test.crop_n_layers": "1"}))
    m.sam.params["prompt_encoder"] = _amp(
        m.sam.params["prompt_encoder"],
        [("pe_gaussian", 8.0), ("point_embeddings", 8.0)])
    m.sam.params["mask_decoder"] = _amp(
        m.sam.params["mask_decoder"],
        [("hyper_mlps", 6.0), ("upscale_3", 8.0)])
    m.engine_cfg = dataclasses.replace(m.engine_cfg, mask_threshold=28.0)
    m.engine = make_eps_engine(
        m.sam.prompt_encoder, m.sam.mask_decoder, m.engine_cfg,
        spec_with_masks=m.output_rles)
    m._build_survivor_programs()
    return m


@pytest.mark.slow
def test_multicrop_matches_reference_loop_oracle(multicrop_model, rng):
    """Multi-crop generate (crop_n_layers=1): per-crop loops + the
    cross-crop NMS (scores = 1/crop_area, smaller crops win; crop_boxes
    dropped afterwards) must agree with the reference-shaped oracle."""
    from ref_loop_oracle import oracle_generate_multicrop

    model = multicrop_model
    image = _structured_image(rng, 224, 256)
    key0 = model._key
    data = model.generate(image)
    o = oracle_generate_multicrop(model, image, key0, mode="parity")

    assert o["n_crops"] > 1, "config did not produce multiple crops"
    n_e = len(data["boxes"])
    n_o = len(o["boxes"])
    assert n_e == n_o, f"engine {n_e} vs oracle {n_o} detections"
    assert n_e > 0, "multi-crop run produced no detections"

    np.testing.assert_allclose(np.asarray(data["scores"]), o["scores"],
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(data["boxes"]), o["boxes"],
                               atol=0.5)
    np.testing.assert_allclose(np.asarray(data["points"]), o["points"],
                               atol=1e-2)
    np.testing.assert_array_equal(np.asarray(data["categories"]),
                                  o["categories"])
    assert "crop_boxes" not in list(data.keys())


@pytest.mark.slow
def test_hq_arch_matches_reference_loop_oracle(rng):
    """sam_hq arch through the loop oracle: the engine's is_hq decode
    branch (HQ token + hoisted fusion, engine.py:261-271) must agree with
    the oracle's dynamic loop row-for-row on the pre-NMS set.  Run with
    filters open (random HQ weights are not amplification-tuned, so the
    detection count degenerates — the per-prompt row comparison is the
    signal here)."""
    m = CrowdSAM(oracle_config(**{
        "model.sam_arch": "sam_hq",
        "model.sam_model": "hqvit_tiny",
        "test.pred_iou_thresh": "0.0",
        "test.stability_score_thresh": "0.0",
        "test.filter_thresh": "0.005",
        "test.max_prompts": "32",
    }))
    image = _structured_image(rng, 160, 256)
    data, consumed, sub, summary = _run_engine(m, image)
    o = oracle_generate(m, image, sub, mode="parity")

    assert consumed == o["num_consumed"]
    pre = summary[summary[:, 1] > -1e30]
    p = o["prenms"]
    assert len(pre) == len(p["iou"]) > 0
    ei = np.lexsort((pre[:, 1], pre[:, 11], pre[:, 10]))
    oi = np.lexsort((p["iou"], p["pt"][:, 1], p["pt"][:, 0]))
    np.testing.assert_allclose(pre[ei][:, 10:12], p["pt"][oi], atol=1e-3)
    np.testing.assert_allclose(pre[ei][:, 1], p["iou"][oi], atol=2e-4)
    np.testing.assert_allclose(pre[ei][:, 6:10], p["box"][oi], atol=0.01)
    np.testing.assert_array_equal(pre[ei][:, 0] > 0.5, p["keep"][oi])
    n_e = 0 if data is None else len(data["boxes"])
    assert n_e == len(o["boxes"])

"""End-to-end pipeline tests on a tiny random-weight model (CPU).

These validate the EPS engine mechanics (static-shape loop, filtering,
NMS, RLE output) and the CrowdSAM.generate contract — not detection quality
(no pretrained weights in this environment; numerics are covered by the
parity tests)."""

import numpy as np
import pytest

from crowdsam_tpu.config import load_config, modify_config
from crowdsam_tpu.ops.rle import coco_decode_rle
from crowdsam_tpu.pipeline.crowdsam import CrowdSAM


def tiny_config(**overrides):
    cfg = load_config(None)
    opts = [
        "model.sam_model", "vit_tiny",
        "model.dino_model", "dinov2_vits14",
        "model.sam_checkpoint", "",
        "model.dino_checkpoint", "",
        "model.sam_adapter_checkpoint", "",
        "test.max_size", "256",
        "test.grid_size", "48",
        "test.max_prompts", "64",
        "test.points_per_batch", "8",
        "test.pred_iou_thresh", "0.0",
        "test.stability_score_thresh", "0.0",
        "test.pos_sim_thresh", "0.3",
        "tpu.compute_dtype", "float32",
    ]
    for k, v in overrides.items():
        opts += [k, str(v)]
    return modify_config(cfg, opts)


@pytest.fixture(scope="module")
def tiny_model():
    return CrowdSAM(tiny_config())


def test_generate_contract(tiny_model, rng):
    image = rng.integers(0, 255, (200, 256, 3), dtype=np.uint8)
    data = tiny_model.generate(image)
    keys = set(data.keys())
    assert {"boxes", "scores", "rles"} <= keys
    n = len(data["boxes"])
    if n > 0:
        assert {"categories", "points", "fboxes", "crop_boxes",
                "stability_score"} <= keys
        assert data["boxes"].shape == (n, 4)
        assert data["scores"].shape == (n,)
        assert len(data["rles"]) == n
        # RLEs decode at the resized-image frame (reference stores masks at
        # predictor.original_size, model.py:292-293).
        m = coco_decode_rle(data["rles"][0])
        assert m.shape == (200, 256)
        # rles_info carries [crop_box, [orig_h, orig_w]]
        crop_box, (oh, ow) = data["rles_info"][0], data["rles_info"][1]
        assert (oh, ow) == (200, 256)
        # boxes within image bounds
        assert (data["boxes"][:, [0, 2]] <= 256).all()
        assert (data["boxes"][:, [1, 3]] <= 200 + 1e-3).all()


def test_generate_deterministic(rng):
    image = rng.integers(0, 255, (128, 256, 3), dtype=np.uint8)
    m1 = CrowdSAM(tiny_config())
    m2 = CrowdSAM(tiny_config())
    d1 = m1.generate(image)
    d2 = m2.generate(image)
    assert len(d1["boxes"]) == len(d2["boxes"])
    if len(d1["boxes"]):
        np.testing.assert_allclose(d1["boxes"], d2["boxes"])
        np.testing.assert_allclose(d1["scores"], d2["scores"])


def test_engine_respects_max_prompts(tiny_model, rng):
    """The while loop must stop at max_prompts even with plentiful
    candidates (reference model.py:233)."""
    import jax.numpy as jnp
    import jax

    cfg = tiny_model.engine_cfg
    g = cfg.grid_size
    r = cfg.low_res
    sim = jnp.ones((g, g)) * 0.9  # every cell is a candidate
    res = tiny_model.engine(
        tiny_model.sam.params,
        jnp.zeros((1, tiny_model.sam.img_size // 16,
                   tiny_model.sam.img_size // 16, 256)),
        tiny_model.predictor.dense_pe
        if tiny_model.predictor.is_image_set
        else tiny_model.sam.prompt_encoder.apply(
            {"params": tiny_model.sam.params["prompt_encoder"]},
            method=tiny_model.sam.prompt_encoder.get_dense_pe,
        ),
        jnp.zeros((r, r, 256)),
        sim,
        jnp.asarray((g, g), jnp.float32),
        jnp.asarray((256, 256), jnp.float32),
        jnp.asarray((0, 0, 256, 256), jnp.float32),
        jnp.asarray((256, 256), jnp.float32),
        jnp.float32(1.0),
        jax.random.PRNGKey(0),
    )
    consumed = int(res["num_consumed"])
    assert consumed >= min(cfg.max_prompts, g * g)
    assert consumed <= cfg.max_iters * cfg.points_per_batch


def test_vanilla_sam_arch_runs_without_dino(rng):
    cfg = tiny_config()
    cfg["model"]["sam_arch"] = "sam"
    cfg["model"]["trainfree"] = False
    model = CrowdSAM(cfg)
    image = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
    data = model.generate(image)
    assert "boxes" in data.keys()


def test_generate_many_matches_generate(rng):
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM

    images = [
        rng.integers(0, 255, (160, 256, 3), dtype=np.uint8) for _ in range(3)
    ]
    m1 = CrowdSAM(tiny_config())
    seq = [m1.generate(im) for im in images]
    m2 = CrowdSAM(tiny_config())
    piped = m2.generate_many(images)
    assert len(piped) == len(seq)
    for a, b in zip(seq, piped):
        assert len(a["boxes"]) == len(b["boxes"])
        if len(a["boxes"]):
            np.testing.assert_allclose(a["boxes"], b["boxes"], atol=1e-4)
            np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-5)
            assert a["rles"] == b["rles"]


def test_generate_many_auto_prewarms(rng):
    """The production multi-image path must prewarm the survivor buckets
    itself (VERDICT r2 #4) — exactly once, and explicit prewarm_survivors
    calls must suppress the automatic one."""
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM

    m = CrowdSAM(tiny_config())
    calls = []
    orig = m.prewarm_survivors
    m.prewarm_survivors = lambda *a, **k: (calls.append(1), orig(*a, **k))
    images = [
        rng.integers(0, 255, (96, 128, 3), dtype=np.uint8) for _ in range(2)
    ]
    m.generate_many(images)
    assert calls == [1]
    m.generate_many(images)  # second run: already warm
    assert calls == [1]


def test_prewarm_pipeline_precompiles_and_is_inert(rng):
    """prewarm_pipeline (r4 cold-start precompile) must (a) compile the
    exact encode/fg/sim/engine programs generate() uses — no fresh compile
    on the first real call — and (b) leave results bit-identical to a
    model that never prewarmed (the RNG stream may not advance)."""
    import jax.numpy as jnp  # noqa: F401 — parity with sibling tests

    image = rng.integers(0, 255, (200, 256, 3), dtype=np.uint8)
    m1 = CrowdSAM(tiny_config())
    m1.prewarm_pipeline(image)
    sizes = {
        "engine": m1.engine._cache_size(),
        "encode": m1.predictor._encode_jit._cache_size(),
        "fg": m1.predictor._fg_map_jit._cache_size(),
        "sim": m1._sim_prep._cache_size(),
    }
    assert all(v == 1 for v in sizes.values()), sizes
    d1 = m1.generate(image)
    sizes_after = {
        "engine": m1.engine._cache_size(),
        "encode": m1.predictor._encode_jit._cache_size(),
        "fg": m1.predictor._fg_map_jit._cache_size(),
        "sim": m1._sim_prep._cache_size(),
    }
    assert sizes_after == sizes, (
        "generate() compiled a fresh program after prewarm_pipeline",
        sizes, sizes_after)

    m2 = CrowdSAM(tiny_config())
    d2 = m2.generate(image)
    assert len(d1["boxes"]) == len(d2["boxes"])
    if len(d1["boxes"]):
        np.testing.assert_allclose(d1["boxes"], d2["boxes"])
        np.testing.assert_allclose(d1["scores"], d2["scores"])


def test_prewarm_survivors_covers_every_bucket(tiny_model):
    """After prewarm_survivors(), hitting any bucket size with production
    shapes/dtypes must not trigger a new compile (VERDICT r2 #4: a
    steady-state generate_many loop must never eat a mid-run XLA compile
    when a fresh detection count lands in a new bucket)."""
    import jax.numpy as jnp

    m = tiny_model
    cfg = m.engine_cfg
    m.prewarm_survivors()
    warmed = m._survivor_gathered._cache_size()
    buckets = m.SURVIVOR_BUCKETS + (cfg.max_keep,)
    assert warmed == len([b for b in buckets if b <= cfg.max_keep])

    r = cfg.low_res
    slab = jnp.zeros((cfg.max_keep, r, r), jnp.bfloat16)
    for b in buckets:
        # Production callsite shapes: traced in_hw, int32 n, int32 idx.
        m._survivor_gathered(
            slab, jnp.zeros((b,), jnp.int32), jnp.int32(min(3, b)),
            jnp.asarray((200, 256), jnp.int32),
        )
    assert m._survivor_gathered._cache_size() == warmed, (
        "a bucket call compiled a fresh program after prewarm")


def test_survivor_device_tail():
    """The survivor pass now does the full-res tail on device: corrections
    (island erased / hole filled), full-res boxes, and RLE change indices
    that decode to the packed bitmap exactly."""
    import jax.numpy as jnp

    from crowdsam_tpu.ops import rle as rle_ops
    from crowdsam_tpu.pipeline.engine import EngineConfig, make_survivor_pass

    cfg = EngineConfig(img_size=1024, low_res=256, min_mask_region_area=100.0)
    sp = make_survivor_pass(cfg, with_masks=True)

    logits = np.full((8, 256, 256), -10.0, np.float32)
    logits[0, 50:150, 50:150] = 10.0    # big blob
    logits[0, 200:202, 200:202] = 10.0  # 4px island < 6.25 -> removed
    logits[0, 80:82, 80:82] = -10.0     # 4px hole < 6.25 -> filled
    in_h, in_w = 700, 1024
    out = sp(jnp.asarray(logits), jnp.int32(1),
             jnp.asarray((in_h, in_w), jnp.int32))

    summary = np.asarray(out["summary"])
    assert summary[0, 0] > 0.5   # kept
    assert summary[0, 1] > 0.5   # changed
    assert summary[0, 11] > 0.5  # nonempty

    full = np.unpackbits(np.asarray(out["packed"]), axis=-1).astype(bool)
    assert not full[0, 796:812, 796:812].any()   # island erased on device
    assert full[0, 320:328, 320:328].all()       # hole filled on device
    assert full[0, 400:500, 300:400].any()       # blob intact

    # Device boxes match the packed masks.
    ys, xs = np.nonzero(full[0])
    np.testing.assert_array_equal(
        summary[0, 6:10], [xs.min(), ys.min(), xs.max(), ys.max()]
    )

    # RLE change indices decode to exactly the packed mask (valid region).
    nch = int(summary[0, 10])
    assert 0 < nch <= cfg.max_rle_changes
    svals = np.asarray(out["rle_svals"])[0, :nch]
    rle = rle_ops.encode_changes_coco(svals, in_h * in_w, (in_h, in_w))
    dec = rle_ops.coco_decode_rle(rle).astype(bool)
    np.testing.assert_array_equal(dec, full[0, :in_h, :in_w])
    # Empty (invalid) rows: no changes.
    assert (summary[1:, 10] == 0).all()


def test_survivor_rle_bottom_edge_column_link():
    """Regression: a mask whose columns run to the bottom edge of the
    valid region must produce correct Fortran-order RLE — each next
    column's first element compares against the PREVIOUS column's last
    valid element (amg.py:107-135 flatten order='F' semantics).  A prior
    revision applied the column-start fix to the wrong axis, dropping
    these transitions (and corrupting column 0's counts)."""
    import jax.numpy as jnp

    from crowdsam_tpu.ops import rle as rle_ops
    from crowdsam_tpu.pipeline.engine import EngineConfig, make_survivor_pass

    cfg = EngineConfig(img_size=1024, low_res=256, min_mask_region_area=0.0)
    sp = make_survivor_pass(cfg, with_masks=True)
    in_h, in_w = 700, 1024

    logits = np.full((8, 256, 256), -10.0, np.float32)
    # Block running to the bottom of the valid region (rows 60..175 at low
    # res -> 240..700 full res) across columns 50..80, PLUS a touch of
    # column 0.
    logits[0, 60:175, 50:80] = 10.0
    logits[0, 30:40, 0:3] = 10.0

    out = sp(jnp.asarray(logits), jnp.int32(1),
             jnp.asarray((in_h, in_w), jnp.int32))
    summary = np.asarray(out["summary"])
    full = np.unpackbits(np.asarray(out["packed"]), axis=-1).astype(bool)
    nch = int(summary[0, 10])
    assert 0 < nch <= cfg.max_rle_changes, nch

    # Numpy oracle: true Fortran change positions of the valid region.
    ref = full[0, :in_h, :in_w]
    flat = ref.flatten(order="F")
    chg = np.nonzero(np.diff(np.concatenate([[0], flat.astype(np.int8)]))
                     != 0)[0]
    assert nch == len(chg)

    svals = np.asarray(out["rle_svals"])[0, :nch]
    np.testing.assert_array_equal(np.sort(svals), chg)

    rle = rle_ops.encode_changes_coco(svals, in_h * in_w, (in_h, in_w))
    dec = rle_ops.coco_decode_rle(rle).astype(bool)
    np.testing.assert_array_equal(dec, ref)


def test_trainfree_arch_generate(rng):
    """Train-free variant end to end (reference model.py:206-218,308-316 +
    configs/crowdhuman_trainfree.yaml: ImageNet-normalized DINO re-run,
    cosine similarity against a cached reference feature, mask_selection
    max_area, high filter_thresh): previously zero e2e coverage."""
    import jax.numpy as jnp

    cfg = tiny_config()
    cfg["model"]["trainfree"] = True
    cfg["test"]["mask_selection"] = "max_area"
    cfg["test"]["filter_thresh"] = 0.99
    cfg["test"]["pos_sim_thresh"] = 0.05
    cfg["test"]["max_prompts"] = 32
    model = CrowdSAM(cfg)
    # give the cosine-similarity path a non-degenerate reference feature
    model.ref_feature = jnp.asarray(
        rng.normal(0, 1, (model.predictor.dino_model.embed_dim,)).astype(
            np.float32))
    image = rng.integers(0, 255, (160, 256, 3), dtype=np.uint8)
    data = model.generate(image)
    keys = set(data.keys())
    assert {"boxes", "scores", "rles"} <= keys
    n = len(data["boxes"])
    if n:
        # train-free forces category 0 (reference model.py:358)
        assert (np.asarray(data["categories"]) == 0).all()


def test_gather_packed_rows_matches_host_indexing(tiny_model):
    """The overflow fallback must fetch exactly the requested packed rows
    (device-side gather, chunked to a fixed pad size) — transferring the
    whole slab per overflow was the r3 iteration-spike mechanism."""
    import jax.numpy as jnp

    m = tiny_model
    rng = np.random.default_rng(3)
    slab = jnp.asarray(
        rng.integers(0, 256, size=(40, 64, 8), dtype=np.uint8))
    host = np.asarray(slab)
    for rows in ([5], [0, 39, 7], list(range(17))):  # 17 > _OVERFLOW_PAD
        got = m._gather_packed_rows(slab, np.asarray(rows, np.int32))
        np.testing.assert_array_equal(got, host[rows])


def test_finalize_crop_overflow_fallback_end_to_end(tiny_model):
    """A mask whose RLE change count overflows the device budget must come
    back through the packed-bitmap fallback (device row gather + host
    encode) with an RLE identical to encoding the survivor pass's own
    bitmap; non-overflow masks still take the change-list path."""
    import jax.numpy as jnp

    from crowdsam_tpu.ops.rle import coco_decode_rle, encode_masks_coco

    m = tiny_model
    cfg = m.engine_cfg
    r = cfg.low_res
    slab_n = min(cfg.max_keep, cfg.slab)
    in_h, in_w = 200, cfg.img_size

    logits = -np.ones((slab_n, r, r), np.float32)
    logits[0, ::2, 8:16] = 1.0          # stripes: overflows the col budget
    logits[1, 10:30, 5:25] = 1.0        # normal blob
    summary = np.zeros((slab_n, 12), np.float32)
    summary[:2, 0] = 1.0                # two detections
    summary[:2, 1] = 0.9                # iou
    summary[:2, 2] = 0.8                # score
    summary[0, 6:10] = (8, 0, 16, r - 1)
    summary[1, 6:10] = (5, 10, 25, 30)
    res = {
        "summary": jnp.asarray(summary),
        "logits": jnp.asarray(logits, jnp.bfloat16),
        "num_consumed": jnp.int32(4),
    }
    meta = dict(crop_box=[0, 0, in_w, in_h], orig_hw=(in_h, in_w),
                in_hw=(in_h, in_w), downscale=1.0)
    data = m._finalize_crop(res, meta)
    assert data is not None and len(data["rles"]) == 2

    # Oracle: the survivor pass's own packed bitmaps for the same inputs.
    bucket = next(b for b in m.SURVIVOR_BUCKETS + (cfg.max_keep,) if b >= 2)
    idx = np.zeros(bucket, np.int32)
    idx[:2] = [0, 1]
    sp = m._survivor_gathered(
        res["logits"], jnp.asarray(idx), jnp.int32(2),
        jnp.asarray((in_h, in_w), jnp.int32))
    nch = np.asarray(sp["summary"])[:2, 10]
    assert nch[0] > cfg.max_rle_changes  # stripes overflowed
    assert 0 < nch[1] <= cfg.max_rle_changes
    packed = np.asarray(sp["packed"])[:2]
    full = np.unpackbits(packed, axis=-1)[:, :in_h, :in_w].astype(bool)
    expect = encode_masks_coco(full)
    assert data["rles"] == expect
    for i in range(2):
        got = coco_decode_rle(data["rles"][i])
        np.testing.assert_array_equal(got.astype(bool), full[i])


def test_bench_timed_regime_lead_exclusion(tiny_model, rng):
    """bench._timed_regime: the first `lead` per-image deltas are excluded
    from stats (pipeline fill + first-touch host work) but recorded, and
    the diagnostics cover every image."""
    import bench

    image = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    results, stats, diag = bench._timed_regime(tiny_model, image, iters=3,
                                               lead=2)
    assert len(stats["iters_ms"]) == 3
    assert len(stats["lead_ms"]) == 2
    assert stats["median_ms"] == float(np.median(stats["iters_ms"]))
    assert len(diag["keep_counts"]) == 5 and len(diag["tail_paths"]) == 5
    # every timed iteration's result comes back (the quality gate scores
    # all of them, VERDICT r4 #2)
    assert len(results) == 5
    assert all(isinstance(r, dict) or hasattr(r, "keys") for r in results)


def test_resize_matrix_linear_matches_jax_and_truncates_exactly():
    """resize_matrix_linear == jax.image.resize('linear', antialias=False),
    and slicing its columns to a band is exact when the dropped input rows
    are zero (the rect-encode DINO input construction)."""
    import jax
    import jax.numpy as jnp

    from crowdsam_tpu.ops.resize import resize_matrix_linear

    rng = np.random.default_rng(11)
    s, d = 64, 58
    x = rng.normal(size=(s, 5)).astype(np.float32)
    want = np.asarray(jax.image.resize(jnp.asarray(x), (d, 5), "linear",
                                       antialias=False))
    got = resize_matrix_linear(s, d) @ x
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # Truncation: zero everything from row hb on; the (dh, hb) slice then
    # reproduces the square result's first dh rows exactly.
    hb, dh = 40, 28
    x2 = x.copy()
    x2[hb:] = 0.0
    want2 = np.asarray(jax.image.resize(jnp.asarray(x2), (d, 5), "linear",
                                        antialias=False))[:dh]
    got2 = resize_matrix_linear(s, d)[:dh, :hb] @ x2[:hb]
    np.testing.assert_allclose(got2, want2, atol=1e-5, rtol=1e-5)


def test_rect_encode_square_input_identical(rng):
    """With a square input the rect branch is inert: results match the
    default pipeline exactly (same encode program semantics)."""
    image = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
    m_sq = CrowdSAM(tiny_config())
    m_rect = CrowdSAM(tiny_config(**{"tpu.rect_encode": "True"}))
    a = m_sq.generate(image)
    b = m_rect.generate(image)
    assert len(a["boxes"]) == len(b["boxes"])
    if len(a["boxes"]):
        np.testing.assert_allclose(a["boxes"], b["boxes"], atol=1e-5)
        np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-6)


def test_rect_encode_smoke(rng):
    """Rect input through the rect-encode pipeline: valid contract, RLEs
    decode at the image frame, detections stay inside the valid region."""
    from crowdsam_tpu.ops.rle import coco_decode_rle

    image = rng.integers(0, 255, (160, 256, 3), dtype=np.uint8)
    m = CrowdSAM(tiny_config(**{"tpu.rect_encode": "True"}))
    assert m.predictor.rect_encode
    data = m.generate(image)
    assert {"boxes", "scores", "rles"} <= set(data.keys())
    if len(data["boxes"]):
        assert (data["boxes"][:, [1, 3]] <= 160 + 1e-3).all()
        mk = coco_decode_rle(data["rles"][0])
        assert mk.shape == (160, 256)

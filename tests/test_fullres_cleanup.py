"""Exact full-resolution small-region cleanup (tpu.fullres_cleanup).

Default mode cleans at the 256^2 decode resolution with a rescaled area
threshold (documented deviation); this opt-in mode reproduces the
reference's exact semantics — cv2 connectedComponentsWithStats on the
UPSAMPLED image-resolution masks with the unscaled threshold
(crowdsam/model.py:394-443, amg.py:267-291) — verified against cv2 here.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from crowdsam_tpu.pipeline.engine import EngineConfig, make_survivor_pass


def _cv2_clean(mask, area_thresh, mode):
    import cv2

    correct_holes = mode == "holes"
    working = (mask ^ correct_holes).astype(np.uint8)
    n, regions, stats, _ = cv2.connectedComponentsWithStats(working, 8)
    sizes = stats[:, -1][1:]
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask.copy(), False
    fill = np.isin(regions, small)
    if correct_holes:
        return mask | fill, True
    out = mask & ~fill
    if not out.any() and mask.any():
        largest = int(np.argmax(sizes)) + 1
        out = regions == largest
    return out, True


def _blob_logits(rng, k=4, r=64):
    from scipy.ndimage import gaussian_filter

    x = gaussian_filter(rng.normal(size=(k, r, r)), sigma=4.0, axes=(1, 2))
    # center so each mask has fg and bg structure; scale up for crisp edges
    return (x - np.median(x, axis=(1, 2), keepdims=True)) * 40.0


def test_survivor_pass_fullres_matches_cv2(rng):
    pytest.importorskip("cv2")
    k, r, s = 4, 64, 256
    cfg = EngineConfig(
        img_size=s, low_res=r, min_mask_region_area=100.0,
        fullres_cleanup=True,
    )
    run = make_survivor_pass(cfg, with_masks=True)
    logits = _blob_logits(rng, k, r).astype(np.float32)

    out = run(
        jnp.asarray(logits), jnp.int32(k), jnp.asarray((s, s), jnp.int32)
    )
    got = np.unpackbits(np.asarray(out["packed"]), axis=-1).astype(bool)
    summary = np.asarray(out["summary"])

    # Oracle: identical bilinear upsample, then cv2 cleanup at full res.
    import jax

    up = np.asarray(
        jax.image.resize(
            jnp.asarray(logits), (k, s, s), "linear", antialias=False
        )
    ) > cfg.mask_threshold
    for i in range(k):
        m1, ch1 = _cv2_clean(up[i], 100.0, "holes")
        m2, ch2 = _cv2_clean(m1, 100.0, "islands")
        np.testing.assert_array_equal(
            got[i], m2, err_msg=f"mask {i} differs from cv2 full-res cleanup"
        )
        assert bool(summary[i, 1]) == (ch1 or ch2)  # changed flag
        # full-res boxes match the cleaned masks
        if m2.any():
            ys, xs = np.nonzero(m2)
            np.testing.assert_array_equal(
                summary[i, 6:10], [xs.min(), ys.min(), xs.max(), ys.max()]
            )


def test_pipeline_fullres_cleanup_smoke(rng):
    from tests.test_pipeline import tiny_config
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM

    model = CrowdSAM(tiny_config(**{"tpu.fullres_cleanup": "True"}))
    # spec tail is disabled in this mode (bucketed host pass does cleanup)
    assert model.engine_cfg.fullres_cleanup
    image = rng.integers(0, 255, (200, 256, 3), dtype=np.uint8)
    data = model.generate(image)
    assert {"boxes", "scores", "rles"} <= set(data.keys())

"""End-to-end sam_hq arch tests (tiny random-weight model, CPU).

The reference selects this arch via `model.sam_arch: sam_hq` and delegates
to the external (non-vendored) `segment_anything_hq` package, stripping the
'hq' prefix off `model.sam_model` (crowdsam/model.py:96-102).  Here the HQ
decoder is first-party (models/mask_decoder_hq.py, activation-parity-tested
in test_mask_decoder_hq.py); these tests cover the full pipeline wiring:
encoder interim feature -> hoisted HQ fusion -> EPS engine decode.
"""

import numpy as np
import pytest

from tests.test_pipeline import tiny_config
from crowdsam_tpu.models.mask_decoder_hq import MaskDecoderHQ
from crowdsam_tpu.pipeline.crowdsam import CrowdSAM


@pytest.fixture(scope="module")
def hq_model():
    return CrowdSAM(tiny_config(**{
        "model.sam_arch": "sam_hq",
        "model.sam_model": "hqvit_tiny",  # 'hq' prefix strip, model.py:99
    }))


def test_hq_arch_selected(hq_model):
    assert isinstance(hq_model.sam.mask_decoder, MaskDecoderHQ)
    assert hq_model.predictor.is_hq
    # vit_dim threads from the encoder so the compress_vit stack matches.
    assert hq_model.sam.mask_decoder.vit_dim == hq_model.sam.image_encoder.embed_dim


def test_hq_generate_contract(hq_model, rng):
    image = rng.integers(0, 255, (200, 256, 3), dtype=np.uint8)
    data = hq_model.generate(image)
    assert {"boxes", "scores", "rles"} <= set(data.keys())
    n = len(data["boxes"])
    if n > 0:
        assert data["boxes"].shape == (n, 4)
        assert len(data["rles"]) == n


def test_hq_predictor_decode(hq_model, rng):
    image = rng.integers(0, 255, (200, 256, 3), dtype=np.uint8)
    p = hq_model.predictor
    p.set_image(image)
    assert "hq_features" in p._cache and "dino_raw_256" in p._cache
    masks, iou, low_res, cls = p.predict(
        point_coords=np.asarray([[120.0, 100.0]]),
        point_labels=np.asarray([1]),
        multimask_output=True,
    )
    # HQ multimask output is the 3 SAM masks sliced [1:4]
    # (mask_decoder_hq.py:143-148).
    assert masks.shape[0] == 3 and iou.shape == (3,)
    assert cls.shape == (3, hq_model.n_class)
    # FG map path works through the HQ decoder's dino_proj/point_classifier.
    fg = p.predict_fg_map()
    assert fg.shape == (1, hq_model.n_class, 256, 256)


def test_hq_interm_feature_shape(hq_model, rng):
    """return_interm surfaces the first-global-block output."""
    import jax.numpy as jnp

    sam = hq_model.sam
    s = sam.img_size
    x = jnp.zeros((1, s, s, 3), jnp.float32)
    feats, interm = sam.image_encoder.apply(
        {"params": sam.params["image_encoder"]}, x, return_interm=True
    )
    g = s // sam.image_encoder.patch_size
    assert feats.shape == (1, g, g, 256)
    assert interm.shape == (1, g, g, sam.image_encoder.embed_dim)

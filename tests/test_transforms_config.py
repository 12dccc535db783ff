"""Resize transforms + config system."""

import numpy as np
import jax.numpy as jnp

from crowdsam_tpu.config import convert_value, load_config, modify_config
from crowdsam_tpu.ops.transforms import (
    ResizeLongestSide,
    apply_coords_jax,
    get_preprocess_shape,
    pad_to_square,
    resize_image,
    resize_image_shape,
)


def test_get_preprocess_shape():
    assert get_preprocess_shape(1500, 900, 1024) == (1024, 614)
    assert get_preprocess_shape(900, 1500, 1024) == (614, 1024)
    assert get_preprocess_shape(1024, 1024, 1024) == (1024, 1024)


def test_resize_image_shape_matches_reference_truncation():
    # reference crowdsam/utils.py:141-147 uses int() truncation, not round.
    nh, nw, r = resize_image_shape(900, 1500, 1024)
    assert (nh, nw) == (int(900 * 1024 / 1500), 1024)
    assert abs(r - 1024 / 1500) < 1e-9
    # Upscaling allowed.
    nh, nw, r = resize_image_shape(200, 300, 1024)
    assert nw == 1024 and r > 1


def test_resize_image_and_pad(rng):
    img = (rng.uniform(0, 255, (300, 500, 3))).astype(np.uint8)
    out, r = resize_image(img, 128)
    assert out.shape[:2] == (int(r * 300), 128)
    padded = pad_to_square(out, 128)
    assert padded.shape == (128, 128, 3)
    assert (padded[out.shape[0]:, :] == 0).all()


def test_apply_coords_consistency():
    t = ResizeLongestSide(1024)
    coords = np.array([[100.0, 200.0], [50.0, 75.0]])
    host = t.apply_coords(coords, (600, 800))
    dev = np.asarray(
        apply_coords_jax(jnp.asarray(coords), (jnp.float32(600), jnp.float32(800)), 1024)
    )
    np.testing.assert_allclose(host, dev, rtol=1e-5)


def test_apply_boxes():
    t = ResizeLongestSide(1024)
    boxes = np.array([[10.0, 20.0, 110.0, 220.0]])
    out = t.apply_boxes(boxes, (512, 512))
    np.testing.assert_allclose(out, boxes * 2.0)


def test_config_load_and_override(tmp_path):
    cfg = load_config(None)
    assert cfg["test"]["grid_size"] == 192
    cfg = modify_config(cfg, ["test.grid_size", "96", "model.trainfree", "true",
                              "test.pos_sim_thresh", "0.25"])
    assert cfg["test"]["grid_size"] == 96
    assert cfg["model"]["trainfree"] is True
    assert cfg["test"]["pos_sim_thresh"] == 0.25
    assert convert_value("hello") == "hello"

    y = tmp_path / "c.yaml"
    y.write_text("test:\n  max_prompts: 123\n")
    cfg2 = load_config(str(y))
    assert cfg2["test"]["max_prompts"] == 123
    assert cfg2["test"]["grid_size"] == 192  # defaults preserved

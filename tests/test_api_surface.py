"""Remaining public-API surface: Sam.forward-style batched API,
prototype FG map, CLI smoke tests via subprocess."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from crowdsam_tpu.models.build import sam_model_registry
from crowdsam_tpu.models.sam import forward_batched

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_sam():
    return sam_model_registry["vit_tiny"](n_class=1, dtype=jnp.float32)


def test_forward_batched(tiny_sam, rng):
    img1 = rng.integers(0, 255, (256, 192, 3), dtype=np.uint8)
    records = [
        {
            "image": img1,
            "original_size": (300, 225),
            "point_coords": np.array([[[96.0, 128.0]]], np.float32),
            "point_labels": np.array([[1]], np.int32),
        },
        {
            "image": img1,
            "original_size": (300, 225),
            "boxes": np.array([[10.0, 10.0, 100.0, 200.0]], np.float32),
        },
    ]
    outs = forward_batched(tiny_sam, records, multimask_output=True)
    assert len(outs) == 2
    assert outs[0]["masks"].shape == (1, 4, 300, 225)
    assert outs[0]["iou_predictions"].shape == (1, 4)
    assert outs[1]["low_res_logits"].shape[-2:] == (64, 64)


def test_predict_fg_with_prototypes(rng):
    from crowdsam_tpu.models.dinov2 import dino_model_registry
    from crowdsam_tpu.pipeline.predictor import SamPredictor
    from crowdsam_tpu.utils.init import fast_random_init

    sam = sam_model_registry["vit_tiny"](n_class=1, dtype=jnp.float32,
                                         dino_dim=384)
    dino = dino_model_registry["dinov2_vits14"](dtype=jnp.float32)
    dparams = fast_random_init(dino, jnp.zeros((1, 28, 28, 3)), seed=0)
    pred = SamPredictor(sam, dino, dparams)
    pred.set_image(rng.integers(0, 255, (200, 256, 3), dtype=np.uint8))
    protos = rng.normal(size=(5, 3, 384)).astype(np.float32)
    logits = pred.predict_fg_with_prototypes(protos)
    assert logits.shape == (1, 5, 256, 256)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_demo_cli_subprocess(tmp_path, rng):
    import cv2

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "a.jpg"),
                rng.integers(0, 255, (120, 160, 3), dtype=np.uint8))
    out = tmp_path / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "demo.py"),
         "-c", os.path.join(REPO, "configs", "crowdhuman.yaml"),
         "-i", str(img_dir), "-o", str(out),
         "model.sam_model", "vit_tiny", "model.dino_model", "dinov2_vits14",
         "model.sam_checkpoint", "", "model.dino_checkpoint", "",
         "model.sam_adapter_checkpoint", "",
         "test.max_size", "256", "test.grid_size", "32",
         "test.max_prompts", "16", "test.points_per_batch", "8",
         "test.pred_iou_thresh", "0.0", "test.stability_score_thresh", "0.0",
         "test.pos_sim_thresh", "0.3", "tpu.compute_dtype", "float32"],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    result = json.loads((out / "result.json").read_text())
    assert len(result) == 1 and "boxes" in result[0]


def test_crowdhuman2coco_cli(tmp_path, rng):
    import cv2

    (tmp_path / "Images").mkdir()
    cv2.imwrite(str(tmp_path / "Images" / "img0.jpg"),
                rng.integers(0, 255, (100, 150, 3), dtype=np.uint8))
    odgt = {
        "ID": "img0",
        "gtboxes": [
            {"tag": "person", "fbox": [5, 5, 40, 60], "vbox": [6, 6, 38, 58],
             "extra": {"ignore": 0}},
            {"tag": "mask", "fbox": [0, 0, 10, 10], "vbox": [0, 0, 10, 10],
             "extra": {"ignore": 1}},
        ],
    }
    (tmp_path / "val.odgt").write_text(json.dumps(odgt) + "\n")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "crowdhuman2coco.py"),
         "-d", str(tmp_path), "-o", "val.odgt", "-s", "val.json", "-v"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    coco = json.loads((tmp_path / "val.json").read_text())
    assert len(coco["images"]) == 1
    assert coco["images"][0]["height"] == 100
    assert len(coco["annotations"]) == 1  # only the 'person' tag
    assert coco["annotations"][0]["bbox"] == [6, 6, 38, 58]  # visible box


def test_compat_namespace_matches_reference_exports():
    """The reference's public import surface (segment_anything_cs/__init__.py:7-15)
    is reproduced name-for-name by the compat shim, so migrating users can
    keep their imports."""
    import crowdsam_tpu.segment_anything_cs as compat

    ref_exports = [
        "build_sam", "build_sam_vit_h", "build_sam_vit_l", "build_sam_vit_b",
        "sam_model_registry", "SamPredictor", "SamAutomaticMaskGenerator",
    ]
    for name in ref_exports:
        assert hasattr(compat, name), f"compat shim missing {name}"
    assert callable(compat.build_sam)
    assert set(compat.sam_model_registry) >= {"default", "vit_h", "vit_l", "vit_b"}


def test_demo_cli_zero_match_input_warns(tmp_path):
    """A nonexistent input path falls through to an empty glob (reference
    demo.py behaviour) — but our CLI logs a warning and still writes a
    valid empty result.json instead of silently producing nothing."""
    out = tmp_path / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "demo.py"),
         "-c", os.path.join(REPO, "configs", "crowdhuman.yaml"),
         "-i", str(tmp_path / "no_such_dir_or_glob"), "-o", str(out),
         "model.sam_model", "vit_tiny", "model.dino_model", "dinov2_vits14",
         "model.sam_checkpoint", "", "model.dino_checkpoint", "",
         "model.sam_adapter_checkpoint", "",
         "test.max_size", "256", "tpu.compute_dtype", "float32"],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads((out / "result.json").read_text()) == []
    logged = r.stderr + r.stdout + "".join(
        p.read_text() for p in (out / "log").glob("*") if p.is_file())
    assert "matched no files" in logged

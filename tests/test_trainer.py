"""Adapter trainer: losses, param partitioning, and a short training run on
the bundled 10-shot data with a tiny model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crowdsam_tpu.train.losses import adapter_loss, dice_loss, miou
from crowdsam_tpu.train.trainer import (
    AdapterTrainer,
    merge_params,
    split_adapter_params,
)


def test_dice_loss_perfect_and_disjoint():
    t = jnp.zeros((1, 1, 8, 8)).at[:, :, :4].set(1.0)
    logits_match = jnp.where(t > 0, 20.0, -20.0)
    l = dice_loss(logits_match, t)
    assert float(l[0, 0]) < 1e-3
    logits_opposite = -logits_match
    l2 = dice_loss(logits_opposite, t)
    assert float(l2[0, 0]) > 0.9


def test_miou():
    pred = jnp.full((1, 1, 4, 4), -1.0).at[0, 0, :2].set(1.0)  # top half
    target = jnp.zeros((1, 1, 4, 4)).at[0, 0, 1:3].set(1.0)    # middle half
    got = float(miou(pred, target)[0, 0])
    assert abs(got - 4 / 12) < 1e-6


def test_adapter_loss_shapes():
    p, k, r = 6, 4, 16
    rng = np.random.default_rng(0)
    losses = adapter_loss(
        jnp.asarray(rng.normal(size=(p, k, r, r)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(p, k)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, r, r)).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(3, r, r)) > 0.5),
        jnp.asarray((rng.uniform(size=(r, r)) > 0.5).astype(np.float32)),
        jnp.ones((r, r)),
        num_pos=3,
    )
    assert set(losses) == {"pos_cls_loss", "neg_cls_loss", "dice_loss"}
    for v in losses.values():
        assert np.isfinite(float(v))


def test_split_merge_roundtrip():
    tree = {
        "dino_proj": {"kernel": jnp.ones((4, 2))},
        "parallel_iou_head": {"layers_0": {"kernel": jnp.ones((2, 2))}},
        "point_classifier": {"layers_0": {"kernel": jnp.ones((2, 2))}},
        "transformer": {"layers_0": {"norm1": {"weight": jnp.ones((2,))}}},
        "iou_token": jnp.ones((1, 2)),
    }
    adapter, frozen = split_adapter_params(tree)
    assert set(adapter) == {"dino_proj", "parallel_iou_head", "point_classifier"}
    assert set(frozen) == {"transformer", "iou_token"}
    merged = merge_params(adapter, frozen)
    assert jax.tree_util.tree_structure(merged) == jax.tree_util.tree_structure(tree)


@pytest.mark.slow
def test_short_training_run_updates_only_adapter(ten_shot_root):
    from crowdsam_tpu.config import load_config, modify_config
    from crowdsam_tpu.models.build import sam_model_registry
    from crowdsam_tpu.models.dinov2 import dino_model_registry
    from crowdsam_tpu.pipeline.predictor import SamPredictor
    from crowdsam_tpu.train.dataset import CrowdHumanDataset
    from crowdsam_tpu.utils.init import fast_random_init

    cfg = modify_config(load_config(None), [
        "train.n_shot", "2", "train.steps", "6", "train.samples_per_batch", "4",
        "train.lr", "0.001",
    ])
    sam = sam_model_registry["vit_tiny"](n_class=1, dtype=jnp.float32,
                                         dino_dim=384)
    dino = dino_model_registry["dinov2_vits14"](dtype=jnp.float32)
    dino_params = fast_random_init(dino, jnp.zeros((1, 28, 28, 3)), seed=0)
    predictor = SamPredictor(sam, dino, dino_params)

    dataset = CrowdHumanDataset(
        ten_shot_root,
        ten_shot_root + "/train_crowdhuman_10shot.json",
    )
    before = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), sam.params["mask_decoder"]
    )
    trainer = AdapterTrainer(cfg, predictor)
    new_dec = trainer.train(dataset)

    from flax import traverse_util

    a_before, f_before = split_adapter_params(before)
    a_after, f_after = split_adapter_params(new_dec)
    # Frozen subtree unchanged
    fb = traverse_util.flatten_dict(f_before)
    fa = traverse_util.flatten_dict(f_after)
    assert set(fb) == set(fa)
    for k in fb:
        np.testing.assert_array_equal(np.asarray(fb[k]), np.asarray(fa[k]))
    # Adapter subtree changed
    diffs = [
        np.abs(np.asarray(vb) - np.asarray(va)).max()
        for vb, va in zip(
            jax.tree_util.tree_leaves(a_before), jax.tree_util.tree_leaves(a_after)
        )
    ]
    assert max(diffs) > 0


def test_adapter_loss_mask_term():
    p, k, r = 6, 4, 16
    rng = np.random.default_rng(0)
    args = (
        jnp.asarray(rng.normal(size=(p, k, r, r)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(p, k)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, r, r)).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(3, r, r)) > 0.5),
        jnp.asarray((rng.uniform(size=(r, r)) > 0.5).astype(np.float32)),
        jnp.ones((r, r)),
    )
    losses = adapter_loss(*args, num_pos=3, mask_loss=True)
    assert "mask_dice_loss" in losses and np.isfinite(
        float(losses["mask_dice_loss"]))
    # default (reference) loss set has no mask term
    assert "mask_dice_loss" not in adapter_loss(*args, num_pos=3)


def test_split_full_decoder():
    tree = {
        "dino_proj": {"kernel": jnp.ones((4, 2))},
        "transformer": {"layers_0": {"norm1": {"weight": jnp.ones((2,))}}},
    }
    adapter, frozen = split_adapter_params(tree, full=True)
    assert set(adapter) == {"dino_proj", "transformer"}
    assert frozen == {}


@pytest.mark.slow
def test_full_decoder_training_updates_mask_path(ten_shot_root):
    """train.full_decoder: the WHOLE decoder trains (TPU-repo extension,
    see trainer.py docstring), with box-rectangle targets and the mask
    dice term; the kernel-disable env flags are restored afterwards."""
    import os

    from crowdsam_tpu.config import load_config, modify_config
    from crowdsam_tpu.models.build import sam_model_registry
    from crowdsam_tpu.models.dinov2 import dino_model_registry
    from crowdsam_tpu.pipeline.predictor import SamPredictor
    from crowdsam_tpu.train.dataset import CrowdHumanDataset
    from crowdsam_tpu.utils.init import fast_random_init

    cfg = modify_config(load_config(None), [
        "train.n_shot", "2", "train.steps", "4",
        "train.samples_per_batch", "4",
        "train.lr", "0.001", "train.full_decoder", "True",
    ])
    sam = sam_model_registry["vit_tiny"](n_class=1, dtype=jnp.float32,
                                         dino_dim=384)
    dino = dino_model_registry["dinov2_vits14"](dtype=jnp.float32)
    dino_params = fast_random_init(dino, jnp.zeros((1, 28, 28, 3)), seed=0)
    predictor = SamPredictor(sam, dino, dino_params)
    dataset = CrowdHumanDataset(
        ten_shot_root, ten_shot_root + "/train_crowdhuman_10shot.json")

    before = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), sam.params["mask_decoder"])
    trainer = AdapterTrainer(cfg, predictor)
    assert trainer.full_decoder
    new_dec = trainer.train(dataset)

    # The (reference-)frozen mask path now updates too.
    _, f_before = split_adapter_params(before)
    from flax import traverse_util
    fb = traverse_util.flatten_dict(f_before)
    fa = {k: v for k, v in traverse_util.flatten_dict(new_dec).items()
          if k in fb}
    changed = any(
        np.abs(np.asarray(fb[k]) - np.asarray(fa[k])).max() > 0 for k in fb)
    assert changed
    # env restored (trace-time kernel gating must not leak to inference)
    assert not os.environ.get("CROWDSAM_DISABLE_MASK_HEAD_KERNEL")


def test_adapter_loss_neg_hinge_term():
    """The calibration hinge (TPU-repo extension, default off) must only
    appear when enabled, only see negative prompts, and be exactly
    w * relu(fused - margin)^2 summed over heads, mean over negatives."""
    p, k, r = 5, 4, 16
    rng = np.random.default_rng(1)
    args = (
        jnp.asarray(rng.normal(size=(p, k, r, r)).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(p, k)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, r, r)).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(2, r, r)) > 0.5),
        jnp.asarray((rng.uniform(size=(r, r)) > 0.5).astype(np.float32)),
        jnp.ones((r, r)),
    )
    base = adapter_loss(*args, num_pos=2)
    assert "neg_hinge_loss" not in base  # default off = reference loss set

    w, m = 4.0, 0.05
    got = adapter_loss(*args, num_pos=2, neg_hinge_weight=w,
                       neg_hinge_margin=m)
    fused = np.asarray(args[1])
    expect = w * (np.square(np.maximum(fused[2:] - m, 0.0)).sum(1)).mean()
    np.testing.assert_allclose(float(got["neg_hinge_loss"]), expect,
                               rtol=1e-6)
    # The reference terms are untouched by the extension.
    for key in ("pos_cls_loss", "neg_cls_loss", "dice_loss"):
        np.testing.assert_allclose(float(got[key]), float(base[key]),
                                   rtol=1e-7)


def test_training_with_calibration_levers(ten_shot_root):
    """hard_neg_frac + neg_hinge_weight (the r3 calibration recipe) must
    compile and train; the reference loss terms still appear alongside the
    hinge in the final step's loss dict."""
    from crowdsam_tpu.config import load_config, modify_config
    from crowdsam_tpu.models.build import sam_model_registry
    from crowdsam_tpu.models.dinov2 import dino_model_registry
    from crowdsam_tpu.pipeline.predictor import SamPredictor
    from crowdsam_tpu.train.dataset import CrowdHumanDataset
    from crowdsam_tpu.utils.init import fast_random_init

    cfg = modify_config(load_config(None), [
        "train.n_shot", "2", "train.steps", "3",
        "train.samples_per_batch", "4",
        "train.lr", "0.001", "train.full_decoder", "True",
        "train.hard_neg_frac", "0.5",
        "train.neg_hinge_weight", "4.0",
    ])
    sam = sam_model_registry["vit_tiny"](n_class=1, dtype=jnp.float32,
                                         dino_dim=384)
    dino = dino_model_registry["dinov2_vits14"](dtype=jnp.float32)
    dino_params = fast_random_init(dino, jnp.zeros((1, 28, 28, 3)), seed=0)
    predictor = SamPredictor(sam, dino, dino_params)
    dataset = CrowdHumanDataset(
        ten_shot_root, ten_shot_root + "/train_crowdhuman_10shot.json")

    trainer = AdapterTrainer(cfg, predictor)
    assert trainer.hard_neg_frac == 0.5 and trainer.neg_hinge_weight == 4.0
    losses = {}
    trainer.train(dataset, losses_out=losses)
    assert "neg_hinge_loss" in losses
    assert np.isfinite(losses["neg_hinge_loss"])

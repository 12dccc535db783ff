"""Mid-training checkpoint + resume (a capability the reference lacks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crowdsam_tpu.config import load_config, modify_config
from crowdsam_tpu.models.build import sam_model_registry
from crowdsam_tpu.models.dinov2 import dino_model_registry
from crowdsam_tpu.pipeline.predictor import SamPredictor
from crowdsam_tpu.train.dataset import CrowdHumanDataset
from crowdsam_tpu.train.trainer import AdapterTrainer
from crowdsam_tpu.utils.init import fast_random_init
from flax import traverse_util


def _make(seed=0):
    sam = sam_model_registry["vit_tiny"](n_class=1, dtype=jnp.float32,
                                         dino_dim=384, seed=seed)
    dino = dino_model_registry["dinov2_vits14"](dtype=jnp.float32)
    dino_params = fast_random_init(dino, jnp.zeros((1, 28, 28, 3)), seed=seed)
    return SamPredictor(sam, dino, dino_params)


@pytest.mark.slow
def test_checkpoint_resume_matches_uninterrupted(tmp_path, ten_shot_root):
    cfg = modify_config(load_config(None), [
        "train.n_shot", "1", "train.steps", "6",
        "train.samples_per_batch", "4", "train.lr", "0.001",
    ])
    dataset = CrowdHumanDataset(
        ten_shot_root,
        ten_shot_root + "/train_crowdhuman_10shot.json",
    )

    # Uninterrupted run.
    p1 = _make()
    t1 = AdapterTrainer(cfg, p1)
    dec_full = t1.train(dataset)

    # Interrupted run: checkpoint at step 3, then resume to completion.
    p2 = _make()
    cfg3 = modify_config(load_config(None), [
        "train.n_shot", "1", "train.steps", "3",
        "train.samples_per_batch", "4", "train.lr", "0.001",
    ])
    t2 = AdapterTrainer(cfg3, p2)
    t2.train(dataset, checkpoint_dir=str(tmp_path), checkpoint_every=3)

    p3 = _make()
    t3 = AdapterTrainer(cfg, p3)
    dec_resumed = t3.train(dataset, checkpoint_dir=str(tmp_path),
                           checkpoint_every=100)

    f1 = traverse_util.flatten_dict(dec_full)
    f2 = traverse_util.flatten_dict(dec_resumed)
    for k in f1:
        np.testing.assert_allclose(
            np.asarray(f1[k]), np.asarray(f2[k]), atol=1e-5, rtol=1e-4,
            err_msg="/".join(k),
        )

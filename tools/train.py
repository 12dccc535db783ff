"""10-shot adapter training CLI.

Behavioural contract: reference `tools/train.py:269-313` — same flags
(--config_file, --debug), same trainable-parameter set, saves the full
mask_decoder parameter tree to train.save_path (native msgpack instead of a
torch state dict; `load_adapter_checkpoint` reads both).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crowdsam_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()

import numpy as np

from crowdsam_tpu.config import load_config, modify_config
from crowdsam_tpu.utils.logging import setup_logger


def main():
    parser = argparse.ArgumentParser(description="CrowdSAM-TPU adapter training")
    parser.add_argument("--config_file", default="configs/crowdhuman.yaml")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("options", nargs=argparse.REMAINDER)
    args = parser.parse_args()
    config = load_config(args.config_file)
    config = modify_config(config, args.options)

    np.random.seed(config["train"]["seed"])
    logger = setup_logger(config["environ"].get("output_dir", ".") + "/log")

    import jax.numpy as jnp

    from crowdsam_tpu.models.build import sam_model_registry
    from crowdsam_tpu.models.dinov2 import dino_model_registry
    from crowdsam_tpu.pipeline.predictor import SamPredictor
    from crowdsam_tpu.train.dataset import CrowdHumanDataset
    from crowdsam_tpu.train.trainer import AdapterTrainer
    from crowdsam_tpu.utils.checkpoint import save_pytree
    from crowdsam_tpu.utils.init import fast_random_init

    mcfg = config["model"]
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        config.get("tpu", {}).get("compute_dtype", "bfloat16")
    ]
    dino_dims = {"dinov2_vitl14": 1024, "dinov2_vitb14": 768, "dinov2_vits14": 384}
    sam = sam_model_registry[mcfg["sam_model"]](
        checkpoint=None, n_class=mcfg.get("n_class", 1), dtype=dtype,
        dino_dim=dino_dims.get(mcfg.get("dino_model", "dinov2_vitl14"), 1024),
    )
    ckpt = mcfg.get("sam_checkpoint")
    if ckpt and os.path.exists(ckpt):
        from crowdsam_tpu.utils.checkpoint import load_sam_checkpoint, overlay

        sam.params = overlay(
            sam.params,
            load_sam_checkpoint(ckpt, encoder_depth=sam.image_encoder.depth,
                                n_class=mcfg.get("n_class", 1)),
        )
    else:
        logger.warning("SAM checkpoint missing; training over random init")

    dino_module = dino_model_registry[mcfg.get("dino_model", "dinov2_vitl14")](
        dtype=dtype
    )
    dino_ckpt = mcfg.get("dino_checkpoint")
    if dino_ckpt and os.path.exists(dino_ckpt):
        from crowdsam_tpu.utils.checkpoint import (
            convert_dinov2,
            load_torch_state_dict,
        )

        dino_params = convert_dinov2(
            load_torch_state_dict(dino_ckpt), depth=dino_module.depth
        )
    else:
        logger.warning("DINO checkpoint missing; random init")
        dino_params = fast_random_init(
            dino_module, jnp.zeros((1, 28, 28, 3), jnp.float32), seed=0
        )

    predictor = SamPredictor(sam, dino_module, dino_params)
    trainer = AdapterTrainer(config, predictor, logger)

    import jax
    from crowdsam_tpu.train.trainer import split_adapter_params

    n_params = sum(
        int(np.prod(v.shape))
        for v in jax.tree_util.tree_leaves(
            split_adapter_params(sam.params["mask_decoder"])[0]
        )
    )
    print("total learnable parameters:", n_params)

    dataset_root = config["data"]["dataset_root"]
    train_file = config["data"]["train_file"]
    if not os.path.exists(train_file):
        from crowdsam_tpu.utils.fixtures import ANNOT_NAME, ensure_ten_shot

        dataset_root = ensure_ten_shot(logger=logger)
        train_file = os.path.join(dataset_root, ANNOT_NAME)
    dataset = CrowdHumanDataset(dataset_root, train_file)
    new_dec = trainer.train(dataset)
    save_pytree(config["train"]["save_path"], new_dec)
    logger.info("done")


if __name__ == "__main__":
    main()

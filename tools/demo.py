"""Folder/file/glob inference demo CLI.

Behavioural contract: reference `tools/demo.py` — same flags (-c/-i/-o,
--mode), per-image visualization, result.json with
{image_file, boxes, scores, categories, rles}.
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crowdsam_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()

import numpy as np
from PIL import Image
from tqdm import tqdm

from crowdsam_tpu.config import load_config, modify_config
from crowdsam_tpu.utils.data import data_meta
from crowdsam_tpu.utils.logging import setup_logger
from crowdsam_tpu.utils.visualize import visualize_result


def environ_init():
    parser = argparse.ArgumentParser(description="CrowdSAM-TPU demo")
    parser.add_argument("--mode", type=str, choices=["seg", "bbox"], default="seg",
                        help="bbox only shows boxes; seg also shows masks")
    parser.add_argument("-c", "--config_file", type=str,
                        default="./configs/crowdhuman.yaml")
    parser.add_argument("-i", "--input", default=None,
                        help="directory, single image, or glob pattern "
                             "(default: data/crowdhuman_train/Images, "
                             "auto-generated synthetic fixtures if absent)")
    parser.add_argument("-o", "--output", type=str, default="demo_out")
    parser.add_argument("options", nargs=argparse.REMAINDER)
    args = parser.parse_args()
    configs = load_config(args.config_file)
    configs = modify_config(configs, args.options)
    os.makedirs(args.output, exist_ok=True)
    logger = setup_logger(args.output + "/log")
    if args.input is None:
        from crowdsam_tpu.utils.fixtures import ensure_ten_shot

        args.input = os.path.join(ensure_ten_shot(logger=logger), "Images")
    logger.info(str(args))
    return args, configs, logger


def main():
    args, config, logger = environ_init()
    n_class, class_names = data_meta[config["data"]["dataset"]][1:]

    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM

    model = CrowdSAM(config, logger)

    if os.path.isdir(args.input):
        image_files = [
            os.path.join(args.input, f) for f in sorted(os.listdir(args.input))
        ]
    elif os.path.exists(args.input):
        image_files = [args.input]
    else:
        image_files = glob.glob(os.path.expanduser(args.input))

    output_content = []
    if not image_files:
        logger.warning(
            f"input {args.input!r} matched no files (not a directory, "
            "existing file, or glob with matches)")
    logger.info(f"total images to process {len(image_files)}")
    for image_file in tqdm(image_files):
        image = Image.open(image_file)
        result = model.generate(image)
        instance_dict = {"image_file": image_file}
        instance_dict.update(
            {k: np.asarray(v).tolist() for k, v in result.items()
             if k in ["boxes", "scores", "categories"]}
        )
        instance_dict.update({k: v for k, v in result.items() if k in ["rles"]})
        output_content.append(instance_dict)
        image_name = os.path.basename(image_file).split(".")[0]
        visualize_result(
            image, result, class_names,
            os.path.join(args.output, f"{image_name}.jpg"),
            conf_thresh=config["vis"]["vis_thresh"], vis_masks=args.mode == "seg",
        )

    file_path = os.path.join(args.output, "result.json")
    print(f"dump json file to {file_path}")
    json.dump(output_content, open(file_path, "w"), ensure_ascii=True)


if __name__ == "__main__":
    main()

"""Sharded inference + optional visualization CLI.

Behavioural contract: reference `tools/test.py` — same flags
(--start_idx/--end_idx/--local_rank/--visualize/--save_path + dotted config
overrides), same per-image result dicts
({image_id, num_gt, boxes, scores, categories, rles}) and JSON output.
`--local_rank` selects a TPU device index instead of cuda:N.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crowdsam_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()

import numpy as np
from tqdm import tqdm

from crowdsam_tpu.config import load_config, modify_config
from crowdsam_tpu.utils.data import data_meta, evaluate_boxes, load_img_and_annotation
from crowdsam_tpu.utils.logging import setup_logger
from crowdsam_tpu.utils.visualize import visualize_result


def environ_init():
    parser = argparse.ArgumentParser(description="CrowdSAM-TPU argparser")
    parser.add_argument("--mode", type=str, choices=["seg", "bbox"], default="seg")
    parser.add_argument("--start_idx", type=int, default=0)
    parser.add_argument("--end_idx", type=int, default=-1)
    parser.add_argument("-c", "--config_file", type=str,
                        default="./configs/crowdhuman.yaml")
    parser.add_argument("-v", "--visualize", action="store_true")
    parser.add_argument("-s", "--save_path", type=str, default="")
    parser.add_argument("-r", "--local_rank", type=int, default=0)
    parser.add_argument("options", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    configs = load_config(args.config_file)
    configs = modify_config(configs, args.options)
    np.random.seed(configs["environ"]["seed"])
    os.makedirs(configs["environ"]["output_dir"], exist_ok=True)
    os.makedirs(configs["environ"]["output_dir"] + "/log", exist_ok=True)
    logger = setup_logger(configs["environ"]["output_dir"] + "/log")
    logger.info(str(args))
    return args, configs, logger


def main():
    args, config, logger = environ_init()
    dataset_path = config["data"]["dataset_root"]
    n_class, class_names = data_meta[config["data"]["dataset"]][1:]

    if args.local_rank:
        # Pin this process to one device of a multi-chip host.
        import jax

        devs = jax.devices()
        if args.local_rank < len(devs):
            jax.config.update("jax_default_device", devs[args.local_rank])

    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM

    model = CrowdSAM(config, logger)
    annot_path = config["data"]["json_file"]
    logger.info("load images and annotations..")
    annots = json.load(open(annot_path))
    end_idx = (
        len(annots["images"]) if args.end_idx == -1
        else min(args.end_idx, len(annots["images"]))
    )
    image_ids = list(range(args.start_idx, end_idx))

    output_content = []
    logger.info(f"total images to process {len(image_ids)}")

    def image_iter():
        for id_ in image_ids:
            yield load_img_and_annotation(
                dataset_path, annots, config["data"]["dataset"], id_
            )

    # Pipelined: image k+1's device chain overlaps image k's host tail.
    loaded = list(image_iter()) if len(image_ids) <= 64 else None
    if loaded is not None and model.crop_n_layers == 0 and not args.visualize:
        results = model.generate_many([im for im, _, _ in loaded])
        stream = zip(loaded, results)
    else:
        stream = (
            ((im, gt, iid), model.generate(im)) for im, gt, iid in image_iter()
        )

    for (image, gt_boxes, image_id), result in tqdm(stream, total=len(image_ids)):
        instance_dict = {"image_id": image_id, "num_gt": len(gt_boxes) - 1}
        instance_dict.update(
            {k: np.asarray(v).tolist() for k, v in result.items()
             if k in ["boxes", "scores", "categories"]}
        )
        instance_dict.update(
            {k: v for k, v in result.items() if k in ["rles"]}
        )
        output_content.append(instance_dict)
        if args.visualize:
            save_path = os.path.join(
                config["environ"]["output_dir"], f"{image_id}.jpg"
            )
            result["gt_boxes"] = gt_boxes
            FP_list, FN_list = evaluate_boxes(
                result["boxes"], result["scores"], gt_boxes, 0.5
            )[2:]
            visualize_result(
                image, result, class_names, save_path,
                conf_thresh=config["vis"]["vis_thresh"],
                FP_ind=FP_list, FN_ind=FN_list, vis_masks=args.mode == "seg",
            )

    if args.save_path == "":
        file_path = os.path.join(config["environ"]["output_dir"], "result.json")
        print(f"dump json file to {file_path}")
        json.dump(output_content, open(file_path, "w"), ensure_ascii=True)
    else:
        json.dump(output_content, open(args.save_path, "w"), ensure_ascii=True)


if __name__ == "__main__":
    main()

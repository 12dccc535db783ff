"""Multi-device evaluation launcher: shard -> run -> merge -> evaluate.

Behavioural contract: reference `tools/batch_eval.py` — contiguous image
shards per worker, temp_result_{rank}.json merge, convert_to_coco, then the
CrowdHuman evaluator; same flags (-n/-c + dotted overrides).

TPU-native notes: the reference pins one CUDA device per subprocess.  Here
`-n` subprocesses each pin one TPU device via --local_rank (multi-chip
hosts); with a single chip (or -n 1) the shards run inline in one process so
compiled programs are reused across shards.
"""

import argparse
import concurrent.futures
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crowdsam_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()

import yaml

from crowdsam_tpu.config import load_config, modify_config
from crowdsam_tpu.evallib.coco_convert import convert_to_coco
from crowdsam_tpu.evallib.crowdhuman import evaluate_predictions_on_crowdhuman


def run_script(start_idx, end_idx, rank, exec_file, config_file, options):
    cmd = [
        sys.executable, exec_file,
        "--config_file", config_file,
        "--save_path", f"temp_result_{rank}.json",
        "--start_idx", str(start_idx),
        "--end_idx", str(end_idx),
        "--local_rank", str(rank),
    ] + options
    print(f"Running command: {' '.join(cmd)}")
    subprocess.run(cmd)


def merge_json(json_files):
    merged = []
    for jf in json_files:
        with open(jf) as f:
            merged.extend(json.load(f))
    for jf in json_files:
        os.remove(jf)
    return merged


def main():
    parser = argparse.ArgumentParser(
        description="Run sharded evaluation over all available devices"
    )
    parser.add_argument("-n", "--num_nodes", type=int, default=8)
    parser.add_argument("-c", "--config_file", default="./configs/crowdhuman.yaml")
    parser.add_argument("--inline", action="store_true",
                        help="run shards in-process (single-chip hosts)")
    parser.add_argument("options", nargs=argparse.REMAINDER)
    args = parser.parse_args()
    config = load_config(args.config_file)
    config = modify_config(config, args.options)
    print(yaml.dump(config, default_flow_style=False, default_style=""))

    gt_js = json.load(open(config["data"]["json_file"]))
    num_imgs = len(gt_js["images"])
    num_nodes = args.num_nodes
    odgt_file = config["data"]["odgt_file"]
    exec_file = os.path.join(os.path.dirname(os.path.abspath(__file__)), "test.py")

    try:
        import jax

        n_devices = len(jax.devices())
    except Exception:
        n_devices = 1
    inline = args.inline or n_devices < 2

    if inline:
        # One process, whole range: compiled programs are shared, no device
        # contention on a single chip.
        run_script(0, num_imgs, 0, exec_file, args.config_file, args.options)
        json_list = ["temp_result_0.json"]
    else:
        num_nodes = min(num_nodes, n_devices)
        batch_size = num_imgs // num_nodes
        with concurrent.futures.ThreadPoolExecutor(max_workers=num_nodes) as ex:
            futures = []
            for i in range(num_nodes):
                start_idx = i * batch_size
                end_idx = num_imgs if i == num_nodes - 1 else (i + 1) * batch_size
                futures.append(
                    ex.submit(run_script, start_idx, end_idx, i, exec_file,
                              args.config_file, args.options)
                )
            concurrent.futures.wait(futures)
        json_list = [f"temp_result_{i}.json" for i in range(num_nodes)]

    merged_result = merge_json(json_list)
    coco_json = convert_to_coco(merged_result, gt_js)
    json.dump(coco_json, open("test.json", "w"), ensure_ascii=True)

    print("Evaluating..")
    results = evaluate_predictions_on_crowdhuman(
        odgt_file, "test.json", remove_empty_gt=True, visible_flag=True
    )
    for k, v in zip(["AP", "MR", "Recall", "tp", "fp"], results):
        print(f"{k}: {v}")
    os.remove("test.json")
    print("All processes done")


if __name__ == "__main__":
    main()

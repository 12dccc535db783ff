"""CrowdHuman evaluation CLI (AP / MR / Recall / tp / fp).

Behavioural contract: reference `tools/crowdhuman_eval.py:575-595` — same
flags (-d/-g/-o/-f/-v), same printed metric lines, same record.txt append.
Evaluation logic lives in `crowdsam_tpu.evallib.crowdhuman`.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crowdsam_tpu.evallib.crowdhuman import evaluate_predictions_on_crowdhuman


def main():
    parser = argparse.ArgumentParser(
        description="Evaluates predictions in CrowdHuman format "
        "(COCO json or odgt ground truth)."
    )
    parser.add_argument("-d", "--det_path", type=str)
    parser.add_argument("-g", "--gt_path", type=str, default="")
    parser.add_argument("-o", "--output_path", type=str, default="./record.txt")
    parser.add_argument("-f", "--remove_empty_gt", action="store_true")
    parser.add_argument("-v", "--visible_flag", action="store_true")
    parser.add_argument("-m", "--mode", type=int, default=0, choices=(0, 1, 2),
                        help="0: body boxes; 1: head boxes (hbox); 2: joint "
                             "body+head Caltech-union matching (extension "
                             "flag; the reference hardwires mode 0)")
    args = parser.parse_args()

    eval_results = evaluate_predictions_on_crowdhuman(
        args.gt_path, args.det_path, mode=args.mode,
        remove_empty_gt=args.remove_empty_gt, visible_flag=args.visible_flag,
    )
    metric_names = ["AP", "MR", "Recall", "tp", "fp"]
    for k, v in zip(metric_names, eval_results):
        print(f"{k}: {v}")
    with open(args.output_path, "a") as f:
        results = [f"{k}: {v:.4f}" for k, v in zip(metric_names, eval_results)]
        f.write(", ".join(results) + "\n")


if __name__ == "__main__":
    main()

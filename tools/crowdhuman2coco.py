"""odgt -> COCO json converter CLI.

Behavioural contract: reference `tools/crowdhuman2coco.py` (flags -d/-o/-s,
-v/--visible, -f/--full, --tag, --shuffle, --size)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crowdsam_tpu.evallib.coco_convert import crowdhuman2coco


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--data-path", default="dataset/crowdhuman")
    parser.add_argument("-o", "--odgt-path", default="annotation_val.odgt")
    parser.add_argument("-s", "--save-path", default="val.json")
    parser.add_argument("-v", "--visible", action="store_true",
                        help="use visible boxes")
    parser.add_argument("-f", "--full", default=1, type=int,
                        help="use full boxes")
    parser.add_argument("--tag", default="person", type=str,
                        help="'person', 'mask', or 'both'")
    parser.add_argument("--shuffle", action="store_true")
    parser.add_argument("--size", default=999999999, type=int)
    args = parser.parse_args()

    crowdhuman2coco(
        odgt_path=os.path.join(args.data_path, args.odgt_path),
        json_path=os.path.join(args.data_path, args.save_path),
        image_dir=os.path.join(args.data_path, "Images"),
        visible=args.visible,
        full=bool(args.full),
        tag=args.tag,
        shuffle=args.shuffle,
        max_images=args.size,
    )


if __name__ == "__main__":
    main()

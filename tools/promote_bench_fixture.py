"""Promote a machine-local trained bench fixture into the repo.

Copies the data/ decoder cache for a given recipe to adapter_weights/
(tracked in git) with a provenance sidecar, so fresh driver machines load
it instead of paying ~8 min of on-chip training (VERDICT r3 #5; the
reference likewise ships pretrained adapters, /root/reference/crowdsam/model.py:93).

    python tools/promote_bench_fixture.py [--steps 800] [--lr 2e-4] \
        [--recipe "tpu.rect_encode=True"]
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crowdsam_tpu.utils.bench_fixture import (  # noqa: E402
    cache_path_for, committed_path_for)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--recipe", type=str, default="")
    args = ap.parse_args()

    src = cache_path_for(args.steps, args.lr, args.recipe)
    dst = committed_path_for(args.steps, args.lr, args.recipe)
    if not os.path.exists(src):
        sys.exit(f"no local cache at {src} — run the bench (or the trainer) "
                 f"with this recipe first")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    shutil.copyfile(src, dst)
    with open(dst + ".json", "w") as f:
        json.dump({"steps": args.steps, "lr": args.lr,
                   "recipe": args.recipe, "source": src}, f, indent=1)
    print(f"promoted {src} ({os.path.getsize(src)//1024} KiB) -> {dst}")


if __name__ == "__main__":
    main()

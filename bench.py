"""Benchmark: CrowdHuman-style single-image annotation throughput on TPU.

Runs the full Crowd-SAM pipeline (fused SAM ViT-L + DINOv2 ViT-L/14 encode,
dense-prompt EPS decode engine, NMS + cleanup + RLE) at the reference's
default inference config (configs/crowdhuman.yaml: 1024 max size, grid 192,
max_prompts 500, points_per_batch 32) on a synthetic crowded 1024x683 image
with random weights (no pretrained checkpoints exist in this environment;
compute/shape behaviour is identical to real weights, and the foreground
threshold is tuned so the engine consumes the full 500-prompt budget — the
dense-decode worst case).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is value / 0.5 img/s — the assumed single-A100 throughput of
the reference implementation (the repo publishes no timing; ~2 s/image is
the observed order of magnitude for its 16 sequential 32-prompt decode
batches with per-batch host syncs plus full-size mask upsampling).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import jax

    # Persistent compilation cache: repeat bench runs skip the ~3-4 min
    # compile phase.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from crowdsam_tpu.config import load_config, modify_config
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM

    cfg = modify_config(load_config("configs/crowdhuman.yaml"), [
        "model.sam_checkpoint", "",
        "model.dino_checkpoint", "",
        "model.sam_adapter_checkpoint", "",
        # Random-weight FG logits are near-symmetric around 0; threshold 0.4
        # (vs 0.5) guarantees a dense candidate field -> full prompt budget.
        "test.pos_sim_thresh", "0.4",
        "test.pred_iou_thresh", "0.0",
        "test.stability_score_thresh", "0.0",
    ])

    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (683, 1024, 3), dtype=np.uint8)

    model = CrowdSAM(cfg)

    batch = int(os.environ.get("BENCH_BATCH", "0"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    if batch > 1:
        # Batched/sharded throughput mode (images amortize dispatch +
        # tunnel-round-trip overhead; the multi-chip eval path).
        from crowdsam_tpu.parallel.eval_shard import ShardedPipeline

        pipe = ShardedPipeline(model, mesh=None, batch=batch)
        t0 = time.time()
        results = pipe.generate_batch([image] * batch)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            results = pipe.generate_batch([image] * batch)
        dt = (time.time() - t0) / (iters * batch)
        result = results[0]
    else:
        # Warmup / compile.
        t0 = time.time()
        result = model.generate(image)
        compile_s = time.time() - t0

        # Steady state: pipelined multi-image path (host tail of image k
        # overlaps device compute of image k+1).
        t0 = time.time()
        results = model.generate_many([image] * iters)
        dt = (time.time() - t0) / iters
        result = results[-1]

    n_det = len(result["boxes"])
    value = 1.0 / dt
    out = {
        "metric": "CrowdHuman val images/sec/chip (dense-prompt decode)",
        "value": round(value, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / 0.5, 3),
    }
    print(json.dumps(out))
    print(
        f"# compile {compile_s:.1f}s, steady {dt*1000:.0f} ms/img, "
        f"{n_det} detections, backend={jax.default_backend()}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

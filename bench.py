"""Benchmark: CrowdHuman-style single-image annotation throughput on TPU.

Runs the full Crowd-SAM pipeline (fused SAM ViT-L + DINOv2 ViT-L/14 encode,
dense-prompt EPS decode engine, NMS + cleanup + RLE + COCO strings) at the
reference's UNMODIFIED inference config (configs/crowdhuman.yaml: 1024 max
size, grid 192, max_prompts 500, points_per_batch 32, box_nms 0.65,
pred_iou 0.1, stability 0.8).

No pretrained checkpoints exist in this environment, and random weights
are degenerate for perf purposes (near-identical or near-point masks).
Rounds 1-2 worked around that with weight-amplification recipes and a
threshold tuner; the r2 VERDICT showed that operating point is fragile.
Round 3 instead TRAINS the model into a realistic operating point
(utils/bench_fixture.py): `train.full_decoder` on the synthetic 10-shot
fixture set (annotation statistics matched to the reference's bundled real
set) teaches genuine prompt-conditioned person segmentation, so detections
have person-sized boxes and meaningful fused-IoU scores at the reference
thresholds — no weight surgery, no threshold tuning.  The default recipe
(BENCH_TRAIN_RECIPE: hard_neg_frac 0.5 + neg_hinge_weight 16, chosen by
the r4 on-chip calibration sweep, PERF.md "Round 4 calibration") lands
the crowded scene at a CrowdHuman-like ~23-30 detections (reference
output load ~20-30/img) and the background scene near zero.  The
UNCALIBRATED levers-off fixture (~90-106 detections, a ~4x heavier tail
than the reference ever runs) is reported alongside as the `stress`
entry.  Fixture weights ship committed under adapter_weights/
(train-on-miss is the fallback, ~8 min on chip; machine-local cache
under data/).  The encode is the reference-exact SQUARE mode; the rect
band-encode is opt-in via BENCH_RECT=1 (demoted from default in r4 —
its cross-AP bound failed under the trained fixture, PARITY.md #9).

Two scenes, one model:
- crowded: 22-30 drawn persons (fixture statistics) -> ~100 NMS survivors;
  loads the detection-count-scaled tail (bucketed survivor pass, per-mask
  full-res RLE, host COCO strings) the way CrowdHuman val does;
- sparse: the same background with no people -> few detections; measures
  the encode + engine floor.

Every survivor bucket is prewarmed before the timed loops, the headline is
the MEDIAN over BENCH_ITERS (default 10), and the JSON carries
per-iteration times, keep counts, tail paths, and per-stage probes so a
bad driver run is diagnosable from the artifact alone (VERDICT r2).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
`vs_baseline` is crowded img/s / 0.5 img/s — the assumed single-A100
throughput of the reference implementation on crowded CrowdHuman images
(the repo publishes no timing; ~2 s/image is the observed order of
magnitude for its 16 sequential 32-prompt decode batches with per-batch
host syncs plus full-size mask upsampling, reference crowdsam/model.py:192-306,394-443).
"""

import json
import os
import sys
import time

import numpy as np


def stage_probe(model, image):
    """Coarse per-stage attribution (single samples, force_sync-bounded;
    ±tunnel variance — diagnostics, not optimization-grade numbers)."""
    from crowdsam_tpu.utils.profiling import force_sync

    crop_box = [0, 0, image.shape[1], image.shape[0]]
    t0 = time.time()
    model.crop_image(image, crop_box)
    model.predictor.set_image_presized(model.image)
    force_sync(model.predictor.get_image_embedding())
    encode_ms = (time.time() - t0) * 1000

    t0 = time.time()
    res, meta = model._dispatch_crop(image, crop_box)
    force_sync(res["summary"])
    dispatch_ms = (time.time() - t0) * 1000  # encode + engine (re-encoded)

    t0 = time.time()
    model._finalize_crop(res, meta)
    finalize_ms = (time.time() - t0) * 1000  # host tail incl. survivor

    return {"encode_ms": round(encode_ms, 1),
            "dispatch_ms": round(dispatch_ms, 1),
            "finalize_ms": round(finalize_ms, 1)}


def _score_entry(results, gt_boxes, hw) -> dict:
    """Detection-quality gate (VERDICT r4 #2): every timed iteration's
    detections scored against the scene's synthetic GT with the
    first-party CrowdHuman evaluator — the reference's only validation
    loop (/root/reference/tools/batch_eval.py:100-102).  Each iteration is
    its own image id, so a filter bug that silently dropped masks would
    move ap/recall for the whole run and be distinguishable from a
    workload change.  Never fatal: returns an error dict instead."""
    import json as _json
    import tempfile

    try:
        from crowdsam_tpu.evallib.crowdhuman import (
            evaluate_predictions_on_crowdhuman)

        h, w = hw
        images = [{"id": t, "file_name": f"i{t}.jpg",
                   "height": h, "width": w} for t in range(len(results))]
        gts, dts = [], []
        for t, r in enumerate(results):
            for (x, y, bw, bh) in gt_boxes:
                gts.append({"id": len(gts) + 1, "image_id": t,
                            "bbox": [float(x), float(y),
                                     float(bw), float(bh)],
                            "category_id": 1})
            for b, s in zip(np.asarray(r["boxes"], np.float64),
                            np.asarray(r["scores"], np.float64)):
                dts.append({"id": len(dts) + 1, "image_id": t,
                            "bbox": [float(b[0]), float(b[1]),
                                     max(float(b[2] - b[0]), 1.0),
                                     max(float(b[3] - b[1]), 1.0)],
                            "score": float(s), "category_id": 1})
        cats = [{"id": 1, "name": "person"}]
        with tempfile.TemporaryDirectory() as td:
            gt_path = os.path.join(td, "gt.json")
            dt_path = os.path.join(td, "dt.json")
            _json.dump({"images": images, "annotations": gts,
                        "categories": cats}, open(gt_path, "w"))
            _json.dump({"images": images, "annotations": dts,
                        "categories": cats}, open(dt_path, "w"))
            ap, mr, recall, _, _ = evaluate_predictions_on_crowdhuman(
                gt_path, dt_path)
        return {"ap": round(ap, 4), "recall": round(recall, 4),
                "n_gt": len(gt_boxes)}
    except Exception as e:  # diagnosable, never fatal
        return {"error": repr(e)[:200]}


GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "adapter_weights", "bench_golden_detections.json")
_GOLDEN_KEY_SEED = 20260820  # pinned PRNG for the golden generate


def _cross_ap_sets(hw, det_a, det_b) -> float:
    """Symmetric cross-AP of two detection sets on one image (min of both
    directions), via the first-party evaluator — same scoring as the
    deviation probes (tools/probe_deviations_trained.py)."""
    import json as _json
    import tempfile

    from crowdsam_tpu.evallib.crowdhuman import (
        evaluate_predictions_on_crowdhuman)

    h, w = hw
    images = [{"id": 0, "file_name": "i0.jpg", "height": h, "width": w}]

    def annots(det, with_scores):
        out = []
        for i, (b, s) in enumerate(zip(det["boxes"], det["scores"])):
            a = {"id": i + 1, "image_id": 0,
                 "bbox": [float(b[0]), float(b[1]),
                          max(float(b[2] - b[0]), 1.0),
                          max(float(b[3] - b[1]), 1.0)],
                 "category_id": 1}
            if with_scores:
                a["score"] = float(s)
            out.append(a)
        return out

    aps = []
    with tempfile.TemporaryDirectory() as td:
        for gt, dt in ((det_a, det_b), (det_b, det_a)):
            gt_path = os.path.join(td, "g.json")
            dt_path = os.path.join(td, "d.json")
            _json.dump({"images": images, "annotations": annots(gt, False),
                        "categories": [{"id": 1, "name": "person"}]},
                       open(gt_path, "w"))
            _json.dump({"images": images, "annotations": annots(dt, True),
                        "categories": [{"id": 1, "name": "person"}]},
                       open(dt_path, "w"))
            ap, _, _, _, _ = evaluate_predictions_on_crowdhuman(
                gt_path, dt_path)
            aps.append(ap)
    return min(aps)


def _golden_gate(model, scenes, fixture_meta, rect) -> dict:
    """Golden-detections regression gate: a dedicated generate per regime
    under a PINNED PRNG key is scored (symmetric cross-AP) against the
    committed snapshot in adapter_weights/bench_golden_detections.json.
    The scene-GT ap/recall in `quality` is a weak signal (random-weight
    fixture detections barely align with synthetic GT persons); cross-AP
    against the blessed snapshot collapses on any filter/geometry
    regression while tolerating boundary-pixel numerics drift.  When the
    snapshot is missing or keyed to a different fixture, the candidate is
    written alongside for blessing (commit it to enable the gate).
    BENCH_GOLDEN=0 to skip.  Never fatal."""
    if os.environ.get("BENCH_GOLDEN", "1") == "0":
        return {"skipped": "BENCH_GOLDEN=0"}
    try:
        import jax

        identity = {"fixture": {k: v for k, v in sorted(fixture_meta.items())
                                if k.startswith("trained_")
                                and k != "trained_cache"},
                    "rect": bool(rect),
                    "golden_seed": _GOLDEN_KEY_SEED}
        current = {"identity": identity, "regimes": {}}
        for name, img in scenes.items():
            saved = model._key
            try:
                model._key = jax.random.PRNGKey(_GOLDEN_KEY_SEED)
                d = model.generate(img)
            finally:
                model._key = saved
            current["regimes"][name] = {
                "hw": [int(img.shape[0]), int(img.shape[1])],
                "boxes": np.asarray(d["boxes"], np.float64).round(2).tolist(),
                "scores": np.asarray(
                    d["scores"], np.float64).round(4).tolist(),
            }
        if not os.path.exists(GOLDEN_PATH):
            cand = GOLDEN_PATH + ".candidate"
            json.dump(current, open(cand, "w"))
            return {"skipped": f"no golden snapshot; candidate at {cand}"}
        golden = json.load(open(GOLDEN_PATH))
        if golden.get("identity") != identity:
            cand = GOLDEN_PATH + ".candidate"
            json.dump(current, open(cand, "w"))
            return {"skipped": "golden identity mismatch",
                    "golden_identity": golden.get("identity"),
                    "run_identity": identity}
        out = {}
        for name, det in current["regimes"].items():
            ref = golden["regimes"].get(name)
            if ref is None:
                out[name] = {"skipped": "regime not in golden"}
                continue
            xap = _cross_ap_sets(det["hw"], ref, det)
            # Identical sets do NOT score AP 1.0: trapezoid PR integration
            # gives (n-1)/n for n perfect matches (the deviation probe's
            # 0.9846 "ceiling" is exactly 64/65).  Normalize by the golden
            # set's own self-AP ceiling before judging.
            ceiling = _cross_ap_sets(det["hw"], ref, ref)
            entry = {"cross_ap": round(xap, 4), "ceiling": round(ceiling, 4),
                     "n": len(det["boxes"]), "n_golden": len(ref["boxes"])}
            if ceiling < 0.5:  # < ~2 golden boxes: no usable AP signal
                entry["skipped"] = "golden set too small for an AP gate"
            else:
                entry["ok"] = bool(xap >= 0.90 * ceiling)
            out[name] = entry
        return out
    except Exception as e:  # diagnosable, never fatal
        return {"error": repr(e)[:200]}


def _stats(times_s):
    ms = [t * 1000 for t in times_s]
    return {
        "median_ms": round(float(np.median(ms)), 1),
        "mean_ms": round(float(np.mean(ms)), 1),
        "min_ms": round(float(np.min(ms)), 1),
        "iters_ms": [round(t, 1) for t in ms],
    }


def _timed_regime(model, image, iters, lead=2):
    """Steady-state generate_many over `iters` copies of `image` with tail
    diagnostics collected.  The first `lead` per-image deltas are excluded
    from the stats (the pipeline's first delta structurally contains
    lookahead+1 dispatches plus any first-touch host work) but recorded in
    the JSON as lead_ms; wall_ms_per_img still covers the WHOLE run."""
    model.tail_stats = []
    times = []
    t0 = time.time()
    results = model.generate_many([image] * (iters + lead), times_out=times)
    wall = (time.time() - t0) / (iters + lead)
    stats = _stats(times[lead:])
    stats["lead_ms"] = [round(t * 1000, 1) for t in times[:lead]]
    # Floor at 1 us so the headline 1000/wall division is always defined
    # (sub-ms walls only occur with stubbed models in the harness tests).
    stats["wall_ms_per_img"] = max(round(wall * 1000, 1), 1e-3)
    diag = {
        "keep_counts": [t["n"] for t in model.tail_stats],
        "tail_paths": [t["path"] for t in model.tail_stats],
    }
    model.tail_stats = None
    return results, stats, diag


def _batched_supplement(model, image, batch: int, iters: int = 3) -> dict:
    """Batched-throughput sample via ShardedPipeline (single device, data
    axis 1): ms/img over `iters` dispatches of `batch` copies.  Returns a
    diagnosable error dict instead of raising."""
    try:
        from crowdsam_tpu.parallel.eval_shard import ShardedPipeline

        pipe = ShardedPipeline(model, mesh=None, batch=batch)
        pipe.generate_batch([image] * batch)  # compile + warm
        t0 = time.time()
        for _ in range(iters):
            bres = pipe.generate_batch([image] * batch)
        per = (time.time() - t0) / (iters * batch) * 1000
        return {
            "batch": batch, "ms_per_img": round(per, 1),
            "img_s": round(1000.0 / per, 3),
            "detections": len(bres[0]["boxes"]),
        }
    except Exception as e:  # diagnosable, never fatal
        return {"error": repr(e)[:200]}


def _stress_regime(model, image, gt_boxes, progress, iters: int = 30) -> dict:
    """Stress entry (VERDICT r3 #4): the UNCALIBRATED levers-off fixture
    (~90-106 detections on the same crowded scene — a ~4x heavier survivor
    tail than the reference's CrowdHuman output load) timed alongside the
    calibrated headline.  Loads committed/cached weights only — NEVER
    trains at bench time — and restores the calibrated decoder afterwards.
    BENCH_STRESS=0 to skip."""
    if os.environ.get("BENCH_STRESS", "1") == "0":
        return {"skipped": "BENCH_STRESS=0"}
    try:
        from crowdsam_tpu.utils.bench_fixture import (
            cache_path_for, committed_path_for, train_or_load_decoder)

        key = "tpu.rect_encode=True" if getattr(
            model.predictor, "rect_encode", False) else ""
        paths = (committed_path_for(800, 2e-4, key),
                 cache_path_for(800, 2e-4, key))
        if not any(os.path.exists(p) for p in paths):
            return {"skipped": f"no levers-off fixture at {paths[0]}"}
        progress["stage"] = "stress_timed"
        saved = model.sam.params["mask_decoder"]
        try:
            meta = train_or_load_decoder(model, steps=800, lr=2e-4,
                                         recipe="")
            # Warmup under the swapped decoder (the calibrated regimes get
            # theirs in warmup_compile): first-touch of the big survivor
            # buckets' real execution path, ~2 s otherwise paid by the lead
            # iteration (r5 artifact: stress lead 2087 ms vs 303 ms median).
            model.generate(image)
            results, stats, diag = _timed_regime(model, image, iters)
            return {**stats, **diag,
                    "img_s": round(1000.0 / stats["median_ms"], 4),
                    "quality": _score_entry(results, gt_boxes,
                                            image.shape[:2]),
                    "fixture": meta}
        finally:
            model.sam.params["mask_decoder"] = saved
    except Exception as e:  # diagnosable, never fatal
        return {"error": repr(e)[:300]}


def _probe_backend_once(timeout_s: int = 120) -> bool:
    """True if the TPU backend initializes in a subprocess within
    `timeout_s`.  The axon tunnel can go down for hours (observed r3:
    `jax.devices()` hanging indefinitely); probing out-of-process lets the
    bench emit a diagnosable artifact instead of hanging the driver."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.default_backend() == 'tpu'"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _wait_backend() -> float:
    """Probe the backend repeatedly for up to BENCH_BACKEND_WAIT_S seconds
    (default 900) so a short tunnel outage at bench time doesn't cost the
    round its measurement.  Returns seconds waited, or -1.0 if the backend
    never came up."""
    deadline = time.time() + float(
        os.environ.get("BENCH_BACKEND_WAIT_S", "900"))
    t0 = time.time()
    while True:
        if _probe_backend_once():
            return time.time() - t0
        if time.time() >= deadline:
            return -1.0
        print(f"# TPU backend unreachable, retrying "
              f"({time.time() - t0:.0f}s waited)", file=sys.stderr)
        time.sleep(30)


def _build_model(rect: bool):
    from crowdsam_tpu.config import load_config, modify_config
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM

    cfg = modify_config(load_config("configs/crowdhuman.yaml"), [
        "model.sam_checkpoint", "",
        "model.dino_checkpoint", "",
        "model.sam_adapter_checkpoint", "",
        "tpu.rect_encode", str(rect),
    ])
    return CrowdSAM(cfg)


def _canary(iters: int = 5, model=None, pristine_decoder=None) -> dict:
    """Fixed-workload perf canary (VERDICT r3 #6): FROZEN forever so code
    regressions are separable from bench-workload redefinitions.

    Spec (do not change): square encode, unit-init random weights (no
    trained fixture), sparse_scene(7) at 683x1024, and the timed quantity
    is dispatch-to-summary-sync (upload + fused encode + EPS engine) —
    detection-count independent, so it cannot drift when the fixture or
    calibration changes.  Comparable to the r1 encode+engine budget
    (~301 ms minus ~20-40 ms host tail; the r3 init fix changed
    random-weight DETECTIONS but not this dispatch path's cost).

    When the headline model ran SQUARE (the default), it is reused with
    its pre-fixture decoder swapped back in (VERDICT r4 #5): the canary
    spec fixes the weights' construction — seed-42 unit random init,
    identical to a fresh build — the workload, and the timed quantity,
    and the dispatch programs are weight-independent, so reuse changes
    nothing but the ~3 min a second model build + trace cost.  A rect
    headline still builds the square model fresh."""
    from crowdsam_tpu.utils.profiling import force_sync

    reused = (model is not None and pristine_decoder is not None
              and not getattr(model.predictor, "rect_encode", False))
    if not reused:
        model = _build_model(rect=False)
    from crowdsam_tpu.utils.bench_fixture import sparse_scene

    img = sparse_scene(7)
    crop_box = [0, 0, img.shape[1], img.shape[0]]
    saved = model.sam.params["mask_decoder"] if reused else None
    if reused:
        model.sam.params["mask_decoder"] = pristine_decoder
    try:
        res, _ = model._dispatch_crop(img, crop_box)   # compile + warm
        force_sync(res["summary"])
        times = []
        for _ in range(iters):
            t0 = time.time()
            res, _ = model._dispatch_crop(img, crop_box)
            force_sync(res["summary"])
            times.append(time.time() - t0)
    finally:
        if reused:
            model.sam.params["mask_decoder"] = saved
    return {"dispatch_median_ms": round(float(np.median(times)) * 1000, 1),
            "dispatch_iters_ms": [round(t * 1000, 1) for t in times],
            "model": "reused-headline" if reused else "fresh-build",
            "spec": "square/random-unit-init/sparse7/dispatch+summary-sync"}


def run_measurement(rect: bool, progress: dict) -> dict:
    """The full measurement at one encode mode.  Fills `progress` with a
    stage marker + partial results as it goes, so a crash at any point
    still yields a diagnosable artifact (VERDICT r3 weak #3)."""
    import jax

    progress["stage"] = "build_model"
    progress["rect_encode"] = rect
    t0 = time.time()
    model = _build_model(rect)
    # Attribution for the r5 static-key fix: build once hauled the whole
    # param tree device->host through repr() (models/sam.py).
    progress["build_s"] = round(time.time() - t0, 1)
    # Seed-42 unit random init, captured before the fixture overwrite: the
    # canary reuses this model+decoder instead of a second full build.
    pristine_decoder = model.sam.params["mask_decoder"]

    progress["stage"] = "fixture_train"
    t0 = time.time()
    recipe = os.environ.get(
        "BENCH_TRAIN_RECIPE",
        "train.hard_neg_frac=0.5,train.neg_hinge_weight=16")
    if rect:
        # Folded into the recipe so the fixture cache is keyed by the
        # encode mode (rect-trained decoder weights differ slightly from
        # square-trained ones); as a config pair it is a no-op re-set.
        recipe = (recipe + "," if recipe else "") + "tpu.rect_encode=True"
    from crowdsam_tpu.utils.bench_fixture import (
        crowd_scene, mid_scene, train_or_load_decoder)

    fixture_meta = train_or_load_decoder(
        model,
        steps=int(os.environ.get("BENCH_TRAIN_STEPS", "800")),
        lr=float(os.environ.get("BENCH_TRAIN_LR", "2e-4")),
        recipe=recipe)
    train_s = time.time() - t0
    progress["fixture"] = {**fixture_meta, "train_s": round(train_s, 1)}
    print(f"# trained fixture: {fixture_meta} ({train_s:.0f}s)",
          file=sys.stderr)

    crowd_img, gt_boxes = crowd_scene(0)
    # 'sparse' measures a mid-density load since r5 (VERDICT r4 #9): the
    # background-only scene yielded ~2 detections — the encode floor twice.
    # The canary still runs the frozen background-only sparse_scene(7).
    sparse_img, sparse_gt = mid_scene(7)

    # 60 timed iterations: the pipelined generate_many's fill cost is a
    # fixed ~120 ms (lookahead dispatches before the first harvest), so the
    # wall-per-image converges to the steady state as 1/N -- at N=10 the
    # fill alone inflated the wall ~6% over the median (188 vs 179 ms, r5).
    # The timed loop is seconds of device time either way; the bench's
    # minutes go to compile/prewarm/fixture/canary stages.
    iters = int(os.environ.get("BENCH_ITERS", "60"))
    batch = int(os.environ.get("BENCH_BATCH", "0"))
    extra = {}
    if batch > 1:
        # Batched/sharded throughput mode (images amortize dispatch +
        # tunnel-round-trip overhead; the multi-chip eval path).
        from crowdsam_tpu.parallel.eval_shard import ShardedPipeline

        progress["stage"] = "batched_compile"
        pipe = ShardedPipeline(model, mesh=None, batch=batch)
        t0 = time.time()
        pipe.generate_batch([crowd_img] * batch)
        compile_s = time.time() - t0
        progress["stage"] = "batched_timed"
        t0 = time.time()
        for _ in range(iters):
            results = pipe.generate_batch([crowd_img] * batch)
        total = time.time() - t0
        per_img = total / (iters * batch) * 1000
        crowd = {"median_ms": round(per_img, 1), "mean_ms": round(per_img, 1),
                 "min_ms": None, "iters_ms": [],
                 "wall_ms_per_img": round(per_img, 1)}
        cdiag = {"keep_counts": [], "tail_paths": []}
        cresult = results[0]
        sparse = dict(crowd)  # batch mode times the crowded scene only
        sresult, sdiag = cresult, cdiag
        extra["batch"] = batch
        quality = {"crowded": _score_entry(results, gt_boxes,
                                           crowd_img.shape[:2]),
                   "sparse": {"skipped": "batch mode"}}
    else:
        # Warmup / compile: prewarm_pipeline traces+compiles the encode,
        # fg/sim, engine, and every survivor bucket CONCURRENTLY (the work
        # is GIL-releasing host trace/lower; overlapping cut the warm-cache
        # compile phase ~360 s -> target <~120 s, PERF.md "Round 4 compile
        # budget"), then the warmup generates run against warm programs —
        # the steady-state loop can never hit a fresh XLA compile (VERDICT
        # r2: the 1864 ms/img driver capture was in-loop bucket compiles).
        progress["stage"] = "warmup_compile"
        t0 = time.time()
        model.prewarm_pipeline(crowd_img)
        model.generate(crowd_img)
        model.generate(sparse_img)
        compile_s = time.time() - t0
        progress["compile_s"] = round(compile_s, 1)

        progress["stage"] = "crowded_timed"
        cresults, crowd, cdiag = _timed_regime(model, crowd_img, iters)
        cresult = cresults[-1]
        progress["crowded"] = crowd
        progress["crowded_diag"] = cdiag
        progress["stage"] = "sparse_timed"
        sresults, sparse, sdiag = _timed_regime(model, sparse_img, iters)
        sresult = sresults[-1]
        progress["sparse"] = sparse

        # Detection-quality gate over every timed iteration (VERDICT r4 #2).
        progress["stage"] = "quality_gate"
        quality = {
            "crowded": _score_entry(cresults, gt_boxes, crowd_img.shape[:2]),
            "sparse": _score_entry(sresults, sparse_gt, sparse_img.shape[:2]),
            # The per-regime AP/recall above score random-backbone detections
            # against synthetic scene GT — a workload sanity check, NOT a
            # regression signal (absolute values are meaningless without
            # pretrained weights).  `golden` is the regression gate.
            "note": "per-regime ap/recall = weak workload sanity signal; "
                    "golden = the regression gate",
        }
        quality["golden"] = _golden_gate(
            model, {"crowded": crowd_img, "sparse": sparse_img},
            fixture_meta, rect)
        progress["quality"] = quality

        # Uncalibrated heavy-tail stress point, reported alongside.
        extra["stress"] = _stress_regime(model, crowd_img, gt_boxes, progress)
        progress["stress"] = extra["stress"]

        # Supplementary batched-throughput sample (tools/batch_eval.py's
        # inline mode): B images per dispatch amortize the per-image relay
        # round trips a production TPU deployment wouldn't pay.  Headline
        # stays the single-image number; a failure here never voids the
        # artifact.  BENCH_BATCH_SUPP=0 to skip.
        progress["stage"] = "batched_supplement"
        supp = int(os.environ.get("BENCH_BATCH_SUPP", "4"))
        if supp > 1:
            extra["batched_supp"] = _batched_supplement(model, crowd_img, supp)

    cn_det = len(cresult["boxes"])
    sn_det = len(sresult["boxes"])
    cvalue = 1000.0 / crowd["median_ms"]
    svalue = 1000.0 / sparse["median_ms"]
    # Headline = WALL-clock throughput (VERDICT r4 #3): the whole timed
    # run including pipeline fill divided by images — the honest
    # steady-state number (the median excludes the two lead iterations).
    cwall = 1000.0 / crowd["wall_ms_per_img"]
    swall = 1000.0 / sparse["wall_ms_per_img"]

    # Per-stage attribution probes (post-timing: they re-run the chain).
    progress["stage"] = "stage_probes"
    stages = {"crowded": stage_probe(model, crowd_img),
              "sparse": stage_probe(model, sparse_img)}
    progress["stage"] = "done"

    return {
        "metric": "CrowdHuman crowded images/sec/chip (trained fixture, "
                  "reference thresholds, wall-clock)",
        "value": round(cwall, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(cwall / 0.5, 3),
        "crowded_img_s": round(cwall, 4),
        "crowded_vs_baseline": round(cwall / 0.5, 3),
        "crowded_img_s_median": round(cvalue, 4),
        "sparse_img_s": round(swall, 4),
        "sparse_img_s_median": round(svalue, 4),
        "crowded_detections": cn_det,
        "crowded_gt_persons": len(gt_boxes),
        "sparse_detections": sn_det,
        "sparse_gt_persons": len(sparse_gt),
        "quality": quality,
        "crowded": crowd,
        "sparse": sparse,
        "crowded_diag": cdiag,
        "sparse_diag": sdiag,
        "fixture": progress["fixture"],
        "stages": stages,
        "build_s": progress.get("build_s"),
        "compile_s": round(compile_s, 1),
        "rect_encode": rect,
        "backend": jax.default_backend(),
        "_canary_ctx": (model, pristine_decoder),  # popped by main()
        **extra,
    }


def _error_artifact(progress: dict, exc: BaseException) -> dict:
    import traceback

    tb = traceback.format_exc(limit=12)
    return {
        "metric": "CrowdHuman crowded images/sec/chip (trained fixture, "
                  "reference thresholds)",
        "value": 0.0, "unit": "images/sec/chip", "vs_baseline": 0.0,
        "error": f"{type(exc).__name__}: {exc}"[:500],
        "stage": progress.get("stage", "unknown"),
        "partial": {k: v for k, v in progress.items() if k != "stage"},
        "traceback_tail": tb[-1500:],
    }


def _start_watchdog(progress: dict):
    """Stall watchdog (daemon thread): the axon tunnel can degrade so that
    device->host readbacks hang FOREVER while uploads/dispatch still work
    (observed r5 — a 64-byte fetch wedged >20 min).  Python can't interrupt
    a thread stuck inside a blocking XLA readback, so on stall we emit the
    partial artifact the driver expects on stdout and hard-exit: a
    diagnosable artifact beats a hung driver.  The threshold must exceed
    every legitimately silent stage (fixture train on total cache miss
    ~600 s, concurrent precompile ~190-300 s); BENCH_WATCHDOG_S=0
    disables."""
    import threading

    stall_s = float(os.environ.get("BENCH_WATCHDOG_S", "1200"))
    if stall_s <= 0:
        return

    interval = max(1.0, min(30.0, stall_s / 4))

    def run():
        last, t_last = None, time.time()
        while True:
            time.sleep(interval)
            snap = json.dumps(progress, default=str, sort_keys=True)
            if snap != last:
                last, t_last = snap, time.time()
            elif time.time() - t_last > stall_s:
                art = _error_artifact(progress, TimeoutError(
                    f"watchdog: no progress for {stall_s:.0f}s at stage "
                    f"{progress.get('stage', 'unknown')!r} — likely a hung "
                    "device->host readback (axon tunnel degradation)"))
                print(json.dumps(art), flush=True)
                os._exit(3)

    threading.Thread(target=run, daemon=True, name="bench-watchdog").start()


def main():
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    waited_s = _wait_backend()
    if waited_s < 0:
        print(json.dumps({
            "metric": "CrowdHuman crowded images/sec/chip (trained fixture, "
                      "reference thresholds)",
            "value": 0.0, "unit": "images/sec/chip", "vs_baseline": 0.0,
            "error": "TPU backend unreachable (axon tunnel outage): the "
                     "device-init probe timed out for the whole "
                     "BENCH_BACKEND_WAIT_S window — no measurement possible "
                     "on this machine right now",
            "backend": "unavailable",
        }))
        return
    import jax

    # Persistent compilation cache: repeat bench runs skip the ~3-4 min
    # compile phase.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    # rect_encode: OPT-IN (BENCH_RECT=1) since r4.  The r3 plan made rect
    # the bench default on the strength of a 0.997 cross-AP bound measured
    # under random amplified weights; re-measuring under the TRAINED bench
    # fixture (tools/probe_rect_bound_trained.py) gave cross-AP 0.58-0.64
    # even with a shared decoder — the approximation moves the metric at
    # the bench's own operating point, so the headline now measures the
    # reference-exact square encode (PARITY.md #9 has the full record).
    # When rect IS requested, a failure anywhere on its path automatically
    # retries the whole measurement square (the r3 lesson: the rect flash
    # dispatch crashed the driver bench with no artifact).
    rect = os.environ.get("BENCH_RECT", "0") != "0"
    progress = {}
    _start_watchdog(progress)
    try:
        out = run_measurement(rect, progress)
    except BaseException as exc:  # noqa: BLE001 — artifact, then maybe retry
        if isinstance(exc, KeyboardInterrupt):
            raise
        failed = _error_artifact(progress, exc)
        print(f"# measurement failed at stage={failed['stage']}: "
              f"{failed['error']}", file=sys.stderr)
        if not rect:
            print(json.dumps(failed))
            return
        # clear() not rebind: the watchdog thread holds a reference to this
        # dict — a fresh object would leave it watching frozen state.
        progress.clear()
        try:
            out = run_measurement(False, progress)
            out["rect_attempt"] = {"error": failed["error"],
                                   "stage": failed["stage"]}
            out["rect_encode"] = False
        except BaseException as exc2:  # noqa: BLE001
            if isinstance(exc2, KeyboardInterrupt):
                raise
            second = _error_artifact(progress, exc2)
            second["rect_attempt"] = {"error": failed["error"],
                                      "stage": failed["stage"]}
            print(json.dumps(second))
            return

    # Fixed-workload canary: never fatal, always attempted.  Reuses the
    # headline model with its pre-fixture decoder when it ran square.
    canary_model, pristine = out.pop("_canary_ctx", (None, None))
    if os.environ.get("BENCH_CANARY", "1") != "0":
        try:
            t0 = time.time()
            out["canary"] = _canary(model=canary_model,
                                    pristine_decoder=pristine)
            out["canary"]["canary_s"] = round(time.time() - t0, 1)
        except Exception as e:  # pragma: no cover - diagnostics only
            out["canary"] = {"error": repr(e)[:200]}

    out["backend_wait_s"] = round(waited_s, 1)
    print(json.dumps(out))
    crowd, cdiag = out["crowded"], out["crowded_diag"]
    print(
        f"# compile {out['compile_s']:.1f}s; crowded median "
        f"{crowd['median_ms']:.0f} ms/img ({out['crowded_detections']} det /"
        f" {out['crowded_gt_persons']} gt, keep {cdiag['keep_counts'][:4]}...,"
        f" paths {cdiag['tail_paths'][:4]}...), sparse median "
        f"{out['sparse']['median_ms']:.0f} ms/img "
        f"({out['sparse_detections']} det), quality "
        f"{out.get('quality')}, backend={out['backend']}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

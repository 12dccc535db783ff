"""Matched-pair structure of a deviation-probe artifact (offline, CPU).

Reads a PROBE_DEVIATIONS json (tools/probe_deviations_trained.py with the
r5 `dt` detection dumps) and, for each variant pair of interest, greedily
matches detections per scene by box IoU to decompose the cross-AP gap:

- matched fraction (how many detections exist in both variants at all);
- mean/min IoU of matches (boundary drift on the shared detections);
- score drift on matches (would re-rank under the evaluator);
- unmatched counts per side (detections gained/lost by the deviation).

This separates "the deviation nudges shared boxes" (high matched fraction,
IoU < 1) from "the deviation changes WHICH detections survive" (low matched
fraction — re-NMS cascade territory, cf. PARITY.md #1 discussion).

Usage: python tools/analyze_probe_pairs.py [PROBE_DEVIATIONS_r05.json]
"""

import json
import sys

import numpy as np

PAIRS = [
    ("engine", "parity"),
    ("parity", "exact_cleanup"),
    ("parity", "exact_upfilter"),
    ("parity", "exact_occupy"),
    ("parity", "exact_padcrop"),
    ("parity", "exact_all"),
]


def _by_scene(dt):
    out = {}
    for d in dt:
        out.setdefault(d["image_id"], []).append(d)
    return out


def _iou_matrix(a, b):
    """IoU of xywh boxes a (n,4) vs b (m,4)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    ax2, ay2 = a[:, 0] + a[:, 2], a[:, 1] + a[:, 3]
    bx2, by2 = b[:, 0] + b[:, 2], b[:, 1] + b[:, 3]
    ix = (np.minimum(ax2[:, None], bx2[None]) -
          np.maximum(a[:, None, 0], b[None, :, 0])).clip(0)
    iy = (np.minimum(ay2[:, None], by2[None]) -
          np.maximum(a[:, None, 1], b[None, :, 1])).clip(0)
    inter = ix * iy
    union = (a[:, 2] * a[:, 3])[:, None] + (b[:, 2] * b[:, 3])[None] - inter
    return inter / np.maximum(union, 1e-9)


def match_pair(dt_a, dt_b, iou_thresh=0.5):
    """Greedy highest-IoU matching per scene; returns summary stats."""
    a_scenes, b_scenes = _by_scene(dt_a), _by_scene(dt_b)
    ious, score_d, n_a, n_b, n_m = [], [], 0, 0, 0
    for sid in sorted(set(a_scenes) | set(b_scenes)):
        da, db = a_scenes.get(sid, []), b_scenes.get(sid, [])
        n_a += len(da)
        n_b += len(db)
        if not da or not db:
            continue
        m = _iou_matrix([d["bbox"] for d in da], [d["bbox"] for d in db])
        while m.size and m.max() >= iou_thresh:
            i, j = np.unravel_index(np.argmax(m), m.shape)
            ious.append(float(m[i, j]))
            score_d.append(abs(da[i]["score"] - db[j]["score"]))
            n_m += 1
            m[i, :] = -1
            m[:, j] = -1
    return {
        "n_a": n_a, "n_b": n_b, "n_matched": n_m,
        "matched_frac_a": round(n_m / max(n_a, 1), 4),
        "matched_frac_b": round(n_m / max(n_b, 1), 4),
        "iou_mean": round(float(np.mean(ious)), 4) if ious else None,
        "iou_min": round(float(np.min(ious)), 4) if ious else None,
        "iou_p10": round(float(np.percentile(ious, 10)), 4) if ious else None,
        "score_absdiff_mean": (round(float(np.mean(score_d)), 5)
                               if score_d else None),
        "score_absdiff_max": (round(float(np.max(score_d)), 5)
                              if score_d else None),
    }


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "PROBE_DEVIATIONS_r05.json"
    probe = json.load(open(path))
    dt = probe.get("dt")
    if not dt:
        sys.exit(f"{path} has no 'dt' dumps — re-run "
                 "tools/probe_deviations_trained.py (r5+)")
    report = {}
    for a, b in PAIRS:
        if a in dt and b in dt:
            report[f"{a}_vs_{b}"] = match_pair(dt[a], dt[b])
    print(json.dumps({"source": path, "pairs": report}, indent=1))


if __name__ == "__main__":
    main()

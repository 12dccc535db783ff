"""Sweep weight-amplification recipes for the crowded bench fixture.

Goal: find a committed recipe whose random-weight ViT-L masks are compact,
prompt-local, and varied enough that box NMS at the REFERENCE threshold
(0.65) keeps a CrowdHuman-like fraction of prompts (VERDICT r2 next-round
#2: the bench must load the survivor tail at the reference operating
point, not by escalating NMS thresholds).

Mechanism probed: amplifying the prompt encoder's Fourier matrix
(`pe_gaussian`) sharpens every PE inner product (it enters both the dense
image PE and the point PE), and amplifying the decoder's
image->token cross-attention `out_proj` scales the additive per-pixel
update, which concentrates near the prompt position — together they turn
random-weight masks into prompt-centered bumps.

Run on TPU: python tools/probe_amp_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


_BASE = [("pe_gaussian", 8.0), ("point_embeddings", 8.0),
         ("hyper_mlps", 6.0), ("upscale_3", 8.0)]

def _recipe(pe, qk, out, emb, pt=1.0):
    return ([("pe_gaussian", pe), ("point_embeddings", pt),
             ("hyper_mlps", 6.0), ("upscale_3", 8.0),
             ("cross_attn_image_to_token/q_proj", qk),
             ("cross_attn_image_to_token/out_proj", out)],
            ["cross_attn_image_to_token"], emb)


RECIPES = {
    # name: (amp rules [(param substring, factor)], tie patterns
    # [attn-path substring whose k_proj gets set equal to q_proj — applied
    # AFTER amp, so q amplification transfers], image-embedding scale).
    #
    # Physics: PE entries are sin/cos — amplifying pe_gaussian changes
    # FREQUENCY (kernel width ~ 1/scale), not magnitude.  With every
    # projection at the fast-init std 0.02, attention logits are ~0.2 and
    # softmax is near-uniform; tying k=q makes the logit a PSD kernel
    # peaked at pixel==prompt, and amplifying q (copied into k) by f
    # scales logits by f^2 — softmax sharpness.  emb_scale < 1 suppresses
    # the content term.
    "r2-committed": (_BASE, [], 1.0),
    "qk4": _recipe(8.0, 4.0, 8.0, 1.0),
    "qk6": _recipe(8.0, 6.0, 8.0, 1.0),
    "qk6-emb.3": _recipe(8.0, 6.0, 8.0, 0.3),
    "qk6-pe16": _recipe(16.0, 6.0, 8.0, 1.0),
    "qk6-pe32": _recipe(32.0, 6.0, 8.0, 1.0),
    "qk8-pe16-emb.3": _recipe(16.0, 8.0, 8.0, 0.3),
    "qk10-pe16": _recipe(16.0, 10.0, 8.0, 1.0),
}


def distinct_blob_image(seed, h, w, blobs=25, bg=40, noise=4):
    """Flat background + non-overlapping upright ellipses, each a distinct
    saturated color: with random weights, decoded masks become 'regions
    feature-similar to the prompted blob' — compact and varied, which is
    what survives box NMS at the reference threshold.  The heavy per-pixel
    background noise of structured_image drowns the per-blob feature
    contrast (masks go global-speckle)."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), bg, np.float64)
    img += rng.normal(0, noise, (h, w, 3))
    yy, xx = np.mgrid[0:h, 0:w]
    placed = []
    tries = 0
    while len(placed) < blobs and tries < blobs * 30:
        tries += 1
        ry = int(rng.integers(h // 10, h // 4))
        rx = max(ry // 3, 8)
        cy = int(rng.integers(ry, h - ry))
        cx = int(rng.integers(rx, w - rx))
        if any((cy - py) ** 2 / (ry + pry) ** 2 +
               (cx - px) ** 2 / (rx + prx) ** 2 < 0.5
               for py, px, pry, prx in placed):
            continue
        placed.append((cy, cx, ry, rx))
        color = rng.uniform(80, 255, 3)
        m = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
        img[m] = color + rng.normal(0, noise, 3)
    return np.clip(img, 0, 255).astype(np.uint8), placed


def nms_count(boxes, valid, nth):
    k = len(boxes)
    keep = valid.copy()
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in range(k):
        if not keep[i]:
            continue
        for j in range(i + 1, k):
            if not keep[j]:
                continue
            lt = np.maximum(boxes[i, :2], boxes[j, :2])
            rb = np.minimum(boxes[i, 2:], boxes[j, 2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            iou = inter / max(area[i] + area[j] - inter, 1e-6)
            if iou > nth:
                keep[j] = False
    return int(keep.sum())


def main():
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import jax
    import jax.numpy as jnp
    from flax import traverse_util as tu

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from bench import structured_image
    from crowdsam_tpu.config import load_config, modify_config
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM

    cfg = modify_config(load_config("configs/crowdhuman.yaml"), [
        "model.sam_checkpoint", "", "model.dino_checkpoint", "",
        "model.sam_adapter_checkpoint", "",
        "test.pos_sim_thresh", "0.4", "test.pred_iou_thresh", "0.0",
        "test.stability_score_thresh", "0.0",
    ])
    model = CrowdSAM(cfg)
    base_pe = tu.flatten_dict(model.sam.params["prompt_encoder"], sep="/")
    base_md = tu.flatten_dict(model.sam.params["mask_decoder"], sep="/")

    IMAGES = {
        "texture-blobs": structured_image(0, 683, 1024),
        "distinct25": distinct_blob_image(0, 683, 1024, blobs=25)[0],
        "distinct25-n0": distinct_blob_image(0, 683, 1024, blobs=25,
                                             noise=0)[0],
    }

    k = 64
    rng = np.random.default_rng(1)
    # Grid-ish probe coords over the valid region (what EPS would sample).
    gx = np.linspace(40, 984, 8)
    gy = np.linspace(40, 643, 8)
    coords = np.stack(np.meshgrid(gx, gy), -1).reshape(-1, 2)
    coords += rng.uniform(-15, 15, coords.shape)
    coords = coords.astype(np.float32)

    @jax.jit
    def probe(params, emb, dense_pe, dino_proj, coords):
        sparse, dense = model.sam.prompt_encoder.apply(
            {"params": params["prompt_encoder"]},
            points=(coords[:, None, :], jnp.ones((k, 1), jnp.int32)),
        )
        masks, iou, _cls = model.sam.mask_decoder.apply(
            {"params": params["mask_decoder"]},
            emb, dense_pe, sparse, dense, True, dino_feats_proj=dino_proj,
        )
        sel = jnp.argmax(iou, axis=1)
        return masks[jnp.arange(k), sel]

    def amp(base, rules, ties=()):
        out = {}
        for key, v in base.items():
            f = 1.0
            for pat, fac in rules:
                if pat in key:
                    f *= fac
            out[key] = v * f if f != 1.0 else v
        for key in list(out):
            if key.endswith("k_proj/kernel") and any(t in key for t in ties):
                out[key] = out[key.replace("k_proj", "q_proj")]
            if key.endswith("k_proj/bias") and any(t in key for t in ties):
                out[key] = out[key] * 0.0
        return tu.unflatten_dict({tuple(x.split("/")): y
                                  for x, y in out.items()})

    for img_name, image in IMAGES.items():
        model.crop_image(image, [0, 0, 1024, 683])
        p = model.predictor
        p.set_image_presized(model.image)
        emb = p.get_image_embedding()
        dpe = p.dense_pe
        dproj = p.dino_proj_256
        in_h = model.image.shape[0]

        for name, (rules, ties, emb_scale) in RECIPES.items():
            params = dict(model.sam.params)
            params["prompt_encoder"] = amp(base_pe, rules)
            params["mask_decoder"] = amp(base_md, rules, ties)
            t0 = time.time()
            sel = np.asarray(probe(params, emb * emb_scale, dpe, dproj,
                                   jnp.asarray(coords)), np.float32)
            dt = time.time() - t0

            # Envelope strength: mean logit within 24 low-res px of the
            # prompt minus global mean, in global-std units (is the field
            # prompt-localized at all?).
            lr = coords / 4.0
            yy2, xx2 = np.mgrid[0:256, 0:256]
            env = []
            for i in range(k):
                d2 = (yy2 - lr[i, 1]) ** 2 + (xx2 - lr[i, 0]) ** 2
                near = d2 < 24 ** 2
                env.append((sel[i][near].mean() - sel[i].mean())
                           / (sel[i].std() + 1e-6))
            env_med = float(np.median(env))

            best = (0, 0, None, None)
            for q in (80.0, 88.0, 93.0, 96.5, 98.5, 99.5):
                th = float(np.percentile(sel, q))
                b = sel > th
                boxes = np.zeros((k, 4), np.float32)
                valid = np.zeros(k, bool)
                safe = np.zeros(k, bool)
                areas = []
                for i in range(k):
                    ys, xs = np.nonzero(b[i])
                    if len(ys):
                        boxes[i] = [xs.min(), ys.min(), xs.max(), ys.max()]
                        valid[i] = True
                        # Engine crop-edge filter analogue: a box touching
                        # the frame within 20 px (image coords; low-res x4)
                        # is dropped by is_box_near_crop_edge.
                        bi = boxes[i] * 4.0
                        safe[i] = (bi[0] > 20 and bi[1] > 20
                                   and bi[2] < 1024 - 20
                                   and bi[3] < in_h - 20)
                        areas.append((xs.max() - xs.min())
                                     * (ys.max() - ys.min()))
                n = nms_count(boxes, valid, 0.65)
                ns = nms_count(boxes, valid & safe, 0.65)
                if ns > best[1] or (ns == best[1] and n > best[0]):
                    med_area = float(np.median(areas)) if areas else 0.0
                    best = (n, ns, q, med_area)
            print(f"{img_name:14s} {name:14s} survivors {best[0]:3d}/{k} "
                  f"edge-safe {best[1]:3d} at q={best[2]} "
                  f"(median box area {best[3]:.0f} of {256*256}, "
                  f"envelope {env_med:+.2f}σ) [probe {dt:.1f}s]", flush=True)


if __name__ == "__main__":
    main()

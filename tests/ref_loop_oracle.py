"""Reference-loop oracle: a dynamic-Python reimplementation of the EPS loop.

Mirrors the reference's `CrowdSAM._generate_masks` / `_process_crop` /
`_process_batch` / `postprocess_small_regions` control flow
(`/root/reference/crowdsam/model.py:134-443`) as a straightforward
data-dependent numpy loop, using the framework's *modules* for the decode
math (decoder numerics are covered by the per-module parity tests — this
oracle exists to validate the engine's static-shape while_loop/slab/NMS
machinery and the host survivor tail against the reference's loop-level
semantics: coordinate scaling model.py:219-223, batch consumption and
occupy pruning :229-246, filter order :372-389, NMS :257-262, small-region
postprocess :394-443, score/RLE/uncrop assembly :273-305).

Two modes:

- mode="parity": applies the framework's documented deviations (PARITY.md)
  — masks stay at low_res through the loop, occupy is a 256^2 bitmap over
  the padded frame, NMS runs on low-res boxes, cleanup at low res with a
  scaled area threshold, tie-breaks are index-stable.  `CrowdSAM.generate`
  must agree detection-for-detection (tight tolerances).
- mode="exact": full reference semantics — masks upsampled to the image
  frame before stability/boxes/occupy (model.py:344-349 postprocess before
  filtering), occupy indexed in image coordinates (model.py:238-239,246),
  NMS on image-frame boxes, cleanup at image resolution with the unscaled
  threshold.  Used to BOUND the effect of the documented deviations.

The candidate permutation is taken from the same PRNG stream the engine
uses (the reference's `np.random.shuffle` at model.py:231 is replaced by an
on-device permutation — a documented deviation; the logic under test is
order *consumption*, not the order's source).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from scipy import ndimage

_EIGHT = np.ones((3, 3), dtype=bool)  # cv2 connectivity=8


# --------------------------------------------------------------------- numpy
def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_mask_to_box(masks: np.ndarray) -> np.ndarray:
    """(B,H,W) bool -> (B,4) xyxy inclusive edges, zeros when empty
    (reference amg.py:303-346)."""
    b, h, w = masks.shape
    out = np.zeros((b, 4), dtype=np.float32)
    for i in range(b):
        ys, xs = np.nonzero(masks[i])
        if len(ys):
            out[i] = [xs.min(), ys.min(), xs.max(), ys.max()]
    return out


def np_nms(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> np.ndarray:
    """Greedy NMS keep-mask, torchvision semantics (suppress iff IoU
    strictly > thresh with an earlier kept box), index-stable ties."""
    n = len(boxes)
    keep = np.ones(n, dtype=bool)
    order = np.argsort(-scores.astype(np.float32), kind="stable")
    b = boxes.astype(np.float32)
    area = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    for oi in range(n):
        i = order[oi]
        if not keep[i]:
            continue
        for oj in range(oi + 1, n):
            j = order[oj]
            if not keep[j]:
                continue
            lt = np.maximum(b[i, :2], b[j, :2])
            rb = np.minimum(b[i, 2:], b[j, 2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            iou = inter / (area[i] + area[j] - inter + 1e-6)
            if iou > thresh:
                keep[j] = False
    return keep


def np_remove_small_regions(mask: np.ndarray, area_thresh: float, mode: str):
    """Reference amg.py:267-291 semantics with scipy 8-connected labeling."""
    assert mode in ("holes", "islands")
    correct_holes = mode == "holes"
    working = np.logical_xor(correct_holes, mask)
    labels, n = ndimage.label(working, structure=_EIGHT)
    sizes = ndimage.sum_labels(np.ones_like(labels), labels, np.arange(1, n + 1))
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask, False
    fill = [0] + small
    if not correct_holes:
        fill = [i for i in range(n + 1) if i not in fill]
        if not fill:
            fill = [int(np.argmax(sizes)) + 1]
    return np.isin(labels, fill), True


def np_stability(logits: np.ndarray, thresh: float, offset: float) -> np.ndarray:
    inter = (logits > (thresh + offset)).sum(axis=(-1, -2))
    union = (logits > (thresh - offset)).sum(axis=(-1, -2))
    with np.errstate(invalid="ignore", divide="ignore"):
        return inter / union  # 0/0 -> nan, matching the engine's int/int


def np_near_crop_edge(boxes, crop_box, orig_box, downscale, atol=20.0):
    """Reference crowdsam/utils.py:213-223: uncrop with downscale then
    near-crop-but-not-near-image test."""
    crop = np.asarray(crop_box, np.float32)
    orig = np.asarray(orig_box, np.float32)
    x0, y0 = crop[0], crop[1]
    b = boxes.astype(np.float32) / np.float32(downscale) + np.asarray(
        [x0, y0, x0, y0], np.float32
    )
    near_crop = np.abs(b - crop[None]) <= atol
    near_image = np.abs(b - orig[None]) <= atol
    return np.any(near_crop & ~near_image, axis=1)


def _upsample_logits(logits_lr: np.ndarray, size: int) -> np.ndarray:
    """Bilinear R->size upsample of (B,R,R) logits (the half-pixel
    `jax.image.resize` == `F.interpolate(align_corners=False)` semantics
    both sides use, sam.py:132-161)."""
    return np.asarray(
        jax.image.resize(
            jnp.asarray(logits_lr, jnp.float32),
            (logits_lr.shape[0], size, size),
            "linear", antialias=False,
        )
    )


def _up_nearest(b: np.ndarray, size: int) -> np.ndarray:
    """Exact integer-scale nearest upsample of (B,R,R) bool maps."""
    f = size // b.shape[-1]
    return np.kron(b, np.ones((f, f), dtype=bool)) if b.ndim == 2 else np.stack(
        [np.kron(m, np.ones((f, f), dtype=bool)) for m in b]
    )


# -------------------------------------------------------------------- oracle
def oracle_generate(model, image: np.ndarray, sub_key, mode: str = "parity",
                    crop_box=None):
    """Run the reference-shaped dynamic loop on `model`'s weights/encodes
    for ONE crop (reference `_process_crop`, model.py:192-306).

    Returns dict(num_consumed, iou, scores, categories, stability, points,
    boxes (uncropped image-frame), masks (final full-res bool at
    (in_h, in_w)), in_hw).  `sub_key` must be the PRNG subkey the engine
    consumed (jax.random.split(key_before_generate)[1]).
    """
    assert mode in ("parity", "exact")
    parity = mode == "parity"
    cfg = model.engine_cfg
    img = np.asarray(image, np.uint8)
    orig_h, orig_w = img.shape[:2]
    if crop_box is None:
        crop_box = [0, 0, orig_w, orig_h]

    # Shared encode (covered by module parity tests; not under test here).
    model.crop_image(img, crop_box)
    pred = model.predictor
    pred.set_image_presized(model.image)
    downscale = model.downscale
    in_h, in_w = model.image.shape[:2]
    sim = np.asarray(model._sim_prep(pred.predict_fg_map()), np.float32)

    P = model.sam.params
    features = pred.get_image_embedding()
    dense_pe = pred.dense_pe
    dino_proj = pred.dino_proj_256
    if dino_proj is None:
        dino_proj = jnp.zeros((cfg.low_res, cfg.low_res, 256))

    G, K, R, S = cfg.grid_size, cfg.points_per_batch, cfg.low_res, cfg.img_size
    rr = G / max(in_h, in_w)
    feat_h, feat_w = int(in_h * rr), int(in_w * rr)
    N = G * G

    # Candidate generation + permutation (engine's stream; see module doc).
    rows = np.repeat(np.arange(G), G)
    cols = np.tile(np.arange(G), G)
    cand = (sim.reshape(-1) > cfg.pos_sim_thresh) & (rows < feat_h) & (cols < feat_w)
    rand = np.asarray(jax.random.uniform(sub_key, (N,)))
    order = np.argsort(np.where(cand, rand, 2.0), kind="stable")
    rows, cols, alive = rows[order], cols[order], cand[order]

    if parity:
        # Engine expression: floor(col * (in_w / feat_w)) in f32.
        px = np.floor(
            cols.astype(np.float32) * (np.float32(in_w) / np.float32(feat_w))
        ).astype(np.int32)
        py = np.floor(
            rows.astype(np.float32) * (np.float32(in_h) / np.float32(feat_h))
        ).astype(np.int32)
    else:
        # Reference expression: coords / inv_factor, astype(int)
        # (model.py:219-223,231 — divide by the f32 ratio).
        px = (cols.astype(np.float32) / np.float32(feat_w / in_w)).astype(np.int32)
        py = (rows.astype(np.float32) / np.float32(feat_h / in_h)).astype(np.int32)
    points = np.stack([px, py], axis=1)[alive]

    # Prompt-frame transform (ResizeLongestSide.apply_coords in f32).
    scale = np.float32(S) / np.float32(max(in_h, in_w))
    new_h = np.floor(np.float32(in_h) * scale + np.float32(0.5))
    new_w = np.floor(np.float32(in_w) * scale + np.float32(0.5))
    factor = np.asarray([new_w / np.float32(in_w), new_h / np.float32(in_h)],
                        np.float32)

    is_hq = getattr(pred, "is_hq", False)
    if is_hq:
        hq_feats = pred._cache["hq_features"]
        dino_raw = pred._cache["dino_raw_256"]

    @jax.jit
    def decode(coords):
        sparse, dense = model.sam.prompt_encoder.apply(
            {"params": P["prompt_encoder"]},
            points=(coords[:, None, :], jnp.ones((K, 1), jnp.int32)),
        )
        if is_hq:
            # sam_hq decode (engine.py is_hq branch): HQ token + hoisted
            # per-image fusion; pool-then-project PWD order.
            return model.sam.mask_decoder.apply(
                {"params": P["mask_decoder"]}, features, dense_pe, sparse,
                dense, True, hq_features=hq_feats, dino_feats_256=dino_raw,
            )
        return model.sam.mask_decoder.apply(
            {"params": P["mask_decoder"]}, features, dense_pe, sparse, dense,
            True, dino_feats_proj=dino_proj,
        )

    dets = dict(iou=[], cat=[], stab=[], box=[], pt=[], logits=[])
    occupy_lr = np.zeros((R, R), dtype=bool)
    occupy_img = np.zeros((in_h, in_w), dtype=bool)
    lr_scale = np.float32(R / S)
    count = 0
    consumed = 0
    while len(points) > 0 and count < cfg.max_prompts:
        bs = min(K, len(points))
        batch = points[:bs]
        points = points[bs:]

        pad = np.zeros((K, 2), np.float32)
        pad[:bs] = batch.astype(np.float32) * factor
        masks, iou_pred, cls = (np.asarray(a, np.float32)
                                for a in decode(jnp.asarray(pad)))
        masks, iou_pred, cls = masks[:bs], iou_pred[:bs], cls[:bs]

        # iou fusion quirk (model.py:351) + mask selection (:318-331).
        cls_best = cls.max(axis=-1)
        categories = cls.argmax(axis=-1)
        iou_fused = np.clip(iou_pred, 0.0, None) * np_sigmoid(cls_best)
        ind = iou_fused.argmax(axis=-1)  # max_iou
        take = (np.arange(bs), ind)
        m_sel = masks[take]
        iou_sel, cat_sel = iou_fused[take], categories[take]

        if parity:
            logits_f = m_sel                       # (bs, R, R)
            frame_scale = S / R
        else:
            # Reference: postprocess_masks to the image frame BEFORE any
            # filtering (predictor.py:287, sam.py:132-161).
            logits_f = _upsample_logits(m_sel, S)[:, :in_h, :in_w]
            frame_scale = 1.0

        keep = np.ones(bs, dtype=bool)
        if cfg.pred_iou_thresh > 0.0:
            keep &= iou_sel > cfg.pred_iou_thresh
        stab = np_stability(logits_f, cfg.mask_threshold,
                            cfg.stability_score_offset)
        if cfg.stability_score_thresh > 0.0:
            keep &= stab >= cfg.stability_score_thresh
        binm = logits_f > cfg.mask_threshold
        boxes = np_mask_to_box(binm)
        keep &= ~np_near_crop_edge(boxes * frame_scale, crop_box,
                                   [0, 0, orig_w, orig_h], downscale)

        # Occupy update — OVERWRITE each batch (model.py:246 quirk) — then
        # prune the *remaining* candidates (generator resume, :238-239).
        hot = binm[keep & (iou_sel > cfg.filter_thresh)]
        occ_new = hot.any(axis=0) if len(hot) else np.zeros_like(
            occupy_lr if parity else occupy_img)
        if parity:
            occupy_lr = (occupy_lr | occ_new) if cfg.accumulate_occupy else occ_new
        else:
            occupy_img = (occupy_img | occ_new) if cfg.accumulate_occupy else occ_new
        if len(points):
            if parity:
                oy = np.clip((points[:, 1].astype(np.float32) * lr_scale)
                             .astype(np.int32), 0, R - 1)
                ox = np.clip((points[:, 0].astype(np.float32) * lr_scale)
                             .astype(np.int32), 0, R - 1)
                points = points[~occupy_lr[oy, ox]]
            else:
                oy = np.clip(points[:, 1], 0, in_h - 1)
                ox = np.clip(points[:, 0], 0, in_w - 1)
                points = points[~occupy_img[oy, ox]]
        count += bs
        consumed += bs

        for i in np.nonzero(keep)[0]:
            dets["iou"].append(iou_sel[i])
            dets["cat"].append(cat_sel[i])
            dets["stab"].append(stab[i])
            dets["box"].append(boxes[i])
            dets["pt"].append(batch[i].astype(np.float64))
            dets["logits"].append(m_sel[i])

    n = len(dets["iou"])
    empty = dict(num_consumed=consumed, iou=np.zeros(0), scores=np.zeros(0),
                 categories=np.zeros(0, np.int64), stability=np.zeros(0),
                 points=np.zeros((0, 2)), boxes=np.zeros((0, 4)),
                 masks=np.zeros((0, in_h, in_w), bool), in_hw=(in_h, in_w),
                 prenms=dict(iou=np.zeros(0), cat=np.zeros(0, np.int64),
                             stab=np.zeros(0), box=np.zeros((0, 4)),
                             pt=np.zeros((0, 2)), keep=np.zeros(0, bool)))
    if n == 0:
        return empty
    iou = np.asarray(dets["iou"])
    cat = np.asarray(dets["cat"])
    stab = np.asarray(dets["stab"])
    box = np.stack(dets["box"])
    pt = np.stack(dets["pt"])
    logits = np.stack(dets["logits"])

    # Box NMS over all detections (model.py:257-263).
    keep = np_nms(box, iou, cfg.box_nms_thresh)
    prenms = dict(iou=iou.copy(), cat=cat.copy(), stab=stab.copy(),
                  box=box.copy(), pt=pt.copy(), keep=keep.copy())
    if parity:
        # Engine survivor cap: top max_keep by score (engine.py:351-352).
        sc = np.where(keep, iou, -np.inf)
        top = np.argsort(-sc, kind="stable")[: cfg.max_keep]
        keep = np.zeros_like(keep)
        keep[top[np.isfinite(sc[top])]] = True
    sel = np.nonzero(keep)[0]
    iou, cat, stab, box, pt, logits = (a[sel] for a in
                                       (iou, cat, stab, box, pt, logits))

    # Small-region postprocess (model.py:394-443).
    if cfg.min_mask_region_area > 0 and len(sel):
        if parity:
            area = cfg.min_mask_region_area * (R / S) ** 2
            binm = logits > cfg.mask_threshold
        else:
            area = cfg.min_mask_region_area
            binm = _upsample_logits(logits, S)[:, :in_h, :in_w] > cfg.mask_threshold
        cleaned, changed = [], []
        for m in binm:
            m1, c1 = np_remove_small_regions(m, area, "holes")
            m2, c2 = np_remove_small_regions(m1, area, "islands")
            cleaned.append(m2)
            changed.append(c1 or c2)
        cleaned = np.stack(cleaned)
        changed = np.asarray(changed)
        new_boxes = np_mask_to_box(cleaned)
        thresh = max(cfg.box_nms_thresh, cfg.crop_nms_thresh)
        keep2 = np_nms(new_boxes, (~changed).astype(np.float32), thresh)
        # Changed kept masks take the cleaned mask + recomputed box
        # (model.py:435-440).
        box = np.where(changed[:, None], new_boxes, box)
        final_lowres = np.where(changed[:, None, None], cleaned, binm) \
            if parity else None
        final_img = None if parity else np.where(
            changed[:, None, None], cleaned, binm)
        sel2 = np.nonzero(keep2)[0]
    else:
        changed = np.zeros(len(sel), dtype=bool)
        final_lowres = (logits > cfg.mask_threshold) if parity else None
        final_img = None if parity else (
            _upsample_logits(logits, S)[:, :in_h, :in_w] > cfg.mask_threshold)
        sel2 = np.arange(len(sel))
    if len(sel2) == 0:
        empty["prenms"] = prenms
        return empty
    iou, cat, stab, box, pt, logits, changed = (
        a[sel2] for a in (iou, cat, stab, box, pt, logits, changed))

    # Scores (model.py:273-289; fuse_simmap path not modeled here).
    assert not cfg.fuse_simmap, "oracle covers fuse_simmap=False"
    scores = iou

    # Final full-res masks + boxes.
    if parity:
        binm0 = logits > cfg.mask_threshold
        m2 = final_lowres[sel2]
        full = _upsample_logits(logits, S) > cfg.mask_threshold
        removed = binm0 & ~m2
        filled = ~binm0 & m2
        full = (full & ~_up_nearest(removed, S)) | _up_nearest(filled, S)
        full = full[:, :in_h, :in_w]
        fr_boxes = np_mask_to_box(full)
        nonempty = full.any(axis=(1, 2))
        boxes_in = np.where(nonempty[:, None], fr_boxes,
                            box * (S / R)).astype(np.float64)
    else:
        full = final_img[sel2]
        boxes_in = box.astype(np.float64)

    x0, y0 = crop_box[0], crop_box[1]
    return dict(
        prenms=prenms,
        num_consumed=consumed,
        iou=iou,
        scores=scores,
        categories=cat.astype(np.int64),
        stability=stab,
        points=pt / downscale + np.asarray([x0, y0], np.float64),
        boxes=boxes_in / downscale + np.asarray([x0, y0, x0, y0], np.float64),
        masks=full,
        in_hw=(in_h, in_w),
    )


def oracle_generate_multicrop(model, image: np.ndarray, key0,
                              mode: str = "parity"):
    """Reference `_generate_masks` semantics (model.py:151-190): per-crop
    loops + the cross-crop NMS preferring smaller crops (scores =
    1/crop_area, model.py:167-177; ties index-stable), `crop_boxes`
    dropped afterwards.  `key0` is model._key BEFORE generate (the
    pipeline splits one subkey per crop in crop order)."""
    from crowdsam_tpu.ops.amg import generate_crop_boxes

    img = np.asarray(image, np.uint8)
    crop_boxes, _ = generate_crop_boxes(
        img.shape[:2], model.crop_n_layers, model.crop_overlap_ratio)

    per_crop = []
    key = key0
    for cb in crop_boxes:
        key, sub = jax.random.split(key)
        per_crop.append((cb, oracle_generate(model, img, sub, mode=mode,
                                             crop_box=list(cb))))

    fields = ["iou", "scores", "categories", "stability", "points", "boxes"]
    cat = {f: np.concatenate([o[f] for _, o in per_crop]) for f in fields}
    cat["crop_boxes"] = np.concatenate(
        [np.tile(np.asarray(cb, np.float64), (len(o["boxes"]), 1))
         for cb, o in per_crop])
    cat["masks"] = [m for _, o in per_crop for m in o["masks"]]
    cat["in_hw"] = [o["in_hw"] for cb, o in per_crop
                    for _ in range(len(o["boxes"]))]

    if len(crop_boxes) > 1 and len(cat["boxes"]):
        areas = ((cat["crop_boxes"][:, 2] - cat["crop_boxes"][:, 0])
                 * (cat["crop_boxes"][:, 3] - cat["crop_boxes"][:, 1]))
        scores = (1.0 / areas).astype(np.float32)
        keep = np_nms(cat["boxes"].astype(np.float32), scores,
                      model.crop_nms_thresh)
        # torchvision batched_nms returns indices score-descending; the
        # pipeline's data.filter(nms_indices(...)) REORDERS accordingly.
        idx = np.nonzero(keep)[0]
        idx = idx[np.argsort(-scores[idx], kind="stable")]
        for f in fields + ["crop_boxes"]:
            cat[f] = cat[f][idx]
        cat["masks"] = [cat["masks"][i] for i in idx]
        cat["in_hw"] = [cat["in_hw"][i] for i in idx]
        del cat["crop_boxes"]
    cat["n_crops"] = len(crop_boxes)
    return cat

"""Per-deviation trained-regime probe oracle (VERDICT r4 #1).

PARITY.md documents four resolution-quantization deviations of the EPS
engine from the reference loop (`/root/reference/crowdsam/model.py:192-443`),
each switchable here to its exact reference semantics via a "part" name:

  "cleanup"  — PARITY #1: small-region cleanup at 256^2 with a rescaled
               threshold (reference: cv2 at image resolution,
               /root/reference/crowdsam/model.py:394-443)
  "upfilter" — PARITY #3: in-loop stability score / NMS boxes at 256^2
               (reference: postprocessed image-frame masks,
               /root/reference/crowdsam/model.py:344-389)
  "occupy"   — PARITY #6: occupy pruning quantized to a 256^2 bitmap over
               the padded frame (reference: full-resolution image-coordinate
               lookup, /root/reference/crowdsam/model.py:238-246)
  "padcrop"  — PARITY #7: pad-region logits counted toward in-loop
               stability (the reference crops to the input frame before
               filtering, /root/reference/segment_anything_cs/modeling/
               sam.py:132-161).  Note the occupy aspect of #7 is inert:
               candidate points always index the valid band, so the pad
               region of the low-res occupy bitmap is never read.
  "coords"   — candidate grid -> pixel expression: the reference divides by
               the f32 ratio (model.py:219-223) where the engine multiplies
               by the inverse; off-by-one at exact grid boundaries.

The r4 rect episode (PARITY.md #9) proved that deviation bounds measured
under random amplified weights can collapse at a trained operating point,
so this module exists to re-measure each deviation's metric effect under
the TRAINED bench fixture.  `DeviationProbe.generate` runs a
reference-shaped dynamic loop over the model's own modules with any subset
of parts made exact, device-accelerating the per-batch math: a pure-host
exact oracle (tests/ref_loop_oracle.py) ships ~128 MB of upsampled logits
per 32-prompt batch — infeasible over the ~60 MB/s axon tunnel — while
this ships ~0.5 MB of summaries and bit-packed occupancy per batch.

Cross-validated against the all-numpy reference oracle by
tests/test_deviation_probe.py: parts=() must match oracle mode="parity"
and parts=ALL_PARTS must match mode="exact" detection-for-detection on the
tiny CPU model.  Analysis-only module (uses scipy for host connected
components, like the test oracle); not on any production path.

Used by tools/probe_deviations_trained.py; results recorded in PARITY.md.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from crowdsam_tpu.ops.amg import batched_mask_to_box
from crowdsam_tpu.pipeline.engine import fetch_host_blob, pack_host_blob

ALL_PARTS = frozenset({"coords", "upfilter", "padcrop", "occupy", "cleanup"})

# Candidate cleanup REPLACEMENTS (not reference semantics — measured by the
# probe as possible new engine defaults if PARITY #1's trained bound fails):
#   "cleanup512"      — low-res cleanup at 512^2 instead of 256^2
#   "cleanup_fullarea"— region topology at 256^2, but each region's area
#                       measured on the full-res binarization under the
#                       region's nearest-upsampled footprint (the survivor
#                       pass already materializes the full-res mask, so an
#                       engine port costs a segment-sum, not a new CC).
CANDIDATE_PARTS = frozenset({"cleanup512", "cleanup_fullarea"})

_BLOB_KEYS = ("iou", "cat", "stab", "boxes", "keep", "hot", "occ")


def _np_nms(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> np.ndarray:
    """Greedy NMS keep-mask, torchvision semantics (suppress iff IoU
    strictly > thresh with an earlier kept box), index-stable ties —
    mirrors tests/ref_loop_oracle.np_nms."""
    n = len(boxes)
    keep = np.ones(n, dtype=bool)
    order = np.argsort(-scores.astype(np.float32), kind="stable")
    b = boxes.astype(np.float32)
    area = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(
        b[:, 3] - b[:, 1], 0, None)
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


def _np_remove_small_regions(mask: np.ndarray, area_thresh: float, mode: str):
    """Reference amg.py:267-291 semantics with scipy 8-connected labeling."""
    from scipy import ndimage

    eight = np.ones((3, 3), dtype=bool)
    correct_holes = mode == "holes"
    working = np.logical_xor(correct_holes, mask)
    labels, n = ndimage.label(working, structure=eight)
    sizes = ndimage.sum_labels(
        np.ones_like(labels), labels, np.arange(1, n + 1))
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask, False
    fill = [0] + small
    if not correct_holes:
        fill = [i for i in range(n + 1) if i not in fill]
        if not fill:
            fill = [int(np.argmax(sizes)) + 1]
    return np.isin(labels, fill), True


def _np_remove_small_regions_fullarea(mask, full_binm, area_thresh, mode, f):
    """remove_small_regions with low-res region TOPOLOGY but each region's
    size measured on the full-res binarization under the region's
    nearest-upsampled footprint (the "cleanup_fullarea" candidate)."""
    from scipy import ndimage

    eight = np.ones((3, 3), dtype=bool)
    correct_holes = mode == "holes"
    working = np.logical_xor(correct_holes, mask)
    labels, n = ndimage.label(working, structure=eight)
    if n == 0:
        return mask, False
    labels_up = np.repeat(np.repeat(labels, f, axis=0), f, axis=1)
    src = np.logical_xor(correct_holes, full_binm)
    sizes = ndimage.sum_labels(
        src.astype(np.float64), labels_up, np.arange(1, n + 1))
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask, False
    fill = [0] + small
    if not correct_holes:
        fill = [i for i in range(n + 1) if i not in fill]
        if not fill:
            fill = [int(np.argmax(sizes)) + 1]
    return np.isin(labels, fill), True


def _np_mask_to_box(masks: np.ndarray) -> np.ndarray:
    """(B,H,W) bool -> (B,4) xyxy inclusive edges, zeros when empty."""
    out = np.zeros((len(masks), 4), dtype=np.float32)
    for i, m in enumerate(masks):
        ys, xs = np.nonzero(m)
        if len(ys):
            out[i] = [xs.min(), ys.min(), xs.max(), ys.max()]
    return out


def _pack_bits(b: jnp.ndarray) -> jnp.ndarray:
    """(..., w) bool -> (..., ceil(w/8)) uint8 (np.unpackbits layout)."""
    w = b.shape[-1]
    pad = (-w) % 8
    if pad:
        b = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(0, pad)])
    x = b.reshape(b.shape[:-1] + ((w + pad) // 8, 8)).astype(jnp.uint8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return (x * weights).sum(-1).astype(jnp.uint8)


def _unpack_bits(packed_i32: np.ndarray, w: int) -> np.ndarray:
    return np.unpackbits(
        packed_i32.astype(np.uint8), axis=-1)[..., :w].astype(bool)


class DeviationProbe:
    """Reference-shaped dynamic EPS loop over `model`'s modules with any
    subset of ALL_PARTS switched to exact reference semantics.  One jitted
    per-batch program per (parts, input shape); survivor-stage device
    programs are bucketed to SLAB rows."""

    SLAB = 160  # survivor bucket for the final-box / upsample programs

    def __init__(self, model):
        assert not getattr(model.predictor, "is_hq", False), \
            "HQ decode path not supported by the deviation probe"
        self.model = model
        self._steps: dict = {}
        self._finals: dict = {}

    # ------------------------------------------------------------- programs
    def _get_step(self, parts: frozenset, in_h: int, in_w: int):
        key = (tuple(sorted(parts & {"upfilter", "padcrop", "occupy"})),
               in_h, in_w)
        if key in self._steps:
            return self._steps[key]
        model = self.model
        cfg = model.engine_cfg
        K, R, S = cfg.points_per_batch, cfg.low_res, cfg.img_size
        upf = "upfilter" in parts
        padc = "padcrop" in parts
        occ_img = "occupy" in parts
        rh, rw = -(-in_h * R // S), -(-in_w * R // S)  # low-res valid band
        thr, off = cfg.mask_threshold, cfg.stability_score_offset
        P = model.sam.params
        prompt_encoder, mask_decoder = model.sam.prompt_encoder, \
            model.sam.mask_decoder

        def step(params, features, dense_pe, dino_proj, coords, n_valid):
            sparse, dense = prompt_encoder.apply(
                {"params": params["prompt_encoder"]},
                points=(coords[:, None, :], jnp.ones((K, 1), jnp.int32)),
            )
            masks, iou_pred, cls = mask_decoder.apply(
                {"params": params["mask_decoder"]}, features, dense_pe,
                sparse, dense, True, dino_feats_proj=dino_proj,
            )
            masks = masks.astype(jnp.float32)
            # iou fusion quirk (model.py:351) + max_iou selection (:318-331).
            cls = cls.astype(jnp.float32)
            cls_best = cls.max(axis=-1)
            cat = jnp.argmax(cls, axis=-1)
            iou_fused = jnp.clip(iou_pred.astype(jnp.float32), 0.0, None) \
                * jax.nn.sigmoid(cls_best)
            ind = jnp.argmax(iou_fused, axis=-1)
            take = (jnp.arange(K), ind)
            m_sel, iou_sel, cat_sel = masks[take], iou_fused[take], cat[take]
            valid = jnp.arange(K) < n_valid

            if upf:
                logits_f = jax.image.resize(
                    m_sel, (K, S, S), "linear", antialias=False)
                if padc:
                    logits_f = logits_f[:, :in_h, :in_w]
            else:
                logits_f = m_sel[:, :rh, :rw] if padc else m_sel

            inter = (logits_f > thr + off).sum((-1, -2)).astype(jnp.float32)
            union = (logits_f > thr - off).sum((-1, -2)).astype(jnp.float32)
            stab = inter / union  # 0/0 -> nan, like the reference int/int
            binm = logits_f > thr
            boxes = batched_mask_to_box(binm).astype(jnp.float32)

            keep = valid
            if cfg.pred_iou_thresh > 0.0:
                keep &= iou_sel > cfg.pred_iou_thresh
            if cfg.stability_score_thresh > 0.0:
                keep &= stab >= cfg.stability_score_thresh
            # near-crop-edge filter: single whole-image crop -> the
            # reference test (near crop AND not near image) is identically
            # False (crowdsam/utils.py:213-223); the probe asserts the
            # single-crop config.

            hot = keep & (iou_sel > cfg.filter_thresh)
            if occ_img:
                occ_src = logits_f if (upf and padc) else jax.image.resize(
                    m_sel, (K, S, S), "linear", antialias=False,
                )[:, :in_h, :in_w]
                occ_new = ((occ_src > thr) & hot[:, None, None]).any(0)
            else:
                occ_new = ((m_sel > thr) & hot[:, None, None]).any(0)
            out = {
                "iou": iou_sel, "cat": cat_sel.astype(jnp.int32),
                "stab": stab, "boxes": boxes,
                "keep": keep.astype(jnp.int32), "hot": hot.astype(jnp.int32),
                "occ": _pack_bits(occ_new),
            }
            out = pack_host_blob(out, _BLOB_KEYS)
            out["m_sel"] = m_sel  # device-resident; gathered post-NMS only
            return out

        fn = jax.jit(step)
        self._steps[key] = fn
        return fn

    def _get_corr_box(self, in_h: int, in_w: int, q: int):
        """corr_box(logits, removed, filled) -> (boxes, nonempty): the
        engine's survivor semantics — full-res binarization with the
        resolution-q cleanup corrections applied by nearest upsample."""
        key = ("corr", in_h, in_w, q)
        if key in self._finals:
            return self._finals[key]
        cfg = self.model.engine_cfg
        S, B = cfg.img_size, self.SLAB
        f = S // q
        thr = cfg.mask_threshold

        def _kron(b):
            return jnp.repeat(jnp.repeat(b, f, axis=1), f, axis=2)

        def corr_box(logits, removed, filled):
            up = jax.image.resize(
                logits.astype(jnp.float32), (B, S, S), "linear",
                antialias=False) > thr
            full = (up & ~_kron(removed.astype(bool))) \
                | _kron(filled.astype(bool))
            full = full[:, :in_h, :in_w]
            return (batched_mask_to_box(full).astype(jnp.float32),
                    full.any((1, 2)))

        fn = jax.jit(corr_box)
        self._finals[key] = fn
        return fn

    def _get_up_pack(self, in_h: int, in_w: int, q: int):
        """up_pack(logits) -> bit-packed resolution-q binarization; the
        image-frame crop applies only at full resolution (q == img_size),
        matching the padded-frame semantics of the low-res cleanup."""
        key = ("up", in_h, in_w, q)
        if key in self._finals:
            return self._finals[key]
        cfg = self.model.engine_cfg
        S, B = cfg.img_size, self.SLAB
        thr = cfg.mask_threshold
        crop = q == S

        def up_pack(logits):
            up = jax.image.resize(
                logits.astype(jnp.float32), (B, q, q), "linear",
                antialias=False) > thr
            return _pack_bits(up[:, :in_h, :in_w] if crop else up)

        fn = jax.jit(up_pack)
        self._finals[key] = fn
        return fn

    def _get_up_pack_uncropped(self, q: int):
        """Padded-frame (uncropped) resolution-q binarization — the
        full-res area source for the "cleanup_fullarea" candidate."""
        key = ("upu", q)
        if key in self._finals:
            return self._finals[key]
        cfg = self.model.engine_cfg
        B = self.SLAB
        thr = cfg.mask_threshold

        def up_pack(logits):
            up = jax.image.resize(
                logits.astype(jnp.float32), (B, q, q), "linear",
                antialias=False) > thr
            return _pack_bits(up)

        fn = jax.jit(up_pack)
        self._finals[key] = fn
        return fn

    # ------------------------------------------------------------ main loop
    def generate(self, image: np.ndarray, sub_key,
                 parts=frozenset()) -> dict:
        """One whole-image crop through the reference-shaped loop with
        `parts` exact.  `sub_key` must be the subkey the engine consumed
        for the same image (jax.random.split(key_before_generate)[1]).
        Returns dict(boxes [original frame xyxy], scores, categories,
        stability, num_consumed, n_prenms)."""
        parts = frozenset(parts)
        assert parts <= ALL_PARTS | CANDIDATE_PARTS, \
            parts - (ALL_PARTS | CANDIDATE_PARTS)
        assert len(parts & ({"cleanup"} | CANDIDATE_PARTS)) <= 1, \
            "cleanup modes are mutually exclusive"
        model = self.model
        cfg = model.engine_cfg
        assert model.crop_n_layers == 0 and not cfg.fuse_simmap, \
            "probe covers the single-crop, fuse_simmap=False config"
        img = np.asarray(image, np.uint8)
        orig_h, orig_w = img.shape[:2]
        model.crop_image(img, [0, 0, orig_w, orig_h])
        pred = model.predictor
        pred.set_image_presized(model.image)
        downscale = model.downscale
        in_h, in_w = model.image.shape[:2]
        sim = np.asarray(model._sim_prep(pred.predict_fg_map()), np.float32)

        G, K, R, S = (cfg.grid_size, cfg.points_per_batch, cfg.low_res,
                      cfg.img_size)
        rr = G / max(in_h, in_w)
        feat_h, feat_w = int(in_h * rr), int(in_w * rr)
        N = G * G

        # Candidate generation + permutation (the engine's PRNG stream —
        # the reference's np.random.shuffle is a documented deviation).
        rows = np.repeat(np.arange(G), G)
        cols = np.tile(np.arange(G), G)
        cand = (sim.reshape(-1) > cfg.pos_sim_thresh) \
            & (rows < feat_h) & (cols < feat_w)
        rand = np.asarray(jax.random.uniform(sub_key, (N,)))
        order = np.argsort(np.where(cand, rand, 2.0), kind="stable")
        rows, cols, alive = rows[order], cols[order], cand[order]
        if "coords" in parts:
            # Reference expression (model.py:219-223): divide by f32 ratio.
            px = (cols.astype(np.float32)
                  / np.float32(feat_w / in_w)).astype(np.int32)
            py = (rows.astype(np.float32)
                  / np.float32(feat_h / in_h)).astype(np.int32)
        else:
            # Engine expression: floor(col * (in_w / feat_w)) in f32.
            px = np.floor(cols.astype(np.float32)
                          * (np.float32(in_w) / np.float32(feat_w))
                          ).astype(np.int32)
            py = np.floor(rows.astype(np.float32)
                          * (np.float32(in_h) / np.float32(feat_h))
                          ).astype(np.int32)
        points = np.stack([px, py], axis=1)[alive]

        # Prompt-frame transform (ResizeLongestSide.apply_coords in f32).
        scale = np.float32(S) / np.float32(max(in_h, in_w))
        new_h = np.floor(np.float32(in_h) * scale + np.float32(0.5))
        new_w = np.floor(np.float32(in_w) * scale + np.float32(0.5))
        factor = np.asarray([new_w / np.float32(in_w),
                             new_h / np.float32(in_h)], np.float32)

        step = self._get_step(parts, in_h, in_w)
        P = model.sam.params
        features = pred.get_image_embedding()
        dense_pe = pred.dense_pe
        dino_proj = pred.dino_proj_256
        if dino_proj is None:
            dino_proj = jnp.zeros((R, R, 256))

        occ_img = "occupy" in parts
        occ_w = in_w if occ_img else R
        occupy = np.zeros(
            (in_h if occ_img else R, occ_w), dtype=bool)
        lr_scale = np.float32(R / S)
        dets = dict(iou=[], cat=[], stab=[], box=[], ref=[])
        m_handles = []
        count = consumed = 0
        while len(points) > 0 and count < cfg.max_prompts:
            bs = min(K, len(points))
            batch = points[:bs]
            points = points[bs:]
            pad = np.zeros((K, 2), np.float32)
            pad[:bs] = batch.astype(np.float32) * factor
            out = step(P, features, dense_pe, dino_proj,
                       jnp.asarray(pad), jnp.int32(bs))
            f = fetch_host_blob(out, _BLOB_KEYS)
            m_handles.append(out["m_sel"])
            keep = f["keep"][:bs].astype(bool)
            for i in np.nonzero(keep)[0]:
                dets["iou"].append(f["iou"][i])
                dets["cat"].append(f["cat"][i])
                dets["stab"].append(f["stab"][i])
                dets["box"].append(f["boxes"][i])
                dets["ref"].append((len(m_handles) - 1, i))

            # Occupy update — OVERWRITE each batch (model.py:246 quirk) —
            # then prune the remaining candidates (:238-239).
            occ_new = _unpack_bits(f["occ"], occ_w)
            occupy = (occupy | occ_new) if cfg.accumulate_occupy else occ_new
            if len(points):
                if occ_img:
                    oy = np.clip(points[:, 1], 0, in_h - 1)
                    ox = np.clip(points[:, 0], 0, in_w - 1)
                else:
                    oy = np.clip((points[:, 1].astype(np.float32) * lr_scale)
                                 .astype(np.int32), 0, R - 1)
                    ox = np.clip((points[:, 0].astype(np.float32) * lr_scale)
                                 .astype(np.int32), 0, R - 1)
                points = points[~occupy[oy, ox]]
            count += bs
            consumed += bs

        empty = dict(num_consumed=consumed, n_prenms=0, n_changed=0,
                     n_dropped_renms=0,
                     boxes=np.zeros((0, 4)), scores=np.zeros(0),
                     categories=np.zeros(0, np.int64), stability=np.zeros(0))
        if not dets["iou"]:
            return empty
        iou = np.asarray(dets["iou"])
        cat = np.asarray(dets["cat"], np.int64)
        stab = np.asarray(dets["stab"])
        box = np.stack(dets["box"])
        ref = dets["ref"]
        n_prenms = len(iou)

        # Box NMS over all detections (model.py:257-263).
        keep = _np_nms(box, iou, cfg.box_nms_thresh)
        if parts != ALL_PARTS:
            # Engine survivor cap (engine.py slab semantics): top max_keep
            # by score.  Dropped for the full-exact oracle comparison.
            sc = np.where(keep, iou, -np.inf)
            top = np.argsort(-sc, kind="stable")[: cfg.max_keep]
            keep = np.zeros_like(keep)
            keep[top[np.isfinite(sc[top])]] = True
        sel = np.nonzero(keep)[0]
        iou, cat, stab, box = (a[sel] for a in (iou, cat, stab, box))
        ref = [ref[i] for i in sel]
        n = len(sel)
        if n > self.SLAB:
            # Out of probe scope (calibrated fixtures run ~20-60 survivors);
            # truncating would bias the metric, so fail loudly.
            raise ValueError(f"{n} NMS survivors exceed probe slab "
                             f"{self.SLAB}")

        # Gather survivor low-res logits on device (ships n rows, not the
        # full slab).
        by_batch: dict = {}
        for out_i, (bi, ri) in enumerate(ref):
            by_batch.setdefault(bi, []).append((ri, out_i))
        logits = np.zeros((self.SLAB, R, R), np.float32)
        for bi, pairs in by_batch.items():
            rows_d = jnp.asarray([ri for ri, _ in pairs], jnp.int32)
            got = np.asarray(jnp.take(m_handles[bi], rows_d, axis=0))
            for (ri, out_i), g in zip(pairs, got):
                logits[out_i] = g
        logits_dev = jnp.asarray(logits)

        upf = "upfilter" in parts
        box_img = box if upf else box * np.float32(S / R)

        # Small-region postprocess (model.py:394-443) at resolution q:
        # S for the exact reference semantics, 512 for the "cleanup512"
        # candidate, low_res otherwise ("cleanup_fullarea" keeps low_res
        # topology but measures region areas on the full-res mask).
        exact_cleanup = "cleanup" in parts
        fullarea = "cleanup_fullarea" in parts
        q = S if exact_cleanup else (512 if "cleanup512" in parts else R)

        def _binm_at_q():
            if q == R:
                return logits[:n] > cfg.mask_threshold
            packed = np.asarray(
                self._get_up_pack(in_h, in_w, q)(logits_dev)[:n])
            return _unpack_bits(packed, in_w if q == S else q)

        if cfg.min_mask_region_area > 0:
            binm = _binm_at_q()
            area = cfg.min_mask_region_area * (q / S) ** 2
            if fullarea:
                full_binm = _unpack_bits(np.asarray(
                    self._get_up_pack_uncropped(S)(logits_dev)[:n]), S)
                f = S // R

                def _clean(m, i):
                    m1, c1 = _np_remove_small_regions_fullarea(
                        m, full_binm[i], cfg.min_mask_region_area,
                        "holes", f)
                    m2, c2 = _np_remove_small_regions_fullarea(
                        m1, full_binm[i], cfg.min_mask_region_area,
                        "islands", f)
                    return m2, c1 or c2
            else:
                def _clean(m, i):
                    m1, c1 = _np_remove_small_regions(m, area, "holes")
                    m2, c2 = _np_remove_small_regions(m1, area, "islands")
                    return m2, c1 or c2
            cleaned, changed = [], []
            for i, m in enumerate(binm):
                m2, c = _clean(m, i)
                cleaned.append(m2)
                changed.append(c)
            cleaned = np.stack(cleaned)
            changed = np.asarray(changed)
            new_boxes = _np_mask_to_box(cleaned)
            thresh2 = max(cfg.box_nms_thresh, cfg.crop_nms_thresh)
            keep2 = _np_nms(new_boxes, (~changed).astype(np.float32), thresh2)
            sel2 = np.nonzero(keep2)[0]
        else:
            binm = _binm_at_q()
            cleaned = binm
            changed = np.zeros(n, dtype=bool)
            new_boxes = np.zeros((n, 4), np.float32)
            sel2 = np.arange(n)
        n_changed = int(changed.sum())
        n_dropped_renms = n - len(sel2)
        if len(sel2) == 0:
            empty["n_prenms"] = n_prenms
            empty["n_changed"] = n_changed
            empty["n_dropped_renms"] = n_dropped_renms
            return empty

        # Final boxes.
        if exact_cleanup:
            if upf:
                # Full reference semantics: unchanged masks keep the
                # in-loop image-frame box (model.py:435-440).
                boxes_final = np.where(changed[:, None], new_boxes, box_img)
            else:
                # Engine semantics at image resolution: recompute from the
                # final mask, falling back to the scaled in-loop box.
                final_m = np.where(changed[:, None, None], cleaned, binm)
                mb = _np_mask_to_box(final_m)
                nonempty = final_m.any(axis=(1, 2))
                boxes_final = np.where(nonempty[:, None], mb, box_img)
        else:
            # Engine semantics: full-res boxes from the corrected upsampled
            # mask (the survivor pass), resolution-q-scaled fallback when
            # empty.
            binm0 = binm
            removed = np.zeros((self.SLAB, q, q), bool)
            filled = np.zeros((self.SLAB, q, q), bool)
            removed[:n] = binm0 & ~np.where(
                changed[:, None, None], cleaned, binm0)
            filled[:n] = ~binm0 & np.where(
                changed[:, None, None], cleaned, binm0)
            fr, nonempty = self._get_corr_box(in_h, in_w, q)(
                logits_dev, jnp.asarray(removed), jnp.asarray(filled))
            fr, nonempty = np.asarray(fr)[:n], np.asarray(nonempty)[:n]
            chg_boxes = np.where(changed[:, None],
                                 new_boxes * np.float32(S / q), box_img)
            boxes_final = np.where(nonempty[:, None], fr, chg_boxes)

        iou, cat, stab = (a[sel2] for a in (iou, cat, stab))
        boxes_final = boxes_final[sel2]
        return dict(
            num_consumed=consumed,
            n_prenms=n_prenms,
            n_changed=n_changed,
            n_dropped_renms=n_dropped_renms,
            boxes=boxes_final.astype(np.float64) / downscale,
            scores=iou,  # fuse_simmap=False path (model.py:273-289)
            categories=cat,
            stability=stab,
        )

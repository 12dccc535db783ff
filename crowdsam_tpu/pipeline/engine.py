"""Efficient Prompt Sampler (EPS) decode engine — one fused XLA program.

Behavioural contract: reference `crowdsam/model.py:192-390` (_process_crop /
_process_batch / efficient_batch_iterator).  The reference loop is
data-dependent Python with a host sync per 32-prompt batch
(`occupy_mask ... .cpu()` at model.py:246).  Here the whole thing is one
`lax.while_loop` with static shapes:

- candidate points = thresholded foreground-map cells, randomly permuted
  on-device (argsort over random keys restricted to valid cells);
- each iteration consumes up to `points_per_batch` alive candidates
  (`jnp.nonzero(..., size=K)`), decodes them through the prompt encoder +
  mask decoder, filters (pred-IoU, stability, crop-edge), writes results
  into a fixed [max_iters * K] slab at aligned offsets, and prunes the
  remaining candidates through the occupy mask — all on-device;
- masks stay at 256^2 logits through the loop (the reference upsamples every
  batch to full resolution before filtering; scores/boxes are
  scale-invariant, so we defer full-res upsampling to post-NMS survivors —
  the headline throughput lever);
- post-loop (same program): padded NMS, survivor compaction, on-chip
  small-region cleanup at 256^2 with an area threshold scaled by (256/1024)^2
  (reference runs cv2 at full res, model.py:394-443), re-NMS, score fusion.

Quirks preserved (SURVEY.md §7): the occupy mask is overwritten, not
OR-accumulated, each batch (model.py:246; `accumulate_occupy` opts in to the
fixed behaviour); candidate shuffling makes inference seed-dependent
(model.py:231); iou_pred is used after clamp·sigmoid fusion (model.py:351).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from crowdsam_tpu.models.fused_decode import (
    fused_decode,
    precompute_decode_shared,
)
from crowdsam_tpu.ops.amg import batched_mask_to_box, calculate_stability_score
from crowdsam_tpu.ops.boxes import is_box_near_crop_edge
from crowdsam_tpu.ops.connected import remove_small_regions
from crowdsam_tpu.ops.nms import nms_mask
from crowdsam_tpu.ops.packed import (
    pack_spatial,
    packed_coord_maps,
    packed_flat_index,
    packed_mask_to_box,
    unpack_spatial,
)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Static engine configuration (hashable -> one compiled program each)."""

    grid_size: int = 192
    points_per_batch: int = 32
    max_prompts: int = 500
    n_class: int = 1
    img_size: int = 1024          # SAM input frame (padded square)
    low_res: int = 256            # decoder mask resolution
    mask_threshold: float = 0.0
    pos_sim_thresh: float = 0.5
    filter_thresh: float = 0.7
    pred_iou_thresh: float = 0.1
    stability_score_thresh: float = 0.8
    stability_score_offset: float = 1.0
    box_nms_thresh: float = 0.65
    crop_nms_thresh: float = 0.7
    min_mask_region_area: float = 100.0
    mask_selection: str = "max_iou"
    accumulate_occupy: bool = False
    fuse_simmap: bool = False
    max_keep: int = 320           # post-NMS survivor slab
    cc_max_iters: int = 192
    fused_decode: bool = True     # hoisted/low-rank decoder (fused_decode.py)
    max_rle_changes: int = 6144   # device RLE change-index slots per mask
    # Speculative in-engine survivor tail size.  32 covers the CrowdHuman
    # average (~22-27 detections/image) so typical crowded images need no
    # second dispatch; affordable since the survivor kernel cut the tail
    # to ~0.05 ms/slot (+ ~0.26 low-res cleanup).  Sparse images still
    # take the top-4 lax.cond tier.
    spec_survivors: int = 32
    # Exact-parity mode: run hole/island cleanup on the FULL-RES upsampled
    # masks with the unscaled area threshold (the reference's cv2-at-image-
    # resolution semantics, model.py:394-443) instead of the fast 256^2
    # cleanup + edit upsampling.  Costs an exact connected-components pass
    # at img_size^2 per survivor bucket; requires output_rles (full masks).
    fullres_cleanup: bool = False

    @property
    def max_iters(self) -> int:
        return -(-self.max_prompts // self.points_per_batch)

    @property
    def slab(self) -> int:
        return self.max_iters * self.points_per_batch


# Single-round-trip host fetches: every array the host tail reads is
# packed into ONE 1-D int32 buffer on device (f32 entries bitcast, exact),
# because each separate np.asarray costs a full ~25-30 ms device->host
# round trip over the axon relay AND transfers serialize with compute
# there — 4 sequential fetches per image were ~80 ms of pure latency on
# the steady-state path.  The unpack uses the (free) shape/dtype metadata
# of the unfetched device arrays; order is fixed by these key tuples.
ENGINE_BLOB_KEYS = ("summary", "spec_summary", "spec_cand", "spec_ncol",
                    "spec_svals")
SURVIVOR_BLOB_KEYS = ("summary", "rle_cand", "rle_ncol", "rle_svals")


def pack_host_blob(out, keys):
    """Append out["host_blob"]: the named entries (skipping absent ones)
    flattened into one int32 vector, in `keys` order."""
    flats = []
    for k in keys:
        a = out.get(k)
        if a is None:
            continue
        if a.dtype == jnp.float32:
            a = jax.lax.bitcast_convert_type(a, jnp.int32)
        elif a.dtype != jnp.int32:
            a = a.astype(jnp.int32)
        flats.append(a.reshape(-1))
    if flats:
        out["host_blob"] = jnp.concatenate(flats)
    return out


def fetch_host_blob(container, keys):
    """ONE device->host round trip for all `keys` present in `container`
    (a dict of device arrays with a packed "host_blob").  Returns
    {key: numpy array} with original shapes/dtypes.  Containers without a
    blob (hand-built test fixtures) fall back to per-array fetches."""
    import numpy as np

    if "host_blob" not in container:
        return {k: np.asarray(container[k]) for k in keys
                if container.get(k) is not None}
    blob = np.asarray(container["host_blob"])
    fetched, off = {}, 0
    for k in keys:
        a = container.get(k)
        if a is None:
            continue
        n = int(np.prod(a.shape))
        seg = blob[off:off + n]
        off += n
        if a.dtype == jnp.float32:
            seg = seg.view(np.float32)
        fetched[k] = seg.reshape(a.shape)
    return fetched


def _select_mask(cfg: EngineConfig, masks, iou_fused):
    """Per-prompt mask selection (reference `model.py:318-331`).

    masks: (K, 4, R, R) logits; iou_fused: (K, 4).  Returns indices (K,).
    """
    if cfg.mask_selection == "max_iou":
        return jnp.argmax(iou_fused, axis=-1)
    bin_area = (masks > cfg.mask_threshold).sum(axis=(-1, -2))
    if cfg.mask_selection == "max_area":
        return jnp.argmax(bin_area, axis=-1)
    if cfg.mask_selection == "min_area":
        return jnp.argmin(bin_area, axis=-1)
    raise NotImplementedError(cfg.mask_selection)


def make_eps_engine(prompt_encoder, mask_decoder, cfg: EngineConfig,
                    spec_with_masks=None, spec_allow_kernel: bool = True,
                    shard_axis=None, shard_num: int = 1):
    """Build the jitted single-image decode engine.

    `spec_with_masks` (None | bool): when not None, the survivor tail for
    the top `cfg.spec_survivors` detections runs INSIDE the engine program
    (speculatively — valid whenever the detection count fits), so the host
    tail needs zero extra dispatch round trips for typical images; the bool
    selects whether the full-res mask/RLE outputs are produced (the
    pipeline's output_rles).

    Returns fn(params, features, dense_pe, dino_feats_proj, sim_map,
               feat_hw, input_hw, crop_box, orig_hw, downscale, key)
    -> result pytree with `slab`-sized arrays + keep masks (no host syncs).

    - features: (1, 64, 64, 256) image embedding (NHWC)
    - dense_pe: (64, 64, 256)
    - dino_feats_proj: (256, 256, C) projected+resized DINO features
    - sim_map: (grid, grid) foreground probability (post sigmoid/max)
    - feat_hw: (2,) valid region of sim_map (long side == grid)
    - input_hw: (2,) resized image size inside the padded 1024^2 frame
    - crop_box, orig_hw, downscale: uncrop bookkeeping for the edge filter

    `shard_axis`/`shard_num`: prompt-axis model parallelism over ICI
    (SURVEY §2.5's "headline throughput lever"; BASELINE.json configs[4]).
    When set, the engine body must run INSIDE `shard_map` over a mesh axis
    named `shard_axis` of size `shard_num`, with every input replicated:
    each chip decodes K/shard_num prompts of every 32-prompt EPS batch,
    the occupancy bitmap is reduced collectively each iteration (psum-OR,
    the only sequential cross-prompt dependency in the reference's EPS
    loop, /root/reference/crowdsam/model.py:229-247), and after the loop
    the small per-detection arrays are all-gathered (iteration-major order
    restored) while only the top max_keep mask slabs cross ICI via a
    masked psum.  Semantics are exactly the single-chip engine's — pinned
    by tests/test_prompt_shard.py on the virtual device mesh.
    """
    G = cfg.grid_size
    K = cfg.points_per_batch
    R = cfg.low_res
    N = G * G
    SLAB = cfg.slab
    sharded = shard_axis is not None and shard_num > 1
    if sharded:
        assert K % shard_num == 0, (
            f"points_per_batch {K} must divide over '{shard_axis}' "
            f"({shard_num} shards)")
    KL = K // shard_num if sharded else K          # prompts per shard
    SLAB_L = cfg.max_iters * KL                     # local slab rows

    num_heads = mask_decoder.transformer_num_heads
    dec_dtype = mask_decoder.dtype
    n_class = mask_decoder.n_class
    from crowdsam_tpu.models.mask_decoder_hq import MaskDecoderHQ

    # The sam_hq arch decodes through MaskDecoderHQ (HQ token + fusion
    # stacks); it takes the generic spatial-mask path — `dino_feats_proj`
    # then carries a dict {hq_features, dino_raw} instead of the projected
    # map (the HQ decoder pools raw DINO and projects afterwards).
    is_hq = isinstance(mask_decoder, MaskDecoderHQ)
    fused = cfg.fused_decode and not is_hq
    # In the fused path the whole loop works on packed masks (ops.packed):
    # no depth-to-space transposes, 5x faster mask head (see fused_decode).
    BH = R // 4  # packed base grid (== decoder feature resolution)

    def engine(params, features, dense_pe, dino_feats_proj, sim_map,
               feat_hw, input_hw, crop_box, orig_hw, downscale, key):
        feat_h, feat_w = feat_hw[0], feat_hw[1]
        in_h, in_w = input_hw[0], input_hw[1]

        # Per-image shared decoder tensors, hoisted out of the while loop
        # (block-1 image projections, PE-side terms, fused wide kernels).
        if fused:
            dec_shared = precompute_decode_shared(
                params["mask_decoder"],
                params["prompt_encoder"]["no_mask_embed"],
                features, dense_pe, num_heads=num_heads, dtype=dec_dtype,
            )
            dino_packed = pack_spatial(
                jnp.moveaxis(dino_feats_proj, -1, 0)
            ).reshape(dino_feats_proj.shape[-1], -1).T  # (R*R, C) packed-flat
            xmap, ymap = packed_coord_maps(BH, BH)
        else:
            dec_shared = dino_packed = xmap = ymap = None

        # ------------------------------------------------------------------
        # Candidate generation (reference model.py:201-223,445-449)
        # ------------------------------------------------------------------
        rows = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0).reshape(-1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1).reshape(-1)
        valid_cell = (rows < feat_h) & (cols < feat_w)
        cand = (sim_map.reshape(-1) > cfg.pos_sim_thresh) & valid_cell

        # Random permutation of valid candidates (np.random.shuffle analogue).
        rand = jax.random.uniform(key, (N,))
        order = jnp.argsort(jnp.where(cand, rand, 2.0))
        rows, cols, alive0 = rows[order], cols[order], cand[order]

        # Image-frame integer pixel coords (model.py:219-223: / inv_factor,
        # astype(int)).
        px = jnp.floor(cols.astype(jnp.float32) * (in_w / feat_w)).astype(jnp.int32)
        py = jnp.floor(rows.astype(jnp.float32) * (in_h / feat_h)).astype(jnp.int32)
        pts = jnp.stack([px, py], axis=-1)  # (N, 2) int32
        # Low-res occupy lookup indices (256^2 spans the padded img_size frame).
        lr_scale = R / cfg.img_size
        occ_py = jnp.clip(
            (py.astype(jnp.float32) * lr_scale).astype(jnp.int32), 0, R - 1
        )
        occ_px = jnp.clip(
            (px.astype(jnp.float32) * lr_scale).astype(jnp.int32), 0, R - 1
        )
        if fused:
            # The occupy bitmap lives in packed-flat order in the fused path.
            occ_idx = packed_flat_index(occ_py, occ_px, BH)
        else:
            occ_idx = occ_py * R + occ_px

        # Prompt-frame transform (ResizeLongestSide.apply_coords semantics).
        scale = cfg.img_size / jnp.maximum(in_h, in_w).astype(jnp.float32)
        new_h = jnp.floor(in_h * scale + 0.5)
        new_w = jnp.floor(in_w * scale + 0.5)
        coord_factor = jnp.stack([new_w / in_w, new_h / in_h])

        # ------------------------------------------------------------------
        # Slabs
        # ------------------------------------------------------------------
        logit_shape = (SLAB_L, BH * BH, 16) if fused else (SLAB_L, R, R)
        state = dict(
            it=jnp.int32(0),
            consumed=jnp.int32(0),
            alive=alive0,
            occupy=jnp.zeros((R * R,), dtype=bool),
            logits=jnp.zeros(logit_shape, dtype=jnp.bfloat16),
            iou=jnp.full((SLAB_L,), -jnp.inf, dtype=jnp.float32),
            cat=jnp.zeros((SLAB_L,), dtype=jnp.int32),
            stab=jnp.zeros((SLAB_L,), dtype=jnp.float32),
            boxes=jnp.zeros((SLAB_L, 4), dtype=jnp.float32),  # low-res frame
            points=jnp.zeros((SLAB_L, 2), dtype=jnp.float32),
            valid=jnp.zeros((SLAB_L,), dtype=bool),
        )

        def cond(s):
            return (
                (s["it"] < cfg.max_iters)
                & (s["consumed"] < cfg.max_prompts)
                & jnp.any(s["alive"])
            )

        def body(s):
            (sel_full,) = jnp.nonzero(s["alive"], size=K, fill_value=N)
            # alive/consumed bookkeeping stays replicated (every shard
            # computes the identical full-batch selection).
            alive = s["alive"].at[sel_full].set(False, mode="drop")
            consumed = s["consumed"] + jnp.sum(sel_full < N).astype(jnp.int32)
            if sharded:
                rank = jax.lax.axis_index(shard_axis)
                sel_idx = jax.lax.dynamic_slice_in_dim(
                    sel_full, rank * KL, KL)
            else:
                sel_idx = sel_full
            sel_ok = sel_idx < N
            safe_idx = jnp.minimum(sel_idx, N - 1)
            coords = pts[safe_idx].astype(jnp.float32)  # (KL, 2)

            # ---- decode batch (reference model.py:334-390) ----
            tcoords = coords * coord_factor
            sparse, dense = prompt_encoder.apply(
                {"params": params["prompt_encoder"]},
                points=(tcoords[:, None, :], jnp.ones((KL, 1), jnp.int32)),
            )
            if fused:
                masks, iou_pred, cls_scores = fused_decode(
                    params["mask_decoder"], dec_shared, sparse, True,
                    dino_feats_proj=dino_packed,
                    num_heads=num_heads, dtype=dec_dtype, n_class=n_class,
                    packed_masks=True,
                )  # masks: (K, 4, BH*BH, 16) packed
            elif is_hq:
                masks, iou_pred, cls_scores = mask_decoder.apply(
                    {"params": params["mask_decoder"]},
                    features,
                    dense_pe,
                    sparse,
                    dense,
                    True,
                    hq_features=dino_feats_proj["hq_features"],
                    dino_feats_256=dino_feats_proj["dino_raw"],
                )  # (K,3,R,R), (K,3), (K,3,n_class) — HQ multimask slice
            else:
                masks, iou_pred, cls_scores = mask_decoder.apply(
                    {"params": params["mask_decoder"]},
                    features,
                    dense_pe,
                    sparse,
                    dense,
                    True,
                    dino_feats_proj=dino_feats_proj,
                )  # (K,4,R,R), (K,4), (K,4,n_class)

            # iou fusion quirk (model.py:351): clamp then * sigmoid(cls).
            cls_best = jnp.max(cls_scores, axis=-1)          # (K, 4)
            categories = jnp.argmax(cls_scores, axis=-1)     # (K, 4)
            iou_fused = jnp.clip(iou_pred, 0.0) * jax.nn.sigmoid(cls_best)

            ind = _select_mask(cfg, masks, iou_fused)
            take = (jnp.arange(KL), ind)
            m_sel = masks[take]                  # (K, R, R) logits f32
            iou_sel = iou_fused[take]
            cat_sel = categories[take]

            keep = sel_ok
            if cfg.pred_iou_thresh > 0.0:
                keep &= iou_sel > cfg.pred_iou_thresh
            stab = calculate_stability_score(
                m_sel, cfg.mask_threshold, cfg.stability_score_offset
            ).astype(jnp.float32)
            if cfg.stability_score_thresh > 0.0:
                keep &= stab >= cfg.stability_score_thresh

            binm = m_sel > cfg.mask_threshold
            if fused:
                boxes_lr = packed_mask_to_box(
                    binm, xmap, ymap, BH, BH
                ).astype(jnp.float32)
            else:
                boxes_lr = batched_mask_to_box(binm).astype(jnp.float32)
            # Crop-edge filter in image coords (model.py:386-389).
            boxes_img = boxes_lr * (cfg.img_size / R)
            near = is_box_near_crop_edge(
                boxes_img, crop_box,
                [0, 0, orig_hw[1], orig_hw[0]], downscale,
            )
            keep &= ~near

            # ---- occupy update + pruning (model.py:246,238-239) ----
            hot = binm & (keep & (iou_sel > cfg.filter_thresh))[:, None, None]
            occ_new = jnp.any(hot, axis=0).reshape(-1)
            if sharded:
                # Collective occupy reduce: OR over every shard's prompts —
                # the one cross-prompt dependency per EPS iteration.
                occ_new = jax.lax.psum(
                    occ_new.astype(jnp.int32), shard_axis) > 0
            occupy = (s["occupy"] | occ_new) if cfg.accumulate_occupy else occ_new
            alive &= ~occupy[occ_idx]

            off = s["it"] * KL
            upd = lambda buf, val: jax.lax.dynamic_update_slice_in_dim(
                buf, val.astype(buf.dtype), off, axis=0
            )
            return dict(
                it=s["it"] + 1,
                consumed=consumed,
                alive=alive,
                occupy=occupy,
                logits=upd(s["logits"], m_sel),
                iou=upd(s["iou"], jnp.where(keep, iou_sel, -jnp.inf)),
                cat=upd(s["cat"], cat_sel),
                stab=upd(s["stab"], stab),
                boxes=upd(s["boxes"], boxes_lr),
                points=upd(s["points"], coords),
                valid=upd(s["valid"], keep),
            )

        s = jax.lax.while_loop(cond, body, state)

        if sharded:
            # Restore iteration-major slab order from the per-shard slabs:
            # full[it*K + r*KL + j] = shard_r[it*KL + j].  Only the SMALL
            # per-detection arrays are all-gathered; the mask slabs stay
            # sharded and only the top max_keep rows cross ICI below.
            iters = cfg.max_iters

            def gather_slab(x):
                ax = jax.lax.all_gather(x, shard_axis)   # (M, SLAB_L, ...)
                ax = ax.reshape((shard_num, iters, KL) + x.shape[1:])
                ax = jnp.moveaxis(ax, 0, 1)              # (iters, M, KL, ..)
                return ax.reshape((iters * K,) + x.shape[1:])

            full = {k: gather_slab(s[k])
                    for k in ("iou", "cat", "stab", "boxes", "points",
                              "valid")}
        else:
            full = s

        # ------------------------------------------------------------------
        # Box NMS over the whole slab (model.py:257-263)
        # ------------------------------------------------------------------
        keep_nms = nms_mask(full["boxes"], full["iou"], cfg.box_nms_thresh,
                            full["valid"])

        # Compact survivors into a max_keep slab (score-descending); packed
        # slab logits are unpacked to spatial here, once, for survivors only.
        score_key = jnp.where(keep_nms, full["iou"], -jnp.inf)
        top = jnp.argsort(-score_key)[: cfg.max_keep]
        if sharded:
            # Masked-psum gather of the selected mask rows: each shard
            # contributes the rows it owns (zeros elsewhere); the psum
            # reassembles the replicated top slab (max_keep rows over ICI
            # instead of the whole SLAB).
            rem = top % K
            owner = rem // KL
            local = (top // K) * KL + (rem % KL)
            rank = jax.lax.axis_index(shard_axis)
            rows = s["logits"][local]
            mine = (owner == rank)[:, None, None]
            top_logits = jax.lax.psum(
                jnp.where(mine, rows, jnp.zeros((), rows.dtype)), shard_axis)
        else:
            top_logits = s["logits"][top]
        if fused:
            top_logits = unpack_spatial(top_logits, BH, BH)
        out = {
            "logits": top_logits,
            "iou": full["iou"][top],
            "categories": full["cat"][top],
            "stability": full["stab"][top],
            "boxes": full["boxes"][top],
            "points": full["points"][top],
            "valid": keep_nms[top],
        }

        # Small-region cleanup (model.py:265-271,394-443) runs as a separate
        # bucketed program over survivors only — see `make_small_region_pass`
        # — so its cost scales with detections, not the slab.
        out["masks"] = (
            out["logits"].astype(jnp.float32) > cfg.mask_threshold
        ) & out["valid"][:, None, None]

        # ------------------------------------------------------------------
        # Scores (model.py:273-289)
        # ------------------------------------------------------------------
        if cfg.fuse_simmap:
            sim_lr = jax.image.resize(sim_map, (R, R), "linear", antialias=False)
            msum = out["masks"].sum(axis=(1, 2))
            cls_score = jnp.where(
                msum > 0,
                (out["masks"] * sim_lr[None]).sum(axis=(1, 2)) / jnp.maximum(msum, 1),
                0.0,
            )
            cls_score = jnp.clip(cls_score + 0.5, 0.0, 1.0)
            out["scores"] = jnp.sqrt(jnp.clip(out["iou"], 0.0)) * jnp.sqrt(cls_score)
        else:
            out["scores"] = out["iou"]

        # Speculative survivor tail on the top detections (they sort first
        # in `top`): when the image's detection count fits, the host needs
        # no second dispatch + wait at all.  Disabled in fullres_cleanup
        # mode (an exact image-resolution CC pass inside the engine program
        # would tax every image; the bucketed host pass pays it only once).
        if (spec_with_masks is not None and cfg.spec_survivors > 0
                and not cfg.fullres_cleanup):
            # Tiered + conditional: the tail's cost scales with its static
            # slot count (~2 ms/slot full-res work), so sparse images take
            # a small top-4 tier, mid images the full tier, and crowded
            # images (n > spec_survivors, where the host runs the bucketed
            # pass anyway) skip the tail entirely via lax.cond.
            core = _survivor_core(cfg, with_masks=spec_with_masks,
                                  allow_kernel=spec_allow_kernel)
            n_keep = jnp.sum(keep_nms).astype(jnp.int32)
            in_hw_i = input_hw.astype(jnp.int32)
            # The survivor slab holds min(max_keep, SLAB) rows; a
            # spec_survivors larger than that (tiny demo/test configs)
            # must clamp, or the lax.cond tiers pad to different sizes.
            spec_n = min(cfg.spec_survivors, out["logits"].shape[0])

            def tail(slots):
                def f():
                    r = core(
                        out["logits"][:slots],
                        jnp.minimum(n_keep, slots),
                        in_hw_i,
                    )
                    return jax.tree.map(
                        lambda a: jnp.pad(
                            a, ((0, spec_n - slots),) + ((0, 0),) * (a.ndim - 1)
                        ),
                        r,
                    )
                return f

            full_fn = tail(spec_n)
            shapes = jax.eval_shape(full_fn)
            zeros_fn = lambda: jax.tree.map(
                lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes
            )
            inner = (
                full_fn
                if spec_n <= 4
                else (lambda: jax.lax.cond(n_keep <= 4, tail(4), full_fn))
            )
            spec = jax.lax.cond(n_keep <= spec_n, inner, zeros_fn)
            out["spec_summary"] = spec["summary"]
            if spec_with_masks:
                if "rle_cand" in spec:  # survivor-kernel path
                    out["spec_cand"] = spec["rle_cand"]
                    out["spec_ncol"] = spec["rle_ncol"]
                else:
                    out["spec_svals"] = spec["rle_svals"]
                out["spec_packed"] = spec["packed"]

        # Pack per-detection scalars into one array so the host needs a
        # single small transfer: [valid, iou, score, category, stability,
        # num_consumed, box(4), point(2)].
        out["summary"] = jnp.concatenate(
            [
                out["valid"][:, None].astype(jnp.float32),
                out["iou"][:, None],
                out["scores"][:, None],
                out["categories"][:, None].astype(jnp.float32),
                out["stability"][:, None],
                jnp.broadcast_to(
                    s["consumed"].astype(jnp.float32),
                    (out["valid"].shape[0],),
                )[:, None],
                out["boxes"],
                out["points"],
            ],
            axis=1,
        )
        out["num_consumed"] = s["consumed"]
        pack_host_blob(out, ENGINE_BLOB_KEYS)
        return out

    if shard_axis is not None:
        # Sharded variant runs under shard_map (parallel/prompt_shard.py);
        # exporting a per-shard program would bake in the mesh — keep the
        # plain jit there.
        jitted = jax.jit(engine)
    else:
        # Disk-backed AOT export cache: the engine is the single biggest
        # trace+lower cost in the pipeline (~1-2 min cold); warm processes
        # deserialize the exported module instead (utils/aot_cache.py).
        from crowdsam_tpu.utils.aot_cache import aot_jit

        jitted = aot_jit(
            engine, "eps_engine",
            static_key=repr((prompt_encoder, mask_decoder, cfg,
                             spec_with_masks, spec_allow_kernel)))
    jitted.raw_fn = engine  # un-jitted core for vmap/sharded batching
    return jitted


# Per-column change-position slots for the gather-based RLE extraction in
# `_survivor_core` (a clean object boundary crosses a pixel column a few
# times; columns exceeding this fall back to the packed-bitmap path).
_COL_SLOTS = 8


def _survivor_core(cfg: EngineConfig, with_masks: bool,
                   allow_kernel: bool = True):
    """Shared survivor-tail body; see `make_survivor_pass` for the contract.
    Used both as a standalone bucketed jit and fused into the EPS engine
    for the speculative top-`spec_survivors` path."""
    area_lr = cfg.min_mask_region_area * (cfg.low_res / cfg.img_size) ** 2
    thresh = max(cfg.box_nms_thresh, cfg.crop_nms_thresh)
    s_img = cfg.img_size
    maxc = cfg.max_rle_changes

    def pack_bits(b):
        """(..., W) bool -> (..., W//8) uint8, MSB-first (np.unpackbits)."""
        *lead, wdt = b.shape
        bits = b.reshape(*lead, wdt // 8, 8)
        weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], dtype=jnp.uint8)
        return (bits.astype(jnp.uint8) * weights).sum(-1).astype(jnp.uint8)

    def up4(b, k):
        """Exact integer-scale nearest upsample (R -> S) of bool maps."""
        f = s_img // b.shape[-1]
        x = jnp.broadcast_to(
            b[:, :, None, :, None],
            (k, b.shape[1], f, b.shape[2], f),
        )
        return x.reshape(k, s_img, s_img)

    def run(logits, n, in_hw):
        k = logits.shape[0]
        valid = jnp.arange(k) < n
        fullres = (
            cfg.fullres_cleanup and with_masks and cfg.min_mask_region_area > 0
        )
        binm = (logits.astype(jnp.float32) > cfg.mask_threshold) & valid[:, None, None]
        if fullres:
            # Exact reference semantics (model.py:394-443): cleanup on the
            # upsampled image-resolution masks with the UNSCALED threshold.
            # keep/changed/boxes come from the full-res block below.
            m2 = binm
        elif cfg.min_mask_region_area > 0:
            m1, ch1 = remove_small_regions(
                binm, area_lr, "holes", max_iters=cfg.cc_max_iters
            )
            m2, ch2 = remove_small_regions(
                m1, area_lr, "islands", max_iters=cfg.cc_max_iters
            )
            unchanged = ~(ch1 | ch2)
            new_boxes = batched_mask_to_box(m2).astype(jnp.float32)
            keep = nms_mask(new_boxes, unchanged.astype(jnp.float32), thresh, valid)
            changed = (~unchanged) & valid
        else:
            m2 = binm
            new_boxes = batched_mask_to_box(binm).astype(jnp.float32)
            keep = valid
            changed = jnp.zeros((k,), dtype=bool)

        out = {}
        from crowdsam_tpu.ops.survivor_kernel import (
            survivor_kernel_enabled,
            survivor_rle_pallas,
        )

        use_kernel = (
            allow_kernel
            and with_masks
            and not fullres
            and s_img == 4 * logits.shape[-1]
            and survivor_kernel_enabled()
        )
        if use_kernel:
            # Fused Pallas survivor tail (ops/survivor_kernel.py): upsample
            # + cleanup edits + valid crop + bit-pack + boxes + Fortran
            # change candidates per mask in VMEM — replaces the XLA chain
            # below whose full-res intermediates cost ~1.27 ms/slot at
            # crowded buckets (change extraction alone ~0.86).
            in_h, in_w = in_hw[0], in_hw[1]
            if cfg.min_mask_region_area > 0:
                edit = (
                    ((~binm) & m2).astype(jnp.int8)
                    - (binm & ~m2).astype(jnp.int8)
                )
            else:
                edit = jnp.zeros(logits.shape, jnp.int8)
            # Force invalid slots empty (the XLA path masks binm by
            # `valid`; the kernel sees raw logits).
            edit = jnp.where(valid[:, None, None], edit, jnp.int8(-1))
            ko = survivor_rle_pallas(
                logits, edit, in_hw, thresh=cfg.mask_threshold
            )
            out["packed"] = ko["packed"]
            ksum = ko["summary"]
            fr_boxes = ksum[:, :4].astype(jnp.float32)
            nonempty = ksum[:, 4] > 0
            total = ksum[:, 5]
            overflow_cols = ksum[:, 6] > 0

            # NO device-side compaction: the searchsorted/gather scheme the
            # XLA path uses to flatten per-column candidates into a svals
            # slab costs ~0.9 ms/slot (the survivor pass's real hot spot —
            # the kernel's own work is 0.05 ms/slot).  Ship the compact
            # (slots, S) candidate table + per-column counts instead; the
            # host builds the change list with two np.repeat's
            # (`svals_from_cand`), microseconds per mask.
            out["rle_cand"] = ko["cand"]                 # (k, S_slots, S)
            out["rle_ncol"] = ko["n_col"]                # (k, S)
            n_changes = jnp.where(
                overflow_cols, jnp.int32(maxc + 1), total
            ).astype(jnp.int32)
            out["summary"] = jnp.concatenate(
                [
                    keep[:, None].astype(jnp.float32),
                    changed[:, None].astype(jnp.float32),
                    new_boxes,
                    fr_boxes,
                    n_changes[:, None].astype(jnp.float32),
                    nonempty[:, None].astype(jnp.float32),
                ],
                axis=1,
            )
            return out
        if with_masks:
            in_h, in_w = in_hw[0], in_hw[1]
            x = jax.image.resize(
                logits.astype(jnp.float32), (k, s_img, s_img),
                method="linear", antialias=False,
            )
            full = x > cfg.mask_threshold
            ys = jax.lax.broadcasted_iota(jnp.int32, (s_img, s_img), 0)
            xs = jax.lax.broadcasted_iota(jnp.int32, (s_img, s_img), 1)
            inside = (ys < in_h) & (xs < in_w)
            if fullres:
                full = full & (inside[None] & valid[:, None, None])
                f1, ch1 = remove_small_regions(
                    full, cfg.min_mask_region_area, "holes",
                    max_iters=cfg.cc_max_iters,
                )
                f2, ch2 = remove_small_regions(
                    f1, cfg.min_mask_region_area, "islands",
                    max_iters=cfg.cc_max_iters,
                )
                unchanged = ~(ch1 | ch2)
                full = f2
                fr_for_nms = batched_mask_to_box(full).astype(jnp.float32)
                # The host reads summary[2:6] as low-res-frame boxes for
                # changed masks; IoU (hence NMS) is scale-invariant.
                new_boxes = fr_for_nms * (cfg.low_res / s_img)
                keep = nms_mask(
                    fr_for_nms, unchanged.astype(jnp.float32), thresh, valid
                )
                changed = (~unchanged) & valid
            elif cfg.min_mask_region_area > 0:
                # Apply the low-res cleanup edits (same math the host tail
                # used to do: nearest-upsampled removed/filled maps).
                full = (full & ~up4(binm & ~m2, k)) | up4(~binm & m2, k)
            if not fullres:
                full = full & (inside[None] & valid[:, None, None])

            fr_boxes = batched_mask_to_box(full).astype(jnp.float32)
            nonempty = jnp.any(full, axis=(1, 2))
            out["packed"] = pack_bits(full)

            # Fortran-order (column-major) change extraction in the valid
            # region: transpose, compare against the previous valid element
            # (previous row in the transposed layout; previous column's last
            # valid element at column starts).
            mt = full.transpose(0, 2, 1)               # (k, x, y)
            last = jnp.take_along_axis(
                mt, jnp.full((k, s_img, 1), in_h - 1, jnp.int32), axis=2
            )[..., 0]                                   # (k, x)
            prev = jnp.pad(mt[:, :, :-1], ((0, 0), (0, 0), (1, 0)))
            col0_prev = jnp.pad(last[:, :-1], ((0, 0), (1, 0)))
            # In mt's (x, y) layout a column START is y == 0, i.e. the
            # iota over the minor axis — NOT transposed.  (A previous
            # revision applied the fix to x == 0, which both corrupted
            # column 0's change counts — usually self-healing through the
            # overflow->packed fallback — and dropped the Fortran column
            # link whenever a column's mask ran to the bottom edge; the
            # survivor kernel's numpy-validated counts exposed it.)
            first_el = jax.lax.broadcasted_iota(
                jnp.int32, (s_img, s_img), 1
            ) == 0
            prev = jnp.where(first_el[None], col0_prev[:, :, None], prev)
            tvalid = (xs.T < in_w)[None] & (ys.T < in_h)[None]
            change = tvalid & (mt != prev)

            # Gather-only compaction of change positions (a vmapped
            # jnp.nonzero here lowers to a 1M-element scatter per mask —
            # the survivor tail's former hot spot).  Two-level scheme:
            # per-column counts + exclusive prefix map each output slot j
            # to its column via a vectorized searchsorted; the row within
            # the column comes from per-slot candidates (argmax over
            # csum == s+1).  A column with more than `_COL_SLOTS` changes
            # (noise-like masks; a clean object boundary crosses a column
            # a handful of times) reports maxc+1 changes, routing that mask
            # to the packed-bitmap fallback the host already handles.
            csum = jnp.cumsum(change.astype(jnp.int32), axis=2)  # (k, x, y)
            n_col = csum[:, :, -1]                               # (k, x)
            S = _COL_SLOTS
            cand = jnp.stack(
                [
                    jnp.argmax(change & (csum == s + 1), axis=2).astype(
                        jnp.int32
                    )
                    for s in range(S)
                ],
                axis=2,
            )                                                    # (k, x, S)
            incl = jnp.cumsum(n_col, axis=1)                     # (k, x)
            excl = incl - n_col
            j = jnp.arange(maxc, dtype=jnp.int32)
            col = jax.vmap(
                lambda inc: jnp.searchsorted(inc, j, side="right")
            )(incl).astype(jnp.int32)                            # (k, maxc)
            col_c = jnp.minimum(col, s_img - 1)
            slot = j[None] - jnp.take_along_axis(excl, col_c, axis=1)
            slot_c = jnp.clip(slot, 0, S - 1)
            row = jnp.take_along_axis(
                cand.reshape(k, -1), col_c * S + slot_c, axis=1
            )
            total = incl[:, -1]
            overflow_cols = jnp.any(n_col > S, axis=1)
            n_changes = jnp.where(
                overflow_cols, jnp.int32(maxc + 1), total
            ).astype(jnp.int32)
            pos_ok = j[None] < jnp.minimum(total, maxc)[:, None]
            out["rle_svals"] = jnp.where(
                pos_ok, col_c * in_h + row, jnp.int32(-1)
            )
        else:
            fr_boxes = jnp.zeros((k, 4), jnp.float32)
            nonempty = jnp.zeros((k,), bool)
            n_changes = jnp.zeros((k,), jnp.int32)

        out["summary"] = jnp.concatenate(
            [
                keep[:, None].astype(jnp.float32),
                changed[:, None].astype(jnp.float32),
                new_boxes,
                fr_boxes,
                n_changes[:, None].astype(jnp.float32),
                nonempty[:, None].astype(jnp.float32),
            ],
            axis=1,
        )
        return out

    return run


def make_survivor_pass(cfg: EngineConfig, with_masks: bool,
                       allow_kernel: bool = True):
    """Fused bucketed survivor program: small-region cleanup + re-NMS, and
    (when `with_masks`) the full-res mask tail entirely on device —
    bilinear upsample + binarize, low-res cleanup edits applied by exact
    nearest upsampling, full-res boxes, bit-pack, and Fortran-order RLE
    change-index extraction over the valid (in_h, in_w) region.

    fn(logits (K,R,R), n, in_hw (2,) int32) -> dict:
      summary (K, 12) f32: [keep, changed, lowres_box(4), fullres_box(4),
                            n_changes, nonempty]
      packed (K, S, S//8) uint8 — fallback when n_changes > max_rle_changes
      and, depending on path:
      - survivor-kernel path (TPU): rle_cand (K, 8, S) + rle_ncol (K, S)
        int32 — per-column change rows/counts, flattened on host with
        `ops.rle.svals_from_cand` (device-side compaction costs ~0.9
        ms/slot; the host flatten is microseconds);
      - XLA path: rle_svals (K, max_rle_changes) int32 — column-major
        change positions.
    One compiled program per bucket size.

    `allow_kernel=False` forces the XLA tail — required under jax.vmap
    (the Pallas TPU lowering rejects the vmapped scalar SMEM block spec),
    i.e. for ShardedPipeline's batched survivor program.
    """
    return jax.jit(_survivor_core(cfg, with_masks, allow_kernel))


def make_survivor_pass_batched(cfg: EngineConfig, with_masks: bool):
    """Batched survivor program for `ShardedPipeline`.

    The per-mask work — low-res cleanup and the fused survivor-tail kernel
    — is mask-independent, so it runs over the FLATTENED (B*K) mask axis
    with per-mask in_hw; only the re-NMS and summary assembly are
    per-image.  This keeps the Pallas kernel on the batched path (plain
    `jax.vmap` of it fails to lower: batched scalar-SMEM block specs are
    rejected by Mosaic).  Falls back to the vmapped XLA core off-TPU or in
    fullres_cleanup mode.

    fn(logits (B,K,R,R), ns (B,), in_hws (B,2) int32) -> same pytree as
    `make_survivor_pass` with a leading batch axis.
    """
    from crowdsam_tpu.ops.survivor_kernel import (
        survivor_kernel_enabled,
        survivor_rle_pallas,
    )

    if cfg.fullres_cleanup or not survivor_kernel_enabled():
        core = _survivor_core(cfg, with_masks, allow_kernel=False)
        return jax.jit(jax.vmap(core))

    area_lr = cfg.min_mask_region_area * (cfg.low_res / cfg.img_size) ** 2
    thresh = max(cfg.box_nms_thresh, cfg.crop_nms_thresh)
    s_img = cfg.img_size
    maxc = cfg.max_rle_changes

    @jax.jit
    def run(logits, ns, in_hws):
        b, k = logits.shape[:2]
        r = logits.shape[-1]
        valid_b = jnp.arange(k)[None, :] < ns[:, None]       # (B, K)
        valid = valid_b.reshape(b * k)
        flat = logits.reshape(b * k, r, r)
        binm = (
            flat.astype(jnp.float32) > cfg.mask_threshold
        ) & valid[:, None, None]

        if cfg.min_mask_region_area > 0:
            m1, ch1 = remove_small_regions(
                binm, area_lr, "holes", max_iters=cfg.cc_max_iters
            )
            m2, ch2 = remove_small_regions(
                m1, area_lr, "islands", max_iters=cfg.cc_max_iters
            )
            unchanged = ~(ch1 | ch2)
            new_boxes = batched_mask_to_box(m2).astype(jnp.float32)
            keep = jax.vmap(
                lambda bx, sc, vl: nms_mask(bx, sc, thresh, vl)
            )(
                new_boxes.reshape(b, k, 4),
                unchanged.reshape(b, k).astype(jnp.float32),
                valid_b,
            ).reshape(b * k)
            changed = (~unchanged) & valid
        else:
            m2 = binm
            new_boxes = batched_mask_to_box(binm).astype(jnp.float32)
            keep = valid
            changed = jnp.zeros((b * k,), dtype=bool)

        out = {}
        if with_masks:
            edit = (
                ((~binm) & m2).astype(jnp.int8)
                - (binm & ~m2).astype(jnp.int8)
            )
            edit = jnp.where(valid[:, None, None], edit, jnp.int8(-1))
            hw_flat = jnp.repeat(in_hws.astype(jnp.int32), k, axis=0)
            ko = survivor_rle_pallas(
                flat, edit, hw_flat, thresh=cfg.mask_threshold
            )
            out["packed"] = ko["packed"].reshape(b, k, s_img, s_img // 8)
            out["rle_cand"] = ko["cand"].reshape(b, k, -1, s_img)
            out["rle_ncol"] = ko["n_col"].reshape(b, k, s_img)
            ksum = ko["summary"]
            fr_boxes = ksum[:, :4].astype(jnp.float32)
            nonempty = ksum[:, 4] > 0
            n_changes = jnp.where(
                ksum[:, 6] > 0, jnp.int32(maxc + 1), ksum[:, 5]
            ).astype(jnp.int32)
        else:
            fr_boxes = jnp.zeros((b * k, 4), jnp.float32)
            nonempty = jnp.zeros((b * k,), bool)
            n_changes = jnp.zeros((b * k,), jnp.int32)

        out["summary"] = jnp.concatenate(
            [
                keep[:, None].astype(jnp.float32),
                changed[:, None].astype(jnp.float32),
                new_boxes,
                fr_boxes,
                n_changes[:, None].astype(jnp.float32),
                nonempty[:, None].astype(jnp.float32),
            ],
            axis=1,
        ).reshape(b, k, 12)
        return out

    return run


def make_small_region_pass(cfg: EngineConfig):
    """Bucketed small-region cleanup + re-NMS over gathered survivors.

    fn(logits (K,R,R), n) -> dict(masks, changed, boxes, keep); jitted, one
    compile per bucket size K.  Matches reference postprocess_small_regions
    (model.py:394-443): holes then islands at the low-res-scaled area
    threshold, boxes recomputed for changed masks, NMS preferring unchanged
    masks (score = unchanged indicator).
    """
    area_lr = cfg.min_mask_region_area * (cfg.low_res / cfg.img_size) ** 2
    thresh = max(cfg.box_nms_thresh, cfg.crop_nms_thresh)

    @jax.jit
    def run(logits, n):
        k = logits.shape[0]
        valid = jnp.arange(k) < n
        binm = (logits.astype(jnp.float32) > cfg.mask_threshold) & valid[:, None, None]
        m1, ch1 = remove_small_regions(
            binm, area_lr, "holes", max_iters=cfg.cc_max_iters
        )
        m2, ch2 = remove_small_regions(
            m1, area_lr, "islands", max_iters=cfg.cc_max_iters
        )
        unchanged = ~(ch1 | ch2)
        new_boxes = batched_mask_to_box(m2).astype(jnp.float32)
        keep = nms_mask(new_boxes, unchanged.astype(jnp.float32), thresh, valid)
        return {
            "masks": m2 & valid[:, None, None],
            "changed": (~unchanged) & valid,
            "boxes": new_boxes,
            "keep": keep,
        }

    return run


def make_upsampler(cfg: EngineConfig, input_hw: Tuple[int, int]):
    """Jitted survivor upsampler: low-res logits -> input-frame binary masks.

    Two-stage like reference `sam.py:132-161` (low-res -> img_size bilinear,
    crop pad, binarize).  original==input in the CrowdSAM flow, so the second
    resize is the identity.  Static per input_hw (one compile per image
    aspect bucket).
    """

    @jax.jit
    def upsample(logits: jnp.ndarray) -> jnp.ndarray:
        n = logits.shape[0]
        x = jax.image.resize(
            logits.astype(jnp.float32),
            (n, cfg.img_size, cfg.img_size),
            method="linear",
            antialias=False,
        )
        x = x[:, : input_hw[0], : input_hw[1]]
        return x > cfg.mask_threshold

    return upsample

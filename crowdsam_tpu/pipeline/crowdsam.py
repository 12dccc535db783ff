"""CrowdSAM: whole-image -> instance annotations pipeline shell.

Behavioural contract: reference `crowdsam/model.py` (CrowdSAM class).  The
public surface is `CrowdSAM(config, logger).generate(image) -> MaskData`
with keys boxes / scores / categories / rles / rles_info / points / fboxes /
crop_boxes / stability_score (model.py:134-190 and _process_crop).

Host/device split (TPU-first):
- host: one cv2 resize per crop (reference utils.resize_image semantics),
  padding, JSON/RLE serialization, final numpy assembly;
- device: the fused dual backbone encode (predictor), the foreground-map
  prep, the EPS decode engine (engine.py — candidate sampling through box
  NMS with zero per-batch host syncs), and bucketed survivor passes
  (small-region cleanup + re-NMS, mask upsampling) whose shapes — and hence
  device->host transfer sizes — scale with the detection count.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from crowdsam_tpu.models.build import sam_model_registry
from crowdsam_tpu.models.dinov2 import dino_model_registry
from crowdsam_tpu.ops import rle as rle_ops
from crowdsam_tpu.ops.amg import MaskData, generate_crop_boxes
from crowdsam_tpu.ops.nms import nms_indices
from crowdsam_tpu.ops.transforms import resize_image
from crowdsam_tpu.pipeline.engine import EngineConfig, make_eps_engine
from crowdsam_tpu.pipeline.predictor import SamPredictor
from crowdsam_tpu.utils.init import fast_random_init
from crowdsam_tpu.utils.logging import get_logger


def _dtype_from_str(s: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[s]


def _uncrop_boxes_np(boxes, crop_box, downscale):
    x0, y0 = crop_box[0], crop_box[1]
    return boxes / downscale + np.asarray([x0, y0, x0, y0], dtype=np.float64)


def _uncrop_points_np(points, crop_box, downscale):
    x0, y0 = crop_box[0], crop_box[1]
    return points / downscale + np.asarray([x0, y0], dtype=np.float64)


def _mask_to_box_np(masks):
    """(B, H, W) bool -> (B, 4) xyxy with inclusive edges; [0,0,0,0] for
    empty masks (host numpy mirror of ops.amg.batched_mask_to_box)."""
    b, h, w = masks.shape
    in_h = masks.any(axis=2)
    in_w = masks.any(axis=1)
    hc = in_h * np.arange(h)
    wc = in_w * np.arange(w)
    bottom = hc.max(axis=1)
    top = (hc + h * ~in_h).min(axis=1)
    right = wc.max(axis=1)
    left = (wc + w * ~in_w).min(axis=1)
    empty = (right < left) | (bottom < top)
    out = np.stack([left, top, right, bottom], axis=-1)
    out[empty] = 0
    return out


class CrowdSAM:
    def __init__(self, config: Dict[str, Any], logger=None):
        self.config = config
        self.logger = logger or get_logger()
        mcfg, tcfg = config["model"], config["test"]
        tpucfg = config.get("tpu", {})
        dtype = _dtype_from_str(tpucfg.get("compute_dtype", "bfloat16"))

        self.n_class = mcfg.get("n_class", 1)
        self.train_free = bool(mcfg.get("trainfree", False))
        self.sam_arch = mcfg.get("sam_arch", "crowdsam")

        # ---- SAM (reference model.py:88-115) ----
        # Arch registry: 'crowdsam' (PWD-Net decoder), 'sam_hq' (HQ decoder,
        # sam_model carries an 'hq' prefix that is stripped, model.py:99),
        # 'mobile_sam' (TinyViT encoder, 'mobile' prefix, model.py:105), or
        # vanilla 'sam'.  The reference delegates sam_hq/mobile_sam to
        # external pip packages; here all arches are first-party.
        sam_model_name = mcfg.get("sam_model", "vit_l")
        hq = self.sam_arch == "sam_hq"
        if hq and not sam_model_name.startswith("vit"):
            sam_model_name = sam_model_name[2:].lstrip("_")
        if self.sam_arch == "mobile_sam":
            if not sam_model_name.startswith("vit"):
                sam_model_name = sam_model_name[6:].lstrip("_")
        sam_ckpt = mcfg.get("sam_checkpoint")
        sam_ckpt = sam_ckpt if sam_ckpt and os.path.exists(sam_ckpt) else None
        if mcfg.get("sam_checkpoint") and sam_ckpt is None:
            self.logger.warning(
                "SAM checkpoint %s not found; using random init",
                mcfg.get("sam_checkpoint"),
            )
        dino_dims = {"dinov2_vitl14": 1024, "dinov2_vitb14": 768,
                     "dinov2_vits14": 384}
        build_kw = dict(
            checkpoint=None, n_class=self.n_class, dtype=dtype,
            dino_dim=dino_dims.get(mcfg.get("dino_model", "dinov2_vitl14"), 1024),
            hq=hq,
        )
        if mcfg.get("image_size"):  # optional; the reference hardcodes 1024
            build_kw["image_size"] = int(mcfg["image_size"])
        sam = sam_model_registry[sam_model_name](**build_kw)
        if sam_ckpt is not None:
            from crowdsam_tpu.utils.checkpoint import load_sam_checkpoint, overlay

            sam.params = overlay(
                sam.params,
                load_sam_checkpoint(
                    sam_ckpt, encoder_depth=sam.image_encoder.depth,
                    n_class=self.n_class, hq=hq,
                    tiny=(sam_model_name == "vit_t"),
                ),
            )
        adapter = mcfg.get("sam_adapter_checkpoint")
        if adapter and os.path.exists(adapter) and self.sam_arch != "sam":
            from crowdsam_tpu.utils.checkpoint import load_adapter_checkpoint, overlay

            sam.params = overlay(
                sam.params,
                {"mask_decoder": load_adapter_checkpoint(adapter, hq=hq)},
            )
        elif adapter and self.sam_arch != "sam":
            self.logger.warning("adapter checkpoint %s not found", adapter)
        self.sam = sam

        # ---- DINOv2 (reference model.py:33-36) ----
        dino_module = dino_model_registry[mcfg.get("dino_model", "dinov2_vitl14")](
            dtype=dtype
        )
        dino_ckpt = mcfg.get("dino_checkpoint")
        if dino_ckpt and os.path.exists(dino_ckpt):
            from crowdsam_tpu.utils.checkpoint import (
                convert_dinov2,
                load_torch_state_dict,
            )

            dino_params = convert_dinov2(
                load_torch_state_dict(dino_ckpt), depth=dino_module.depth
            )
        else:
            if dino_ckpt:
                self.logger.warning("DINO checkpoint %s not found; random init",
                                    dino_ckpt)
            dino_params = fast_random_init(
                dino_module,
                jnp.zeros((1, 28, 28, 3), jnp.float32),
                seed=config["environ"].get("seed", 42),
            )
        self.predictor = SamPredictor(
            sam, dino_module, dino_params,
            rect_encode=bool(config["tpu"].get("rect_encode", False)),
        )

        # ---- test-time knobs (reference model.py:44-64) ----
        self.mask_selection = tcfg["mask_selection"]
        self.apply_box_offsets = tcfg["apply_box_offsets"]
        if self.apply_box_offsets:
            self.logger.warning(
                "test.apply_box_offsets: True is ignored — the offsets "
                "branch is dead in the reference too (crowdsam/model.py:"
                "301-305 reads data['box_offsets'], which is never "
                "produced, so True would KeyError there)"
            )
        self.max_prompts = tcfg["max_prompts"]
        self.filter_thresh = tcfg["filter_thresh"]
        self.max_size = tcfg["max_size"]
        self.grid_size = tcfg["grid_size"]
        self.pred_iou_thresh = tcfg["pred_iou_thresh"]
        self.fuse_simmap = tcfg["fuse_simmap"]
        self.stability_score_thresh = tcfg["stability_score_thresh"]
        self.stability_score_offset = tcfg["stability_score_offset"]
        self.box_nms_thresh = tcfg["box_nms_thresh"]
        self.points_per_batch = tcfg["points_per_batch"]
        self.crop_n_layers = tcfg["crop_n_layers"]
        self.crop_nms_thresh = tcfg["crop_nms_thresh"]
        self.crop_overlap_ratio = tcfg["crop_overlap_ratio"]
        self.min_mask_region_area = tcfg["min_mask_region_area"]
        self.pos_sim_thresh = tcfg["pos_sim_thresh"]
        self.output_rles = tcfg.get("output_rles", True)

        if self.train_free:
            ref_path = mcfg.get("ref_feature", "")
            if ref_path and os.path.exists(ref_path):
                import pickle

                with open(ref_path, "rb") as f:
                    ref = pickle.load(f)
                self.ref_feature = jnp.asarray(np.asarray(ref["f"]).mean(axis=0))
            else:
                self.logger.warning("trainfree ref_feature missing; using zeros")
                self.ref_feature = jnp.zeros((dino_module.embed_dim,))
            self.alpha = mcfg.get("score_fusion", 0.25)

        grid = self.predictor.dino_grid if self.train_free else self.grid_size
        self.engine_cfg = EngineConfig(
            grid_size=grid,
            low_res=sam.img_size // 4,
            points_per_batch=self.points_per_batch,
            max_prompts=self.max_prompts,
            n_class=self.n_class,
            img_size=sam.img_size,
            mask_threshold=sam.mask_threshold,
            pos_sim_thresh=self.pos_sim_thresh,
            filter_thresh=self.filter_thresh,
            pred_iou_thresh=self.pred_iou_thresh,
            stability_score_thresh=self.stability_score_thresh,
            stability_score_offset=self.stability_score_offset,
            box_nms_thresh=self.box_nms_thresh,
            crop_nms_thresh=self.crop_nms_thresh,
            min_mask_region_area=self.min_mask_region_area,
            mask_selection=self.mask_selection,
            accumulate_occupy=tpucfg.get("accumulate_occupy", False),
            fuse_simmap=self.fuse_simmap,
            cc_max_iters=tpucfg.get("cc_max_iters", 192),
            fused_decode=tpucfg.get("fused_decode", True),
            # Default comes from the EngineConfig dataclass (32: covers the
            # CrowdHuman-average detection count so typical crowded images
            # take the in-engine speculative tail).  Round-2 regression: a
            # hard-coded 16 here silently overrode the dataclass default in
            # every shipped entry point; tests/test_engine_defaults.py pins
            # the wiring now.
            spec_survivors=tpucfg.get(
                "spec_survivors", EngineConfig.spec_survivors
            ),
            fullres_cleanup=tpucfg.get("fullres_cleanup", False),
        )
        if self.engine_cfg.fullres_cleanup and not (
            self.output_rles and self.engine_cfg.min_mask_region_area > 0
        ):
            self.logger.warning(
                "tpu.fullres_cleanup is set but %s; the exact full-res "
                "cleanup path only runs with output RLEs and a positive "
                "min_mask_region_area — falling back to the approximate "
                "low-res cleanup (documented deviation)",
                "output_rles is off" if not self.output_rles
                else "min_mask_region_area == 0",
            )
        self.engine = make_eps_engine(
            sam.prompt_encoder, sam.mask_decoder, self.engine_cfg,
            spec_with_masks=self.output_rles,
        )
        self._build_survivor_programs()
        # Optional tail introspection (bench/profiling): when a list, each
        # _finalize_crop appends {"n": pre-survivor keep count, "path":
        # "spec"|"none"|bucket size}.
        self.tail_stats: Optional[list] = None
        self._sim_prep = jax.jit(self._sim_prep_impl)
        self._trainfree_sim = jax.jit(self._trainfree_sim_impl)
        self._upsample = jax.jit(self._upsample_impl)
        self._key = jax.random.PRNGKey(config["environ"].get("seed", 42))

    # ------------------------------------------------------------------ sims
    def _sim_prep_impl(self, fg_logits):
        """(1, n_class, 256, 256) logits -> (grid, grid) probability map
        (reference model.py:201-204)."""
        g = self.engine_cfg.grid_size
        x = jax.image.resize(
            fg_logits, (1, fg_logits.shape[1], g, g), "linear", antialias=False
        )
        return jnp.max(jax.nn.sigmoid(x[0]), axis=0)

    def _trainfree_sim_impl(self, image_sq_u8, ref_feature):
        """Train-free foreground map (reference model.py:206-218,308-316):
        the image arrives stretched to the square DINO input (host PIL
        resize, T.Resize((1022,1022)) semantics), is ImageNet-normalized —
        NOT the SAM-normalized features the trained path uses — then scored
        by cosine similarity against the cached reference feature."""
        p = self.predictor
        x = image_sq_u8.astype(jnp.float32) / 255.0
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        x = ((x - mean) / std)[None]
        feats = p.dino_model.apply({"params": p.dino_params}, x)[
            "x_norm_patchtokens"
        ].reshape(p.dino_grid, p.dino_grid, -1)
        f = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True).clip(1e-6)
        r = ref_feature / jnp.linalg.norm(ref_feature).clip(1e-6)
        return f @ r.astype(f.dtype)

    def _upsample_impl(self, logits):
        """Survivor low-res logits -> img_size^2 binary masks, bit-packed for
        a compact device->host transfer."""
        s = self.sam.img_size
        n = logits.shape[0]
        x = jax.image.resize(
            logits.astype(jnp.float32), (n, s, s), "linear", antialias=False
        )
        bits = (x > self.sam.mask_threshold).reshape(n, s, s // 8, 8)
        weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], dtype=jnp.uint8)
        return (bits.astype(jnp.uint8) * weights).sum(-1).astype(jnp.uint8)

    def _build_survivor_programs(self) -> None:
        """(Re)build the bucketed survivor programs from `self.engine_cfg`.
        Call again after swapping engine_cfg (bench/tests)."""
        from crowdsam_tpu.pipeline.engine import make_survivor_pass

        self._survivor_pass = make_survivor_pass(
            self.engine_cfg, with_masks=self.output_rles
        )
        # Gather fused into the bucketed survivor program: one dispatch per
        # crowded image instead of an eager jnp.take (which costs a
        # separate compile per bucket shape over the axon tunnel) plus the
        # survivor jit.
        from crowdsam_tpu.pipeline.engine import (
            SURVIVOR_BLOB_KEYS, pack_host_blob)

        sp = self._survivor_pass

        def gathered(slab, idx, n, hw):
            r = sp(jnp.take(slab, idx, axis=0), n, hw)
            # One-round-trip host fetch (see engine.pack_host_blob).
            return pack_host_blob(r, SURVIVOR_BLOB_KEYS)

        # AOT export cache: one survivor program per bucket size at ~20-25 s
        # trace+lower each — the other big cold-start cost next to the
        # engine (utils/aot_cache.py).
        from crowdsam_tpu.utils.aot_cache import aot_jit

        self._survivor_gathered = aot_jit(
            gathered, "survivor_gathered",
            static_key=repr((self.engine_cfg, self.output_rles)))
        # Device-side row gather for the packed-bitmap overflow fallback.
        # np.asarray(sp["packed"]) would ship the WHOLE slab (16 MB at
        # bucket 128, 42 MB at 320) over the ~60 MB/s tunnel whenever even
        # one mask overflows its RLE change budget; gathering the (padded)
        # overflow rows on device ships ~131 KB per overflow mask instead.
        self._packed_gather = jax.jit(
            lambda packed, idx: jnp.take(packed, idx, axis=0)
        )
        self._survivors_prewarmed = False  # new programs, fresh compiles

    # ------------------------------------------------------------------ api
    SURVIVOR_BUCKETS = (8, 16, 32, 64, 128, 192, 256)
    _OVERFLOW_PAD = 8  # packed-row gather slots per dispatch (fixed shape)

    def _gather_packed_rows(self, packed, rows: np.ndarray) -> np.ndarray:
        """Fetch `rows` of a device-resident packed-bitmap slab, gathering
        on device in fixed-size chunks so the host transfer scales with the
        (rare) overflow count, not the slab."""
        pad = self._OVERFLOW_PAD
        out = []
        for start in range(0, len(rows), pad):
            chunk = rows[start:start + pad]
            idx = np.zeros(pad, np.int32)
            idx[: len(chunk)] = chunk
            out.append(np.asarray(
                self._packed_gather(packed, jnp.asarray(idx))
            )[: len(chunk)])
        return np.concatenate(out, axis=0)

    def prewarm_survivors(self, buckets=None, workers: int = 4) -> None:
        """Compile the bucketed survivor programs ahead of the steady-state
        loop.  The bucket a crowded image hits depends on its (seed-
        dependent) detection count, so without this a long `generate_many`
        run can eat a full XLA compile mid-stream the first time a fresh
        bucket size appears (the round-2 driver bench's 1864 ms/img
        mechanism).  in_hw is a traced argument, so one compile per bucket
        covers every image shape.  Idempotent.  `generate_many` calls this
        automatically on its first multi-image run (VERDICT r2 #4).

        Buckets warm CONCURRENTLY (`workers` threads): even with the
        persistent compile cache hitting, each bucket pays ~20-25 s of
        trace+lower before the cache key exists, and that work releases
        the GIL — measured 7 buckets 168 s serial -> 46 s at workers=4 on
        the chip (PERF.md "Round 4 compile budget").  workers=1 restores
        the serial path."""
        self._survivors_prewarmed = True
        cfg = self.engine_cfg
        buckets = tuple(buckets) if buckets is not None else (
            self.SURVIVOR_BUCKETS + (cfg.max_keep,)
        )
        r = cfg.low_res
        slab = jnp.zeros((cfg.max_keep, r, r), jnp.bfloat16)
        hw = jnp.asarray((cfg.img_size, cfg.img_size), jnp.int32)
        idx0 = jnp.zeros((self._OVERFLOW_PAD,), jnp.int32)

        def _warm_bucket(b):
            sp = self._survivor_gathered(
                slab, jnp.zeros((b,), jnp.int32), jnp.int32(0), hw
            )
            if "packed" in sp:  # overflow-fallback gather, per slab shape
                self._packed_gather(sp["packed"], idx0)

        todo = [b for b in buckets if b <= cfg.max_keep]
        if workers > 1 and len(todo) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(workers) as ex:
                list(ex.map(_warm_bucket, todo))
        else:
            for b in todo:
                _warm_bucket(b)
        if self.output_rles and cfg.spec_survivors > 0:
            # The spec (in-engine) tail's packed slab has its own shape
            # (engine clamps the speculative rows to the survivor slab).
            s = self.sam.img_size
            spec_n = min(cfg.spec_survivors, cfg.max_keep, cfg.slab)
            self._packed_gather(
                jnp.zeros((spec_n, s, s // 8), jnp.uint8), idx0
            )

    def prewarm_pipeline(self, image) -> None:
        """Cold-start precompilation: trace+lower+compile the per-image
        device programs CONCURRENTLY, instead of discovering them serially
        inside the first `generate()` call.

        On a warm persistent compile cache the first generate() still pays
        ~137 s of host-side trace+lower (encode -> fg/sim -> engine, each
        program's cache key only exists after lowering) plus ~190 s of
        bucket prewarm — all GIL-releasing host work that threads overlap
        (PERF.md "Round 4 compile budget").  Four concurrent groups:

        - the REAL encode on `image`'s crop (its resized shape decides the
          upload bucket via `predictor.encode_bucket_hw`, so the compiled
          program matches every later call at this aspect);
        - the EPS engine on zero-filled inputs whose avals are derived
          with jax.eval_shape from the encode impl (no device work needed
          to know them; the zero sim_map makes the engine's while_loop
          exit immediately once compiled);
        - the FG-map + sim-prep programs on a zero DINO feature map;
        - `prewarm_survivors` (itself bucket-threaded).

        The RNG stream is NOT advanced (the dummy engine key comes from a
        non-persisted split), so generate() results are identical whether
        or not this ran.  HQ / train-free variants fall back to the
        survivor prewarm only (their cache layout and sim path differ).
        Harmless (only wasteful) if shapes ever drift from the real call:
        generate() would just compile the real program then."""
        if self.train_free or self.predictor.is_hq or self.crop_n_layers != 0:
            self.prewarm_survivors()
            return
        from concurrent.futures import ThreadPoolExecutor

        if not isinstance(image, np.ndarray):
            image = np.array(image, dtype=np.uint8)
        crop_box = [0, 0, image.shape[1], image.shape[0]]
        self.crop_image(image, crop_box)  # host-only: resized crop + scale
        img = self.image
        in_h, in_w = img.shape[:2]
        cfg = self.engine_cfg

        hb, wb = self.predictor.encode_bucket_hw(in_h, in_w)
        cache_avals = jax.eval_shape(
            self.predictor._encode_impl,
            self.sam.params,
            self.predictor.dino_params,
            jax.ShapeDtypeStruct((1, hb, wb, 3), jnp.uint8),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        )

        def zeros(aval):
            return jnp.zeros(aval.shape, aval.dtype)

        r = cfg.grid_size / max(in_h, in_w)
        feat_hw = (int(in_h * r), int(in_w * r))
        orig_h, orig_w = image.shape[:2]
        sub = jax.random.split(self._key)[1]  # aval match; key NOT advanced

        def warm_encode():
            self.predictor.set_image_presized(img)

        def warm_engine():
            if "dino_proj_256" in cache_avals:
                dino_proj = zeros(cache_avals["dino_proj_256"])
            else:  # vanilla-SAM fallback mirrors _dispatch_crop
                lr = cfg.low_res
                dino_proj = jnp.zeros((lr, lr, 256))
            self.engine(
                self.sam.params,
                zeros(cache_avals["features"]),
                zeros(cache_avals["dense_pe"]),
                dino_proj,
                jnp.zeros((cfg.grid_size, cfg.grid_size), jnp.float32),
                jnp.asarray(feat_hw, jnp.float32),
                jnp.asarray((in_h, in_w), jnp.float32),
                jnp.asarray(crop_box, jnp.float32),
                jnp.asarray((orig_h, orig_w), jnp.float32),
                jnp.float32(self.downscale),
                sub,
            )

        def warm_fg():
            if "dino_feats" not in cache_avals:
                return
            fg = self.predictor._fg_map_jit(
                self.sam.params, zeros(cache_avals["dino_feats"])
            )
            self._sim_prep(fg)

        with ThreadPoolExecutor(4) as ex:
            futs = [ex.submit(f) for f in
                    (warm_encode, warm_engine, warm_fg,
                     self.prewarm_survivors)]
            for f in futs:
                f.result()

    def crop_image(self, image, crop_box):
        x0, y0, x1, y1 = crop_box
        if not isinstance(image, np.ndarray):
            image = np.array(image, dtype=np.uint8)
        self.orig_image = image
        crop = image[y0:y1, x0:x1, :]
        self.image, self.downscale = resize_image(crop, self.max_size)

    def generate(self, image) -> MaskData:
        """HWC uint8 image -> MaskData (reference model.py:134-190)."""
        if not isinstance(image, np.ndarray):
            image = np.array(image, dtype=np.uint8)
        img_size = image.shape[:2]
        crop_boxes, _ = generate_crop_boxes(
            img_size, self.crop_n_layers, self.crop_overlap_ratio
        )
        data = MaskData()
        for crop_box in crop_boxes:
            crop_data = self._process_crop(image, crop_box)
            if crop_data is not None:
                data.cat(crop_data)
            self.logger.debug(f"crop area {crop_box}")

        if len(crop_boxes) > 1 and "crop_boxes" in data and len(data["boxes"]) > 0:
            crop_areas = (
                (data["crop_boxes"][:, 2] - data["crop_boxes"][:, 0])
                * (data["crop_boxes"][:, 3] - data["crop_boxes"][:, 1])
            ).astype(np.float64)
            keep = nms_indices(
                jnp.asarray(data["boxes"], dtype=jnp.float32),
                jnp.asarray(1.0 / crop_areas, dtype=jnp.float32),
                jnp.zeros(len(data["boxes"]), jnp.int32),
                self.crop_nms_thresh,
            )
            data.filter(keep)
            del data["crop_boxes"]
        if len(list(data.keys())) > 0:
            del data["iou_preds"]
        else:
            data["boxes"] = np.zeros((0, 4))
            data["scores"] = np.zeros((0, 4))
        if "rles" not in data:
            data["rles"] = []
        data.to_numpy()
        return data

    def generate_many(self, images, times_out: Optional[list] = None) -> list:
        """Pipelined multi-image inference: image k+1's device chain
        (encode + engine) is dispatched before image k's host tail (summary
        sync, survivor pass, RLE serialization) runs, so host work overlaps
        device compute.  Falls back to sequential `generate` for multi-crop
        configs.  Results match `generate` item by item (same RNG stream).

        The host tail runs on ONE worker thread (VERDICT r4 #3): the fetch
        wait + survivor gather + RLE string building (~30-40 ms/img) come
        off the dispatch thread's critical path, and the engine blob's
        device->host copy is staged at dispatch time so the worker's fetch
        is a local read, not a fresh tunnel round trip.  A single worker
        keeps finalizes (and tail_stats) in submission order; the only
        pipeline state it touches is the per-image (res, meta) pair — the
        dispatch thread's predictor cache mutations are invisible to it.

        `times_out`: optional list; wall-clock seconds between successive
        result completions are appended (bench diagnostics — the deltas
        sum to the loop total, so per-image variance is visible)."""
        if self.crop_n_layers != 0:
            return [self.generate(im) for im in images]

        # Steady-state guarantee: compile every survivor bucket up front so
        # a fresh detection count mid-run can never eat an XLA compile
        # (VERDICT r2 #4).  One-time; ~1 s/bucket from the persistent cache.
        if len(images) > 1 and not getattr(self, "_survivors_prewarmed", False):
            self.prewarm_survivors()

        import time
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        lookahead = 2  # images in flight: hides upload + host-tail latency
        results = []
        pending = deque()
        t_last = time.time()

        def assemble(res, meta):
            data = self._finalize_crop(res, meta)
            out = MaskData()
            if data is not None:
                out.cat(data)
                del out["iou_preds"]
            else:
                out["boxes"] = np.zeros((0, 4))
                out["scores"] = np.zeros((0, 4))
            if "rles" not in out:
                out["rles"] = []
            out.to_numpy()
            return out

        def harvest_one():
            nonlocal t_last
            results.append(pending.popleft().result())
            if times_out is not None:
                now = time.time()
                times_out.append(now - t_last)
                t_last = now

        with ThreadPoolExecutor(1) as ex:
            for image in images:
                img = np.array(image, dtype=np.uint8) if not isinstance(
                    image, np.ndarray
                ) else image
                crop_box = [0, 0, img.shape[1], img.shape[0]]
                res, meta = self._dispatch_crop(img, crop_box)
                blob = res.get("host_blob")
                if blob is not None:
                    try:
                        blob.copy_to_host_async()
                    except Exception:  # backend without async D2H staging
                        pass
                pending.append(ex.submit(assemble, res, meta))
                if len(pending) > lookahead:
                    harvest_one()
            while pending:
                harvest_one()
        return results

    def _process_crop(self, image, crop_box) -> Optional[MaskData]:
        return self._finalize_crop(*self._dispatch_crop(image, crop_box))

    def _dispatch_crop(self, image, crop_box):
        """Async device chain for one crop: encode -> FG map -> engine.
        Returns (engine result handles, crop metadata) without syncing."""
        self.crop_image(image, crop_box)
        self.predictor.set_image_presized(self.image)
        orig_h, orig_w = self.orig_image.shape[:2]
        in_h, in_w = self.image.shape[:2]
        cfg = self.engine_cfg

        if not self.train_free:
            fg_logits = self.predictor.predict_fg_map()
            sim_map = self._sim_prep(fg_logits)
            r = cfg.grid_size / max(in_h, in_w)
            feat_hw = (int(in_h * r), int(in_w * r))
        else:
            from PIL import Image as PILImage

            d = self.predictor.dino_input
            stretched = np.array(
                PILImage.fromarray(self.image).resize((d, d), PILImage.BILINEAR)
            )
            sim_map = self._trainfree_sim(jnp.asarray(stretched), self.ref_feature)
            g = self.predictor.dino_grid
            feat_hw = (g, g)

        self._key, sub = jax.random.split(self._key)
        if self.predictor.is_hq:
            # HQ decode inputs: hoisted per-image HQ feature fusion + the
            # raw 256^2 DINO map (pool-then-project PWD order).
            dino_proj = {
                "hq_features": self.predictor._cache["hq_features"],
                "dino_raw": self.predictor._cache["dino_raw_256"],
            }
        else:
            dino_proj = self.predictor.dino_proj_256
            if dino_proj is None:
                r = cfg.low_res
                dino_proj = jnp.zeros((r, r, 256))
        res = self.engine(
            self.sam.params,
            self.predictor.get_image_embedding(),
            self.predictor.dense_pe,
            dino_proj,
            sim_map,
            jnp.asarray(feat_hw, jnp.float32),
            jnp.asarray((in_h, in_w), jnp.float32),
            jnp.asarray(crop_box, jnp.float32),
            jnp.asarray((orig_h, orig_w), jnp.float32),
            jnp.float32(self.downscale),
            sub,
        )
        meta = dict(crop_box=crop_box, orig_hw=(orig_h, orig_w),
                    in_hw=(in_h, in_w), downscale=self.downscale)
        return res, meta

    def _finalize_crop(self, res, meta) -> Optional[MaskData]:
        """Host tail for one dispatched crop: summary sync, bucketed
        survivor pass, RLE/box assembly."""
        cfg = self.engine_cfg
        crop_box = meta["crop_box"]
        orig_h, orig_w = meta["orig_hw"]
        in_h, in_w = meta["in_hw"]
        downscale = meta["downscale"]

        # ONE device->host round trip for everything the tail reads
        # (summary + the speculative tail's outputs): each separate
        # np.asarray costs a full ~25-30 ms round trip over the relay and
        # transfers serialize with device compute there, so the former
        # 4-fetch sequence was ~80 ms of latency per image.
        from crowdsam_tpu.pipeline.engine import (
            ENGINE_BLOB_KEYS, SURVIVOR_BLOB_KEYS, fetch_host_blob)

        fetched = fetch_host_blob(res, ENGINE_BLOB_KEYS)
        summary = fetched["summary"]
        keep = summary[:, 0] > 0.5
        n = int(keep.sum())
        # num_consumed rides in the summary blob (col 5) — int() on the
        # device scalar would force one more round trip per image.
        self.logger.debug(f"engine consumed {int(summary[0, 5])} prompts, "
                          f"{n} detections")
        if n == 0:
            if self.tail_stats is not None:
                self.tail_stats.append({"n": 0, "path": "none"})
            return None
        idx = np.nonzero(keep)[0]

        # Fast path: the engine already ran the survivor tail speculatively
        # on the top spec_survivors detections (they sort first), so no
        # second dispatch + device wait is needed when the count fits.
        # (The engine clamps the tail to its survivor-slab size for tiny
        # configs — read the actual row count, not cfg.spec_survivors.)
        spec = (res["spec_summary"].shape[0]
                if "spec_summary" in res else cfg.spec_survivors)
        if (
            "spec_summary" in res
            and n <= spec
            and np.array_equal(idx, np.arange(n))
        ):
            sp = {
                "summary": fetched["spec_summary"],
                "rle_svals": fetched.get("spec_svals"),
                "rle_cand": fetched.get("spec_cand"),
                "rle_ncol": fetched.get("spec_ncol"),
                "packed": res.get("spec_packed"),  # device; overflow only
            }
            sp_summary = sp["summary"][:n]
            if self.tail_stats is not None:
                self.tail_stats.append({"n": n, "path": "spec"})
        else:
            # Device-side survivor gather into the smallest static bucket
            # >= n, fused with the survivor pass into one dispatch;
            # transfers scale with detections, not the slab.
            bucket = next(
                b for b in self.SURVIVOR_BUCKETS + (cfg.max_keep,)
                if b >= min(n, cfg.max_keep)
            )
            idx_pad = np.zeros(bucket, dtype=np.int32)
            idx_pad[: min(n, bucket)] = idx[:bucket]

            spg = self._survivor_gathered(
                res["logits"], jnp.asarray(idx_pad),
                jnp.int32(min(n, bucket)),
                jnp.asarray((in_h, in_w), jnp.int32),
            )
            sp = fetch_host_blob(spg, SURVIVOR_BLOB_KEYS)
            sp["rle_svals"] = sp.get("rle_svals")
            sp["rle_cand"] = sp.get("rle_cand")
            sp["rle_ncol"] = sp.get("rle_ncol")
            sp["packed"] = spg["packed"]  # device; overflow only
            sp_summary = sp["summary"][: min(n, bucket)]
            if self.tail_stats is not None:
                self.tail_stats.append({"n": n, "path": bucket})
        keep2 = sp_summary[:, 0] > 0.5
        changed = sp_summary[:, 1] > 0.5
        sel = np.nonzero(keep2)[0]
        if len(sel) == 0:
            return None

        idx_final = idx[sel]
        scale = self.sam.img_size / cfg.low_res

        boxes_lr = summary[idx_final, 6:10]
        # Changed masks get boxes from the cleaned masks (model.py:437-440).
        boxes_lr = np.where(
            changed[sel][:, None], sp_summary[sel, 2:6], boxes_lr
        )
        boxes_in = boxes_lr * scale

        data = MaskData(
            iou_preds=summary[idx_final, 1],
            scores=summary[idx_final, 2],
            categories=summary[idx_final, 3].astype(np.int32),
            stability_score=summary[idx_final, 4],
            points=_uncrop_points_np(
                summary[idx_final, 10:12], crop_box, downscale
            ),
        )

        if self.output_rles:
            # Device-side RLE: the survivor pass ships Fortran-order change
            # indices (~KBs); the host only builds COCO count strings.  The
            # full-res boxes come corrected from the device too.  Masks with
            # more changes than the slot budget fall back to the bit-packed
            # bitmap (rare: noise-like masks).
            nch = sp_summary[sel, 10].astype(np.int64)
            total = in_h * in_w
            if sp.get("rle_cand") is not None:
                # Survivor-kernel path: compact per-column candidate table
                # (3 x 10-bit packed rows) + counts; decode once for all
                # masks, then build each change list (svals_from_cand).
                cand = rle_ops.unpack_cand10(
                    np.asarray(sp["rle_cand"])[sel])
                ncol = np.asarray(sp["rle_ncol"])[sel]
                maxc = self.engine_cfg.max_rle_changes
                sval_of = lambda i: rle_ops.svals_from_cand(
                    cand[i], ncol[i], in_h)
                overflow = np.nonzero(nch > maxc)[0]
            else:
                svals = np.asarray(sp["rle_svals"])[sel]
                sval_of = lambda i: svals[i, : nch[i]]
                overflow = np.nonzero(nch > svals.shape[1])[0]
            rles = []
            if len(overflow):
                packed = self._gather_packed_rows(
                    sp["packed"], sel[overflow].astype(np.int32))
                full_ov = np.unpackbits(packed, axis=-1)[
                    :, :in_h, :in_w
                ].astype(bool)
                ov_rles = rle_ops.encode_masks_coco(full_ov)
            ov_map = {int(o): r for o, r in zip(overflow, ov_rles)} if len(
                overflow
            ) else {}
            for i in range(len(sel)):
                if i in ov_map:
                    rles.append(ov_map[i])
                else:
                    rles.append(rle_ops.encode_changes_coco(
                        sval_of(i), total, (in_h, in_w)
                    ))
            data["rles"] = rles
            fr_boxes = sp_summary[sel, 6:10]
            nonempty = sp_summary[sel, 11] > 0.5
            boxes_in = np.where(
                nonempty[:, None], fr_boxes.astype(np.float64), boxes_in
            )
        else:
            data["rles"] = [None] * len(sel)
        data["boxes"] = _uncrop_boxes_np(boxes_in, crop_box, downscale)
        data["rles_info"] = [crop_box, [orig_h, orig_w]]
        data["crop_boxes"] = np.asarray([crop_box] * len(sel))
        data["fboxes"] = data["boxes"]
        return data

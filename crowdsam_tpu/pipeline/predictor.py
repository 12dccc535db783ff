"""SamPredictor: cached dual-backbone image encode + prompt-driven decode.

Behavioural contract: reference `segment_anything_cs/predictor.py`:
- `set_image` resizes (long side 1024), SAM-preprocesses, runs the SAM
  encoder, then bilinearly resizes the SAM-normalized padded tensor to
  1022^2 and runs DINOv2 on it (quirk preserved: DINOv2 sees SAM
  normalization, predictor.py:100-106);
- `predict_fg_map` = point_classifier(dino_proj(dino_feats)) upsampled to
  256^2 logits (:113-121);
- `predict` / `predict_batch` (the torch predict_torch equivalent) embed
  prompts and decode with PWD-Net outputs (:213-292).

TPU-native: both backbones + the DINO projections run inside ONE jitted
program per image; everything stays on device.  The per-image projected
DINO map for PWD-Net pooling (256^2) is computed here once (the reference
recomputes it per decode batch).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from crowdsam_tpu.models.mask_decoder_hq import MaskDecoderHQ
from crowdsam_tpu.models.sam import PIXEL_MEAN, PIXEL_STD, Sam, postprocess_masks
from crowdsam_tpu.ops.transforms import ResizeLongestSide


class SamPredictor:
    def __init__(self, sam_model: Sam, dino_model=None, dino_params=None,
                 rect_encode: bool = False):
        """dino_model/dino_params: DinoVisionTransformer + params (optional —
        the vanilla-SAM arch path runs without DINOv2).

        rect_encode (tpu.rect_encode, default off): encode only the valid
        band of non-square inputs instead of the reference's zero-padded
        square — both ViTs run rect patch grids and the feature/DINO maps
        are zero-padded back to the square frame afterwards.  ~33% encode
        FLOPs saved at the CrowdHuman 2:3 aspect.  DOCUMENTED DEVIATION
        (PARITY.md): the reference's global attention mixes the padding
        tokens into valid features, so rect features differ near the
        boundary; the parity default stays square."""
        self.model = sam_model
        self.dino_model = dino_model
        self.dino_params = dino_params
        self.is_hq = isinstance(sam_model.mask_decoder, MaskDecoderHQ)
        if rect_encode and self.is_hq:
            from crowdsam_tpu.utils.logging import get_logger

            get_logger().warning(
                "tpu.rect_encode is not supported with the HQ decoder "
                "(interm-feature fusion assumes the square frame) — "
                "falling back to square encode")
            rect_encode = False
        self.rect_encode = rect_encode
        self.transform = ResizeLongestSide(sam_model.img_size)
        # Derived static resolutions: decoder mask res = img/4 (256 for SAM's
        # 1024), DINOv2 grid = img//14 (73), DINO input = grid*14 (1022).
        self.low_res = sam_model.img_size // 4
        self.dino_grid = sam_model.img_size // 14
        self.dino_input = self.dino_grid * 14
        # Disk-backed AOT export cache (utils/aot_cache.py): warm processes
        # skip the ~20-40 s trace+lower of these per-image programs.  The
        # flax module reprs capture every closure hyperparameter (variant,
        # dtype, window layout) the input avals don't.
        from crowdsam_tpu.utils.aot_cache import aot_jit

        self._encode_jit = aot_jit(
            self._encode_impl, "encode",
            static_key=repr((sam_model, dino_model, rect_encode)))
        self._fg_map_jit = aot_jit(
            self._fg_map_impl, "fg_map",
            static_key=repr((sam_model.mask_decoder, self.low_res)))
        self._decode_jit = jax.jit(
            self._decode_impl, static_argnames=("multimask_output", "with_pad")
        )
        self.reset_image()

    # ------------------------------------------------------------------ encode
    def _encode_impl(self, params, dino_params, bucket_img, input_hw):
        """bucket_img: (1, hb, wb, 3) raw pixels, hb/wb <= S (the unpadded
        upload bucket); input_hw: (2,) valid size.  Pads to the square SAM
        frame on device."""
        s = self.model.img_size
        hb, wb = bucket_img.shape[1], bucket_img.shape[2]
        mean = jnp.asarray(PIXEL_MEAN)
        std = jnp.asarray(PIXEL_STD)
        x = (bucket_img.astype(jnp.float32) - mean) / std
        # Zero out the padding *after* normalization (reference pads the
        # normalized tensor, sam.py:163-173).
        ri = jax.lax.broadcasted_iota(jnp.int32, (hb, wb), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (hb, wb), 1)
        inside = (ri < input_hw[0]) & (ci < input_hw[1])
        x = x * inside[None, :, :, None]
        rect = self.rect_encode and (hb, wb) != (s, s)
        if (hb, wb) != (s, s) and not rect:
            x = jnp.pad(x, ((0, 0), (0, s - hb), (0, s - wb), (0, 0)))

        interm = None
        if self.is_hq:
            # HQ-SAM fuses the first global block's output (early ViT
            # feature) into its high-quality mask feature map; compute the
            # per-image fusion here, hoisted out of the per-prompt decode.
            features, interm = self.model.image_encoder.apply(
                {"params": params["image_encoder"]}, x, return_interm=True
            )
        else:
            features = self.model.image_encoder.apply(
                {"params": params["image_encoder"]}, x
            )  # (1, 64, 64, 256); rect: (1, hb/16, wb/16, 256)
        if rect:
            g = s // self.model.image_encoder.patch_size
            features = jnp.pad(
                features,
                ((0, 0), (0, g - features.shape[1]),
                 (0, g - features.shape[2]), (0, 0)),
            )

        dense_pe = self.model.prompt_encoder.apply(
            {"params": params["prompt_encoder"]},
            method=self.model.prompt_encoder.get_dense_pe,
        )  # (64, 64, 256)

        out = {"features": features, "dense_pe": dense_pe}
        if self.is_hq:
            out["hq_features"] = self.model.mask_decoder.apply(
                {"params": params["mask_decoder"]},
                features,
                interm,
                method=self.model.mask_decoder.compute_hq_features,
            )  # (1, 4h, 4w, C/8)
        if self.dino_model is not None:
            # DINOv2 on the SAM-normalized padded frame resized to 1022^2
            # (predictor.py:104-106).
            d = self.dino_input
            g = self.dino_grid
            if rect:
                # Rect DINO: the square frame's separable linear resize,
                # truncated to the rows/cols the rect band can produce.
                # Truncation is EXACT (the dropped input rows/cols are the
                # square frame's zero padding), so every patch containing
                # content sees identical pixels to the square path.  The
                # token rows beyond the band are zero-padded here where the
                # square path has DINO-of-padding values (the documented
                # rect deviation).  Pos embeddings are interpolated to the
                # square grid and cropped, keeping per-position values.
                from crowdsam_tpu.ops.resize import resize_matrix_linear

                gh_d = min(-(-int(np.ceil(hb * d / s)) // 14), g)
                gw_d = min(-(-int(np.ceil(wb * d / s)) // 14), g)
                dh, dw = gh_d * 14, gw_d * 14
                wr = jnp.asarray(resize_matrix_linear(s, d)[:dh, :hb])
                wc = jnp.asarray(resize_matrix_linear(s, d)[:dw, :wb])
                x_dino = jnp.einsum("oh,bhwc->bowc", wr, x)
                x_dino = jnp.einsum("pw,bowc->bopc", wc, x_dino)
                dres = self.dino_model.apply(
                    {"params": dino_params}, x_dino, pos_hw=(g, g)
                )
                dino_feats = dres["x_norm_patchtokens"].reshape(
                    1, gh_d, gw_d, -1
                )
                dino_feats = jnp.pad(
                    dino_feats,
                    ((0, 0), (0, g - gh_d), (0, g - gw_d), (0, 0)),
                )
            else:
                x_dino = jax.image.resize(
                    x, (1, d, d, 3), method="linear", antialias=False
                )
                dres = self.dino_model.apply({"params": dino_params}, x_dino)
                dino_feats = dres["x_norm_patchtokens"].reshape(1, g, g, -1)
            out["dino_feats"] = dino_feats
            r = self.low_res
            if self.is_hq:
                # The HQ decoder pools the RAW dino map under the mask
                # softmax and projects afterwards (mask_decoder_hq.py
                # :208-213) — cache the raw 256^2 resize instead.
                out["dino_raw_256"] = jax.image.resize(
                    dino_feats[0], (r, r, dino_feats.shape[-1]),
                    "linear", antialias=False,
                ).astype(jnp.bfloat16)
            else:
                # Hoisted PWD-Net projection at 73^2 and 256^2.
                proj = self.model.mask_decoder.apply(
                    {"params": params["mask_decoder"]},
                    dino_feats,
                    method=self.model.mask_decoder.project_dino,
                )  # (1, 73, 73, 256)
                # bf16: this map is re-read by every decode batch's PWD
                # pooling.
                out["dino_proj_256"] = jax.image.resize(
                    proj[0], (r, r, proj.shape[-1]), "linear", antialias=False
                ).astype(jnp.bfloat16)
        return out

    def set_image(self, image: np.ndarray, image_format: str = "RGB") -> None:
        """image: HWC uint8 (reference predictor.py:32-68)."""
        assert image_format in ("RGB", "BGR")
        if image_format != self.model.image_format:
            image = image[..., ::-1]
        input_image = self.transform.apply_image(image)
        self.set_image_presized(input_image)
        self.original_size = tuple(image.shape[:2])

    def encode_bucket_hw(self, h: int, w: int) -> tuple:
        """Upload-bucket shape for an input of (h, w): rect mode buckets at
        64 px (4 patch rows) so the encode tracks the valid band tightly;
        square mode keeps the coarse 256 px buckets (the pad to the square
        SAM frame happens on device either way).  Shared by
        `set_image_presized` and `CrowdSAM.prewarm_pipeline` so the
        precompiled encode program always matches the real call's shape."""
        s = self.model.img_size
        gran = 64 if self.rect_encode else 256
        return (min(-(-h // gran) * gran, s), min(-(-w // gran) * gran, s))

    def set_image_presized(self, image: np.ndarray) -> None:
        """Fast path used by the CrowdSAM pipeline: `image` is already
        resized (long side == img_size); skips the PIL resize no-op.

        The host->device transfer over the axon tunnel costs ~35 ms/MB, so
        the image is uploaded UNPADDED (rounded up to a 256px bucket to
        bound the number of compiled encode programs) and the zero pad to
        the square SAM frame happens on device — the encode already zeroes
        everything outside input_hw, so this is bit-identical."""
        self.original_size = tuple(image.shape[:2])
        self.input_size = tuple(image.shape[:2])
        hb, wb = self.encode_bucket_hw(image.shape[0], image.shape[1])
        bucket = np.zeros((hb, wb, 3), dtype=image.dtype)
        bucket[: image.shape[0], : image.shape[1]] = image
        self._cache = self._encode_jit(
            self.model.params,
            self.dino_params,
            jnp.asarray(bucket[None]),
            jnp.asarray(self.input_size, dtype=jnp.int32),
        )
        self.features = self._cache["features"]
        self.dino_feats = self._cache.get("dino_feats")
        self.is_image_set = True

    def reset_image(self) -> None:
        self.is_image_set = False
        self._cache = None
        self.features = None
        self.dino_feats = None
        self.original_size = None
        self.input_size = None

    # ------------------------------------------------------------------ fg map
    def _fg_map_impl(self, params, dino_feats):
        """(1,73,73,1024) -> (1, n_class, 256, 256) FG logits
        (reference predictor.py:113-121; NCHW at the API boundary)."""
        proj = self.model.mask_decoder.apply(
            {"params": params["mask_decoder"]},
            dino_feats,
            method=self.model.mask_decoder.project_dino,
        )
        logits = self.model.mask_decoder.apply(
            {"params": params["mask_decoder"]},
            proj,
            method=self.model.mask_decoder.classify_points,
        )  # (1, 73, 73, n_class)
        logits = jax.image.resize(
            logits.astype(jnp.float32),
            (1, 256, 256, logits.shape[-1]),
            "linear",
            antialias=False,
        )
        return logits.transpose(0, 3, 1, 2)

    def predict_fg_map(self, img_size=None) -> jnp.ndarray:
        assert self.is_image_set and self.dino_feats is not None
        return self._fg_map_jit(self.model.params, self.dino_feats)

    def predict_fg_with_prototypes(self, prototypes, img_size=None) -> jnp.ndarray:
        """Prototype-similarity FG map (reference predictor.py:123-131, the
        COCO multi-class variant): cosine of L2-normalized DINO patch tokens
        against per-class prototype means -> (1, n_class, 256, 256) logits.

        prototypes: (n_class, k, C) or (n_class, C) class prototype bank.
        """
        assert self.is_image_set and self.dino_feats is not None
        protos = jnp.asarray(prototypes)
        if protos.ndim == 3:
            protos = protos.mean(axis=1)

        @jax.jit
        def run(dino_feats, protos):
            f = dino_feats / jnp.linalg.norm(
                dino_feats, axis=-1, keepdims=True
            ).clip(1e-6)
            sim = jnp.einsum("bhwc,nc->bnhw", f, protos)
            return jax.image.resize(
                sim.astype(jnp.float32),
                (sim.shape[0], sim.shape[1], 256, 256),
                "linear", antialias=False,
            )

        return run(self.dino_feats, protos)

    # ------------------------------------------------------------------ decode
    def _decode_impl(
        self,
        params,
        features,
        dense_pe,
        extras,
        point_coords,
        point_labels,
        boxes,
        mask_input,
        multimask_output: bool,
        with_pad: bool,
    ):
        points = None
        if point_coords is not None:
            points = (point_coords, point_labels)
        sparse, dense = self.model.prompt_encoder.apply(
            {"params": params["prompt_encoder"]},
            points=points,
            boxes=boxes,
            masks=mask_input,
        )
        del with_pad  # pad is implied by boxes-None inside the encoder
        if self.is_hq:
            return self.model.mask_decoder.apply(
                {"params": params["mask_decoder"]},
                features,
                dense_pe,
                sparse,
                dense,
                multimask_output,
                hq_features=extras["hq_features"],
                dino_feats_256=extras["dino_raw_256"],
            )
        return self.model.mask_decoder.apply(
            {"params": params["mask_decoder"]},
            features,
            dense_pe,
            sparse,
            dense,
            multimask_output,
            dino_feats_proj=extras["dino_proj_256"],
        )

    def predict_batch(
        self,
        point_coords: Optional[jnp.ndarray] = None,   # (B, N, 2) in input frame
        point_labels: Optional[jnp.ndarray] = None,   # (B, N)
        boxes: Optional[jnp.ndarray] = None,          # (B, 4) in input frame
        mask_input: Optional[jnp.ndarray] = None,     # (B, 256, 256, 1)
        multimask_output: bool = True,
        return_logits: bool = False,
        return_full_masks: bool = True,
    ):
        """predict_torch equivalent (reference predictor.py:213-292).

        Returns (masks, iou_pred, cls_scores, low_res_masks); `masks` are at
        original_size when return_full_masks else None.
        """
        assert self.is_image_set
        if self.is_hq:
            extras = {
                "hq_features": self._cache["hq_features"],
                "dino_raw_256": self._cache["dino_raw_256"],
            }
        else:
            extras = {"dino_proj_256": self._cache.get("dino_proj_256")}
        low_res, iou, cls = self._decode_jit(
            self.model.params,
            self._cache["features"],
            self._cache["dense_pe"],
            extras,
            point_coords,
            point_labels,
            boxes,
            mask_input,
            multimask_output=multimask_output,
            with_pad=boxes is None,
        )
        masks = None
        if return_full_masks:
            masks = postprocess_masks(
                low_res, self.input_size, self.original_size, self.model.img_size
            )
            if not return_logits:
                masks = masks > self.model.mask_threshold
        return masks, iou, cls, low_res

    def predict(
        self,
        point_coords: Optional[np.ndarray] = None,
        point_labels: Optional[np.ndarray] = None,
        box: Optional[np.ndarray] = None,
        mask_input: Optional[np.ndarray] = None,
        multimask_output: bool = True,
        return_logits: bool = False,
    ):
        """Numpy single-prompt-set API (reference predictor.py:133-212)."""
        assert self.is_image_set, "call set_image first"
        coords_j = labels_j = box_j = mask_j = None
        if point_coords is not None:
            pc = self.transform.apply_coords(point_coords, self.original_size)
            coords_j = jnp.asarray(pc, dtype=jnp.float32)[None]
            labels_j = jnp.asarray(point_labels, dtype=jnp.int32)[None]
        if box is not None:
            b = self.transform.apply_boxes(
                np.asarray(box).reshape(-1, 4), self.original_size
            )
            box_j = jnp.asarray(b, dtype=jnp.float32)
        if mask_input is not None:
            mask_j = jnp.asarray(mask_input, dtype=jnp.float32)
            mask_j = mask_j.reshape(1, *mask_j.shape[-2:], 1)
        masks, iou, cls, low_res = self.predict_batch(
            coords_j, labels_j, box_j, mask_j,
            multimask_output=multimask_output, return_logits=return_logits,
        )
        return (
            np.asarray(masks[0]),
            np.asarray(iou[0]),
            np.asarray(low_res[0]),
            np.asarray(cls[0]),
        )

    def get_image_embedding(self) -> jnp.ndarray:
        assert self.is_image_set
        return self._cache["features"]

    @property
    def dense_pe(self):
        return self._cache["dense_pe"]

    @property
    def dino_proj_256(self):
        return self._cache.get("dino_proj_256")

"""SamAutomaticMaskGenerator: uniform-grid whole-image mask generation.

Behavioural contract: reference `segment_anything_cs/automatic_mask_generator.py`
(upstream SAM AMG, kept intact there): uniform point grid per crop, 64-point
batches, IoU + stability filters, within-crop and cross-crop NMS, small-region
cleanup, records with segmentation/area/bbox/predicted_iou/point_coords/
stability_score/crop_box; output modes binary_mask / uncompressed_rle /
coco_rle.

This is the compatibility surface for vanilla-SAM-style usage; the optimized
dense-prompt path is CrowdSAM.generate + the EPS engine.  Decoding runs
batched on device through SamPredictor; filtering/NMS happen on host via the
shared jnp ops (which also run fine on CPU).

Note: the CS-modified decoder returns 4 masks under multimask_output (the
reference modified `mask_slice` to `slice(0, None)`, mask_decoder.py:129-133),
so each point yields 4 candidates here, matching the vendored behaviour
rather than upstream SAM's 3.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from crowdsam_tpu.ops import rle as rle_ops
from crowdsam_tpu.ops.amg import (
    MaskData,
    batch_iterator,
    batched_mask_to_box,
    build_all_layer_point_grids,
    calculate_stability_score,
    generate_crop_boxes,
    uncrop_masks,
)
from crowdsam_tpu.ops.boxes import (
    box_area,
    is_box_near_crop_edge,
    uncrop_boxes_xyxy,
    uncrop_points,
)
from crowdsam_tpu.ops.nms import nms_indices
from crowdsam_tpu.pipeline.predictor import SamPredictor


def _box_xyxy_to_xywh(box):
    box = np.asarray(box, dtype=np.float64)
    return [box[0], box[1], box[2] - box[0], box[3] - box[1]]


class SamAutomaticMaskGenerator:
    def __init__(
        self,
        model,
        points_per_side: Optional[int] = 32,
        points_per_batch: int = 64,
        pred_iou_thresh: float = 0.88,
        stability_score_thresh: float = 0.95,
        stability_score_offset: float = 1.0,
        box_nms_thresh: float = 0.7,
        crop_n_layers: int = 0,
        crop_nms_thresh: float = 0.7,
        crop_overlap_ratio: float = 512 / 1500,
        crop_n_points_downscale_factor: int = 1,
        point_grids: Optional[List[np.ndarray]] = None,
        min_mask_region_area: int = 0,
        output_mode: str = "binary_mask",
        dino_model=None,
        dino_params=None,
    ) -> None:
        assert (points_per_side is None) != (point_grids is None), (
            "Exactly one of points_per_side or point_grids must be provided."
        )
        if points_per_side is not None:
            self.point_grids = build_all_layer_point_grids(
                points_per_side, crop_n_layers, crop_n_points_downscale_factor
            )
        else:
            self.point_grids = point_grids
        assert output_mode in ("binary_mask", "uncompressed_rle", "coco_rle")

        self.predictor = SamPredictor(model, dino_model, dino_params)
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.box_nms_thresh = box_nms_thresh
        self.crop_n_layers = crop_n_layers
        self.crop_nms_thresh = crop_nms_thresh
        self.crop_overlap_ratio = crop_overlap_ratio
        self.crop_n_points_downscale_factor = crop_n_points_downscale_factor
        self.min_mask_region_area = min_mask_region_area
        self.output_mode = output_mode

    def generate(self, image: np.ndarray) -> List[Dict[str, Any]]:
        mask_data = self._generate_masks(image)

        if self.min_mask_region_area > 0:
            mask_data = self.postprocess_small_regions(
                mask_data,
                self.min_mask_region_area,
                max(self.box_nms_thresh, self.crop_nms_thresh),
            )

        if self.output_mode == "coco_rle":
            mask_data["segmentations"] = [
                rle_ops.coco_encode_rle(r) for r in mask_data["rles"]
            ]
        elif self.output_mode == "binary_mask":
            mask_data["segmentations"] = [
                rle_ops.rle_to_mask(r) for r in mask_data["rles"]
            ]
        else:
            mask_data["segmentations"] = mask_data["rles"]

        curr_anns = []
        for idx in range(len(mask_data["segmentations"])):
            curr_anns.append(
                {
                    "segmentation": mask_data["segmentations"][idx],
                    "area": rle_ops.area_from_rle(mask_data["rles"][idx]),
                    "bbox": _box_xyxy_to_xywh(mask_data["boxes"][idx]),
                    "predicted_iou": float(mask_data["iou_preds"][idx]),
                    "point_coords": [mask_data["points"][idx].tolist()],
                    "stability_score": float(mask_data["stability_score"][idx]),
                    "crop_box": _box_xyxy_to_xywh(mask_data["crop_boxes"][idx]),
                }
            )
        return curr_anns

    def _generate_masks(self, image: np.ndarray) -> MaskData:
        orig_size = image.shape[:2]
        crop_boxes, layer_idxs = generate_crop_boxes(
            orig_size, self.crop_n_layers, self.crop_overlap_ratio
        )
        data = MaskData()
        for crop_box, layer_idx in zip(crop_boxes, layer_idxs):
            crop_data = self._process_crop(image, crop_box, layer_idx, orig_size)
            data.cat(crop_data)

        if len(crop_boxes) > 1:
            scores = 1 / np.asarray(box_area(jnp.asarray(
                np.asarray(data["crop_boxes"], dtype=np.float32))))
            keep = nms_indices(
                jnp.asarray(np.asarray(data["boxes"], np.float32)),
                jnp.asarray(scores),
                jnp.zeros(len(scores), jnp.int32),
                self.crop_nms_thresh,
            )
            data.filter(keep)
        data.to_numpy()
        return data

    def _process_crop(
        self, image, crop_box, crop_layer_idx, orig_size
    ) -> MaskData:
        x0, y0, x1, y1 = crop_box
        cropped_im = image[y0:y1, x0:x1, :]
        cropped_im_size = cropped_im.shape[:2]
        self.predictor.set_image(cropped_im)

        points_scale = np.array(cropped_im_size)[None, ::-1]
        points_for_image = self.point_grids[crop_layer_idx] * points_scale

        data = MaskData()
        for (points,) in batch_iterator(self.points_per_batch, points_for_image):
            batch_data = self._process_batch(
                points, cropped_im_size, crop_box, orig_size
            )
            data.cat(batch_data)
        self.predictor.reset_image()

        keep = nms_indices(
            jnp.asarray(np.asarray(data["boxes"], np.float32)),
            jnp.asarray(np.asarray(data["iou_preds"], np.float32)),
            jnp.zeros(len(data["boxes"]), jnp.int32),
            self.box_nms_thresh,
        )
        data.filter(keep)

        data["boxes"] = np.asarray(
            uncrop_boxes_xyxy(jnp.asarray(np.asarray(data["boxes"], np.float32)),
                              crop_box)
        )
        data["points"] = np.asarray(
            uncrop_points(jnp.asarray(np.asarray(data["points"], np.float32)),
                          crop_box)
        )
        data["crop_boxes"] = np.asarray([crop_box] * len(data["rles"]))
        return data

    def _process_batch(
        self, points, im_size, crop_box, orig_size
    ) -> MaskData:
        orig_h, orig_w = orig_size
        transformed = self.predictor.transform.apply_coords(points, im_size)
        in_points = jnp.asarray(transformed, dtype=jnp.float32)
        in_labels = jnp.ones((len(points), 1), jnp.int32)
        masks, iou_preds, _, _ = self.predictor.predict_batch(
            in_points[:, None, :], in_labels,
            multimask_output=True, return_logits=True,
        )
        k = masks.shape[1]
        data = MaskData(
            masks=np.asarray(masks).reshape(-1, *masks.shape[-2:]),
            iou_preds=np.asarray(iou_preds).reshape(-1),
            points=np.asarray(points).repeat(k, axis=0),
        )

        if self.pred_iou_thresh > 0.0:
            data.filter(data["iou_preds"] > self.pred_iou_thresh)

        data["stability_score"] = np.asarray(
            calculate_stability_score(
                jnp.asarray(data["masks"]),
                self.predictor.model.mask_threshold,
                self.stability_score_offset,
            )
        )
        if self.stability_score_thresh > 0.0:
            data.filter(data["stability_score"] >= self.stability_score_thresh)

        data["masks"] = data["masks"] > self.predictor.model.mask_threshold
        data["boxes"] = np.asarray(batched_mask_to_box(jnp.asarray(data["masks"])))

        keep = ~np.asarray(
            is_box_near_crop_edge(
                jnp.asarray(data["boxes"], dtype=jnp.float32), crop_box,
                [0, 0, orig_w, orig_h],
            )
        )
        if not keep.all():
            data.filter(keep)

        data["masks"] = np.asarray(
            uncrop_masks(jnp.asarray(data["masks"]), crop_box, orig_h, orig_w)
        )
        data["rles"] = rle_ops.mask_to_rle(data["masks"])
        del data["masks"]
        return data

    @staticmethod
    def postprocess_small_regions(
        mask_data: MaskData, min_area: int, nms_thresh: float
    ) -> MaskData:
        """Small-region cleanup + re-NMS (reference :323-372), using the
        on-chip connected-components op on the batched masks."""
        from crowdsam_tpu.ops.connected import remove_small_regions

        if len(mask_data["rles"]) == 0:
            return mask_data

        masks = np.stack([rle_ops.rle_to_mask(r) for r in mask_data["rles"]])
        m1, ch1 = remove_small_regions(jnp.asarray(masks), min_area, "holes")
        m2, ch2 = remove_small_regions(m1, min_area, "islands")
        changed = np.asarray(ch1 | ch2)
        new_masks = np.asarray(m2)
        scores = (~changed).astype(np.float32)
        boxes = np.asarray(batched_mask_to_box(jnp.asarray(new_masks)))
        keep = nms_indices(
            jnp.asarray(boxes.astype(np.float32)),
            jnp.asarray(scores),
            jnp.zeros(len(boxes), jnp.int32),
            nms_thresh,
        )
        mask_data["boxes"] = np.array(mask_data["boxes"])
        for i_mask in keep:
            if scores[i_mask] == 0.0:
                mask_data["rles"][i_mask] = rle_ops.mask_to_rle(
                    new_masks[i_mask][None]
                )[0]
                mask_data["boxes"][i_mask] = boxes[i_mask]
        mask_data.filter(keep)
        return mask_data

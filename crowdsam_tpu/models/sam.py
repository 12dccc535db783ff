"""Sam container: module bundle + pure preprocess/postprocess functions.

Behavioural contract: reference `segment_anything_cs/modeling/sam.py`
(pixel mean/std + bottom-right pad :163-173, two-stage mask upsampling
:132-161, mask_threshold 0.0).

Instead of an nn.Module object graph, the TPU build bundles the three
functional cores plus their parameter pytree in a light dataclass; jitted
pipeline functions close over the module definitions and take params as an
argument (so donation/sharding/partial-training masks stay trivial).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from crowdsam_tpu.models.image_encoder import ImageEncoderViT
from crowdsam_tpu.models.mask_decoder import MaskDecoder
from crowdsam_tpu.models.prompt_encoder import PromptEncoder

PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)
MASK_THRESHOLD = 0.0
IMAGE_FORMAT = "RGB"


@dataclasses.dataclass
class Sam:
    """Bundle of functional modules + params ({'image_encoder': ...,
    'prompt_encoder': ..., 'mask_decoder': ...})."""

    image_encoder: ImageEncoderViT
    prompt_encoder: PromptEncoder
    mask_decoder: MaskDecoder
    # repr=False: `repr(sam)` is used as an AOT-export static key
    # (pipeline/predictor.py) and must capture only closure hyperparameters.
    # Including the param tree would fetch EVERY tensor device->host just to
    # print it (~1.2 GB for ViT-L over the axon tunnel — tens of seconds of
    # hidden startup cost, and a hang when the tunnel readback path is down);
    # param values are traced ARGUMENTS of the exported programs, so their
    # avals are already part of the cache digest.
    params: Dict[str, Any] = dataclasses.field(repr=False)

    mask_threshold: float = MASK_THRESHOLD
    image_format: str = IMAGE_FORMAT

    @property
    def img_size(self) -> int:
        return self.image_encoder.img_size


def forward_batched(sam: "Sam", batched_input, multimask_output: bool):
    """End-to-end list-of-dicts API (reference `sam.py:52-130`).

    Each record: {'image': (H,W,3) array already ResizeLongestSide'd,
    'original_size': (h, w), optional 'point_coords' (B,N,2) /
    'point_labels' (B,N) / 'boxes' (B,4) / 'mask_inputs' (B,256,256,1)}.
    Returns a list of {'masks', 'iou_predictions', 'low_res_logits'} —
    convenience surface; SamPredictor is the efficient repeated-prompt path.
    """
    import numpy as np

    outputs = []
    for record in batched_input:
        image = np.asarray(record["image"])
        x = preprocess(jnp.asarray(image)[None], sam.img_size)
        embedding = sam.image_encoder.apply(
            {"params": sam.params["image_encoder"]}, x
        )
        points = None
        if "point_coords" in record:
            points = (
                jnp.asarray(record["point_coords"], jnp.float32),
                jnp.asarray(record["point_labels"], jnp.int32),
            )
        sparse, dense = sam.prompt_encoder.apply(
            {"params": sam.params["prompt_encoder"]},
            points=points,
            boxes=(
                jnp.asarray(record["boxes"], jnp.float32)
                if "boxes" in record else None
            ),
            masks=(
                jnp.asarray(record["mask_inputs"], jnp.float32)
                if "mask_inputs" in record else None
            ),
        )
        pe = sam.prompt_encoder.apply(
            {"params": sam.params["prompt_encoder"]},
            method=sam.prompt_encoder.get_dense_pe,
        )
        r = sam.img_size // 4
        low_res, iou_pred, _ = sam.mask_decoder.apply(
            {"params": sam.params["mask_decoder"]},
            embedding, pe, sparse, dense, multimask_output,
            dino_feats_proj=jnp.zeros((r, r, 256)),
        )
        masks = postprocess_masks(
            low_res, image.shape[:2], record["original_size"], sam.img_size
        )
        outputs.append(
            {
                "masks": masks > sam.mask_threshold,
                "iou_predictions": iou_pred,
                "low_res_logits": low_res,
            }
        )
    return outputs


def preprocess(x: jnp.ndarray, img_size: int = 1024) -> jnp.ndarray:
    """Normalize + bottom-right pad to (B, img_size, img_size, 3) float32.

    x: (B, H, W, 3) uint8/float NHWC (reference `sam.py:163-173`).
    """
    mean = jnp.asarray(PIXEL_MEAN, dtype=jnp.float32)
    std = jnp.asarray(PIXEL_STD, dtype=jnp.float32)
    x = (x.astype(jnp.float32) - mean) / std
    h, w = x.shape[1], x.shape[2]
    return jnp.pad(x, ((0, 0), (0, img_size - h), (0, img_size - w), (0, 0)))


def postprocess_masks(
    masks: jnp.ndarray,
    input_size: Tuple[int, int],
    original_size: Tuple[int, int],
    img_size: int = 1024,
) -> jnp.ndarray:
    """Low-res mask logits -> original-size logits.

    masks: (..., 256, 256).  Two-stage bilinear (256 -> img_size, strip pad,
    -> original) matching reference `sam.py:132-161` (align_corners=False ==
    half-pixel centers, jax.image 'linear' without antialiasing for upscale).
    """
    lead = masks.shape[:-2]
    x = jax.image.resize(
        masks, lead + (img_size, img_size), method="linear", antialias=False
    )
    x = x[..., : input_size[0], : input_size[1]]
    x = jax.image.resize(
        x, lead + tuple(original_size), method="linear", antialias=False
    )
    return x

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
    params: Dict[str, Any]

    mask_threshold: float = MASK_THRESHOLD
    image_format: str = IMAGE_FORMAT

    @property
    def img_size(self) -> int:
        return self.image_encoder.img_size


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

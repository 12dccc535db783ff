"""Compatibility namespace mirroring the reference package surface.

The reference exposes `from segment_anything_cs import sam_model_registry,
SamPredictor, SamAutomaticMaskGenerator` (segment_anything_cs/__init__.py:7-15).
Users migrating from the reference can `from crowdsam_tpu.segment_anything_cs
import ...` with the same names.
"""

from crowdsam_tpu.models.build import (  # noqa: F401
    build_sam,
    build_sam_vit_b,
    build_sam_vit_h,
    build_sam_vit_l,
    sam_model_registry,
)
from crowdsam_tpu.pipeline.amg_generator import SamAutomaticMaskGenerator  # noqa: F401
from crowdsam_tpu.pipeline.predictor import SamPredictor  # noqa: F401

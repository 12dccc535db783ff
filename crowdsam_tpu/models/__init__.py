"""JAX model cores: SAM ViT encoder, prompt encoder, two-way decoder with
PWD-Net heads, and DINOv2 ViT feature extractor.

All modules are flax.linen with NHWC layouts, `dtype` (compute) / f32 params,
and f32 softmax/normalization.  Parameter trees mirror the reference torch
state-dict structure so the checkpoint converter
(`crowdsam_tpu/utils/checkpoint.py`) is a pure name/layout mapping.
"""

from crowdsam_tpu.models.build import sam_model_registry, build_sam_vit_l  # noqa: F401

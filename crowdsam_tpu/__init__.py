"""crowdsam_tpu: a TPU-native (JAX/XLA/Pallas) rebuild of Crowd-SAM.

Few-shot object detection + instance segmentation annotation for crowded
scenes (Crowd-SAM, ECCV 2024).  The compute path is pure JAX — SAM ViT
image encoder, DINOv2 ViT-L/14 feature extractor, prompt encoder, two-way
mask decoder with PWD-Net heads, the Efficient Prompt Sampler decode engine,
and all detection post-processing (NMS, stability filtering, connected
components, RLE extraction) run on-device with static shapes.  The host
shell reproduces the reference's public API surface
(`sam_model_registry`, `SamPredictor`, `SamAutomaticMaskGenerator`,
`CrowdSAM.generate`) — see /root/reference (FelixCaae/CrowdSAM) for the
behavioural contract; citations in docstrings point there.
"""

from crowdsam_tpu.version import __version__

__all__ = ["__version__"]

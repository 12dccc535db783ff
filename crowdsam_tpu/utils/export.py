"""Model export for serving.

TPU-native counterpart of the reference's ONNX export wrapper
(`segment_anything_cs/utils/onnx.py`: traces the prompt encoder + mask
decoder for deployment; not wired into any tool there either).  Here the
same prompt->mask subgraph is exported as a serialized StableHLO module via
`jax.export`, which any PJRT runtime (TPU serving, IREE, XLA CPU/GPU) can
load without Python.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from crowdsam_tpu.models.sam import Sam


def build_decoder_fn(sam: Sam, num_points: int = 1, multimask: bool = True):
    """A jittable (params, features, dino_proj, coords, labels) -> (masks,
    iou, cls) prompt-decode function with static prompt shape — the same
    surface SamOnnxModel wraps (reference utils/onnx.py:16-144)."""

    def decode(params, features, dino_proj, point_coords, point_labels):
        sparse, dense = sam.prompt_encoder.apply(
            {"params": params["prompt_encoder"]},
            points=(point_coords, point_labels),
        )
        pe = sam.prompt_encoder.apply(
            {"params": params["prompt_encoder"]},
            method=sam.prompt_encoder.get_dense_pe,
        )
        return sam.mask_decoder.apply(
            {"params": params["mask_decoder"]},
            features, pe, sparse, dense, multimask,
            dino_feats_proj=dino_proj,
        )

    return decode


def export_decoder(
    sam: Sam,
    path: str,
    batch: int = 32,
    num_points: int = 1,
    multimask: bool = True,
) -> bytes:
    """Serialize the prompt-decode subgraph to StableHLO bytes (and to
    `path` if given).  Returns the serialized bytes."""
    from jax import export as jexport

    h = sam.img_size // 16
    r = sam.img_size // 4
    decode = build_decoder_fn(sam, num_points, multimask)
    args = (
        sam.params,
        jnp.zeros((1, h, h, 256), jnp.float32),
        jnp.zeros((r, r, 256), jnp.float32),
        jnp.zeros((batch, num_points, 2), jnp.float32),
        jnp.ones((batch, num_points), jnp.int32),
    )
    exported = jexport.export(jax.jit(decode))(*args)
    blob = exported.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(path_or_bytes):
    """Deserialize + return a callable running the exported module."""
    from jax import export as jexport

    if isinstance(path_or_bytes, (str,)):
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    else:
        blob = path_or_bytes
    exported = jexport.deserialize(blob)
    return exported.call

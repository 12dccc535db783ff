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


def build_serving_fn(
    sam: Sam,
    return_single_mask: bool,
    use_stability_score: bool = False,
    return_extra_metrics: bool = False,
    orig_im_size=None,
    stability_score_offset: float = 1.0,
):
    """Full `SamOnnxModel`-equivalent serving head (reference
    `segment_anything_cs/utils/onnx.py:16-144`): point AND box prompts via
    the ONNX label convention (labels 0/1 = neg/pos point, 2/3 = box
    corners, -1 = padding), optional mask prompt with `has_mask_input`
    gating, mask postprocessing to `orig_im_size`, the `num_points`
    single-mask selection reweight trick (:95-107), and the
    `return_extra_metrics` stability/area path (:135-141).

    Signature: fn(params, image_embeddings (1,h,w,C) NHWC,
                  point_coords (B,N,2), point_labels (B,N) f32,
                  mask_input (B,4h,4w,1) NHWC, has_mask_input () f32)
    -> (upscaled_masks, scores, low_res_masks) or the 5-tuple with extra
    metrics.  Deviations (documented): NHWC layouts, and `orig_im_size`
    is a STATIC (H, W) python tuple — XLA/StableHLO output shapes cannot
    depend on runtime tensor values, so one module is exported per output
    size (None keeps masks in the square `img_size` frame).
    """
    from crowdsam_tpu.models.prompt_encoder import PromptEncoder
    from crowdsam_tpu.ops.amg import calculate_stability_score
    from crowdsam_tpu.ops.transforms import get_preprocess_shape

    img_size = sam.img_size
    mask_threshold = sam.mask_threshold
    num_mask_tokens = sam.mask_decoder.num_mask_tokens

    def serve(params, image_embeddings, point_coords, point_labels,
              mask_input, has_mask_input):
        pp = {"params": params["prompt_encoder"]}
        # _embed_points per onnx.py:51-68: normalized PE zeroed at padding
        # points, plus the learned embeddings selected by label (0..3).
        coords = (point_coords + 0.5) / img_size
        pe = sam.prompt_encoder.apply(
            pp, coords.astype(jnp.float32), method=PromptEncoder._pe_encoding
        )
        lab = point_labels[..., None]
        pe = pe * (lab != -1)
        pe = pe + params["prompt_encoder"]["not_a_point_embed"][0] * (lab == -1)
        for i in range(4):
            pe = pe + params["prompt_encoder"]["point_embeddings"][i] * (lab == i)
        sparse = pe

        # _embed_masks per onnx.py:70-75: gated blend of the downscaled
        # mask embedding and the no-mask embedding.
        down = sam.prompt_encoder.apply(
            pp, mask_input, method=PromptEncoder._embed_masks
        )
        dense = has_mask_input * down + (1 - has_mask_input) * params[
            "prompt_encoder"
        ]["no_mask_embed"].reshape(1, 1, 1, -1)

        dense_pe = sam.prompt_encoder.apply(
            pp, method=sam.prompt_encoder.get_dense_pe
        )
        r = sam.img_size // 4
        dino_proj = jnp.zeros((r, r, 256), jnp.float32)
        masks, iou_pred, _cls = sam.mask_decoder.apply(
            {"params": params["mask_decoder"]},
            image_embeddings, dense_pe, sparse, dense, True,
            dino_feats_proj=dino_proj,
        )
        scores = iou_pred
        if use_stability_score:
            scores = calculate_stability_score(
                masks, mask_threshold, stability_score_offset
            ).astype(jnp.float32)

        if return_single_mask:
            # onnx.py:95-107 select_masks: token 0 is boosted out of/into
            # contention by (num_points - 2.5) * 1000 without control flow.
            num_points = point_coords.shape[1]
            reweight = jnp.asarray(
                [[1000.0] + [0.0] * (num_mask_tokens - 1)], jnp.float32
            )
            score = scores + (num_points - 2.5) * reweight
            best = jnp.argmax(score, axis=1)
            b = jnp.arange(masks.shape[0])
            masks = masks[b, best][:, None]
            scores = scores[b, best][:, None]

        # mask_postprocessing (onnx.py:77-92): low-res -> img_size^2,
        # strip the pad to the pre-padded frame, -> orig_im_size.
        n, k = masks.shape[0], masks.shape[1]
        up = jax.image.resize(
            masks.astype(jnp.float32), (n, k, img_size, img_size),
            "linear", antialias=False,
        )
        if orig_im_size is not None:
            oh, ow = int(orig_im_size[0]), int(orig_im_size[1])
            ph, pw = get_preprocess_shape(oh, ow, img_size)
            up = up[..., :ph, :pw]
            up = jax.image.resize(up, (n, k, oh, ow), "linear", antialias=False)

        if return_extra_metrics:
            stability = calculate_stability_score(
                up, mask_threshold, stability_score_offset
            ).astype(jnp.float32)
            areas = (up > mask_threshold).sum(axis=(-1, -2))
            return up, scores, stability, areas, masks
        return up, scores, masks

    return serve


def export_serving(
    sam: Sam,
    path: str = "",
    batch: int = 1,
    num_points: int = 1,
    return_single_mask: bool = True,
    use_stability_score: bool = False,
    return_extra_metrics: bool = False,
    orig_im_size=None,
) -> bytes:
    """Serialize the SamOnnxModel-equivalent serving head to StableHLO."""
    from jax import export as jexport

    h = sam.img_size // 16
    r = sam.img_size // 4
    fn = build_serving_fn(
        sam, return_single_mask, use_stability_score, return_extra_metrics,
        orig_im_size,
    )
    args = (
        sam.params,
        jnp.zeros((1, h, h, 256), jnp.float32),
        jnp.zeros((batch, num_points, 2), jnp.float32),
        jnp.zeros((batch, num_points), jnp.float32),
        jnp.zeros((batch, r, r, 1), jnp.float32),
        jnp.zeros((), jnp.float32),
    )
    exported = jexport.export(jax.jit(fn))(*args)
    blob = exported.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


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

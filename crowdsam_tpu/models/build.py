"""SAM model registry + builders.

Behavioural contract: reference `segment_anything_cs/build_sam.py`
(vit_h/vit_l/vit_b configs :14-45, common skeleton :104-158; checkpoints are
loaded non-strict so PWD-Net weights may be absent).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from crowdsam_tpu.models.image_encoder import ImageEncoderViT
from crowdsam_tpu.models.mask_decoder import MaskDecoder
from crowdsam_tpu.models.prompt_encoder import PromptEncoder
from crowdsam_tpu.models.sam import Sam


def _build_sam(
    encoder_embed_dim: int,
    encoder_depth: int,
    encoder_num_heads: int,
    encoder_global_attn_indexes: Tuple[int, ...],
    n_class: int = 1,
    checkpoint: Optional[str] = None,
    dtype: Any = jnp.bfloat16,
    seed: int = 0,
    image_size: int = 1024,
    dino_dim: int = 1024,
    hq: bool = False,
) -> Sam:
    prompt_embed_dim = 256
    vit_patch_size = 16
    image_embedding_size = image_size // vit_patch_size

    image_encoder = ImageEncoderViT(
        img_size=image_size,
        patch_size=vit_patch_size,
        embed_dim=encoder_embed_dim,
        depth=encoder_depth,
        num_heads=encoder_num_heads,
        mlp_ratio=4.0,
        out_chans=prompt_embed_dim,
        qkv_bias=True,
        use_rel_pos=True,
        window_size=14,
        global_attn_indexes=tuple(encoder_global_attn_indexes),
        dtype=dtype,
    )
    prompt_encoder = PromptEncoder(
        embed_dim=prompt_embed_dim,
        image_embedding_size=(image_embedding_size, image_embedding_size),
        input_image_size=(image_size, image_size),
        mask_in_chans=16,
        dtype=dtype,
    )
    if hq:
        from crowdsam_tpu.models.mask_decoder_hq import MaskDecoderHQ

        mask_decoder = MaskDecoderHQ(
            transformer_dim=prompt_embed_dim,
            num_multimask_outputs=3,
            iou_head_depth=3,
            iou_head_hidden_dim=256,
            n_class=n_class,
            vit_dim=encoder_embed_dim,
            dino_dim=dino_dim,
            dtype=dtype,
        )
    else:
        mask_decoder = MaskDecoder(
            transformer_dim=prompt_embed_dim,
            num_multimask_outputs=3,
            iou_head_depth=3,
            iou_head_hidden_dim=256,
            n_class=n_class,
            dino_dim=dino_dim,
            dtype=dtype,
        )

    if checkpoint is not None:
        from crowdsam_tpu.utils.checkpoint import load_sam_checkpoint

        params = load_sam_checkpoint(
            checkpoint,
            encoder_depth=encoder_depth,
            n_class=n_class,
            hq=hq,
        )
    else:
        params = init_sam_params(
            image_encoder, prompt_encoder, mask_decoder, seed=seed, hq=hq,
            dino_dim=dino_dim,
        )

    return Sam(
        image_encoder=image_encoder,
        prompt_encoder=prompt_encoder,
        mask_decoder=mask_decoder,
        params=params,
    )


def init_sam_params(image_encoder, prompt_encoder, mask_decoder, seed: int = 0,
                    hq: bool = False, dino_dim: int = 1024):
    """Random-init parameter pytree with the same structure the checkpoint
    converter produces (shape-only via eval_shape, so ViT-L is instant)."""
    from crowdsam_tpu.utils.init import fast_random_init

    img = jnp.zeros(
        (1, image_encoder.img_size, image_encoder.img_size, 3), jnp.float32
    )
    enc = fast_random_init(image_encoder, img, seed=seed)
    pts = (jnp.zeros((1, 1, 2), jnp.float32), jnp.ones((1, 1), jnp.int32))
    h = image_encoder.img_size // image_encoder.patch_size
    # Init with a mask prompt too so the mask_downscaling conv params exist
    # (flax only creates params on traced paths; the converter always
    # produces them, and the serving export exercises the mask path).
    pe = fast_random_init(
        prompt_encoder, seed=seed + 1, points=pts,
        masks=jnp.zeros((1, 4 * h, 4 * h, 1), jnp.float32),
    )
    if hq:
        dec = fast_random_init(
            mask_decoder,
            jnp.zeros((1, h, h, 256), jnp.float32),
            jnp.zeros((h, h, 256), jnp.float32),
            jnp.zeros((1, 2, 256), jnp.float32),
            jnp.zeros((1, h, h, 256), jnp.float32),
            jnp.zeros((4 * h, 4 * h, dino_dim), jnp.float32),
            jnp.zeros((1, h, h, image_encoder.embed_dim), jnp.float32),
            seed=seed + 2,
            method=mask_decoder.init_all,
        )
        return {"image_encoder": enc, "prompt_encoder": pe, "mask_decoder": dec}
    dec = fast_random_init(
        mask_decoder,
        jnp.zeros((1, h, h, 256), jnp.float32),
        jnp.zeros((h, h, 256), jnp.float32),
        jnp.zeros((1, 2, 256), jnp.float32),
        jnp.zeros((1, h, h, 256), jnp.float32),
        True,
        seed=seed + 2,
        dino_feats_proj=jnp.zeros((4 * h, 4 * h, 256), jnp.float32),
    )
    # dino_proj is only exercised through the `project_dino` method, so the
    # shape-only init above misses it; add it explicitly.
    import numpy as np

    rng = np.random.default_rng(seed + 3)
    d = mask_decoder.transformer_dim
    dec["dino_proj"] = {
        "kernel": jnp.asarray(
            rng.normal(0, 0.02, (mask_decoder.dino_dim, d)).astype(np.float32)
        ),
        "bias": jnp.zeros((d,), jnp.float32),
    }
    return {"image_encoder": enc, "prompt_encoder": pe, "mask_decoder": dec}


def build_sam_vit_h(checkpoint=None, n_class: int = 1, **kw) -> Sam:
    return _build_sam(1280, 32, 16, (7, 15, 23, 31), n_class, checkpoint, **kw)


def build_sam_vit_l(checkpoint=None, n_class: int = 1, **kw) -> Sam:
    return _build_sam(1024, 24, 16, (5, 11, 17, 23), n_class, checkpoint, **kw)


def build_sam_vit_b(checkpoint=None, n_class: int = 1, **kw) -> Sam:
    return _build_sam(768, 12, 12, (2, 5, 8, 11), n_class, checkpoint, **kw)


def build_sam_vit_tiny(checkpoint=None, n_class: int = 1, **kw) -> Sam:
    """Small test/dev config (not the reference's TinyViT mobile_sam)."""
    kw.setdefault("image_size", 256)
    return _build_sam(64, 2, 2, (1,), n_class, checkpoint, **kw)


def build_sam_vit_t(
    checkpoint=None,
    n_class: int = 1,
    dtype: Any = jnp.bfloat16,
    seed: int = 0,
    image_size: int = 1024,
    dino_dim: int = 1024,
    hq: bool = False,
) -> Sam:
    """MobileSAM: TinyViT-5M encoder + standard SAM prompt/mask stages
    (reference `build_sam.py:47-93` — an arch the reference configures but
    cannot run: `TinyViT` is never imported there and lives in the external
    `mobile_sam` package; here it is first-party, models/tiny_vit.py).

    Deviation (documented): the reference vit_t uses the vanilla MaskDecoder
    and its mobile_sam arch path strict-loads the PWD adapter into it
    (crowdsam/model.py:107 — crashes on real adapters); we use the PWD-Net
    decoder so the full CrowdSAM pipeline works with this encoder too."""
    if hq:
        import warnings

        warnings.warn(
            "build_sam_vit_t has no HQ decoder variant; hq=True is ignored "
            "and the standard PWD-Net MaskDecoder is built instead "
            "(sam_arch: sam_hq is incompatible with a vit_t/mobile sam_model)",
            stacklevel=2,
        )
    del hq  # no HQ variant of the TinyViT arch
    from crowdsam_tpu.models.tiny_vit import TinyViT

    prompt_embed_dim = 256
    image_embedding_size = image_size // 16
    image_encoder = TinyViT(img_size=image_size, dtype=dtype)
    prompt_encoder = PromptEncoder(
        embed_dim=prompt_embed_dim,
        image_embedding_size=(image_embedding_size, image_embedding_size),
        input_image_size=(image_size, image_size),
        mask_in_chans=16,
        dtype=dtype,
    )
    mask_decoder = MaskDecoder(
        transformer_dim=prompt_embed_dim,
        num_multimask_outputs=3,
        iou_head_depth=3,
        iou_head_hidden_dim=256,
        n_class=n_class,
        dino_dim=dino_dim,
        dtype=dtype,
    )
    if checkpoint is not None:
        from crowdsam_tpu.utils.checkpoint import load_sam_checkpoint

        params = load_sam_checkpoint(
            checkpoint, encoder_depth=image_encoder.depth,
            n_class=n_class, tiny=True,
        )
    else:
        params = init_sam_params(
            image_encoder, prompt_encoder, mask_decoder, seed=seed,
            dino_dim=dino_dim,
        )
    return Sam(
        image_encoder=image_encoder,
        prompt_encoder=prompt_encoder,
        mask_decoder=mask_decoder,
        params=params,
    )


build_sam = build_sam_vit_h

sam_model_registry = {
    "default": build_sam_vit_h,
    "vit_h": build_sam_vit_h,
    "vit_l": build_sam_vit_l,
    "vit_b": build_sam_vit_b,
    "vit_t": build_sam_vit_t,
    "vit_tiny": build_sam_vit_tiny,
}

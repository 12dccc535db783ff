"""Checkpoint conversion (torch .pth -> JAX pytree) and native save/load.

Handles the three reference checkpoints (SURVEY.md §7):
- `sam_vit_l_0b3195.pth`-style SAM weights (image_encoder/prompt_encoder/
  mask_decoder prefixes; loaded non-strict like reference `build_sam.py:157`
  so PWD-Net keys may be absent),
- `dinov2_vitl14_pretrain.pth` DINOv2 weights,
- `10_shot.pth` adapter saves (a bare mask_decoder state dict, reference
  `tools/train.py:312`), overlaid non-strict onto the decoder.

Layout rules:
- torch Linear weight (out, in)          -> kernel (in, out)      [transpose]
- torch Conv2d weight (out, in, kh, kw)  -> kernel (kh, kw, in, out)
- torch ConvTranspose2d k2s2 (in, out, 2, 2)
      -> ConvTranspose2x2 dense kernel (in, 2*2*out), bias tiled 4x
- LayerNorm / LayerNorm2d weight+bias    -> weight/bias unchanged

Native checkpoints use flax.serialization msgpack.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from flax import serialization, traverse_util


# ---------------------------------------------------------------------------
# torch-side helpers
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().numpy() for k, v in sd.items()}


def _lin(sd, key):
    """torch Linear -> {'kernel','bias'} (bias optional)."""
    out = {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].T)}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _conv(sd, key):
    """torch Conv2d -> {'kernel','bias'} NHWC."""
    out = {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].transpose(2, 3, 1, 0))}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _convT2x2(sd, key):
    """torch ConvTranspose2d(k=2,s=2) -> ConvTranspose2x2 dense params."""
    w = sd[f"{key}.weight"]  # (in, out, 2, 2)
    cin, cout = w.shape[0], w.shape[1]
    kernel = np.ascontiguousarray(
        w.transpose(0, 2, 3, 1).reshape(cin, 4 * cout)
    )
    out = {"dense": {"kernel": kernel}}
    if f"{key}.bias" in sd:
        out["dense"]["bias"] = np.tile(sd[f"{key}.bias"], 4)
    return out


def _ln(sd, key):
    return {"weight": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _conv_bn(sd, key, eps: float = 1e-5):
    """torch Conv2d_BN (conv w/o bias + BatchNorm2d) -> folded biased conv.

    Inference-only fold: w' = w * gamma/sqrt(var+eps), b' = beta - mean *
    gamma/sqrt(var+eps).  Exact for eval-mode BN."""
    w = sd[f"{key}.c.weight"]
    g = sd[f"{key}.bn.weight"]
    b = sd[f"{key}.bn.bias"]
    m = sd[f"{key}.bn.running_mean"]
    v = sd[f"{key}.bn.running_var"]
    scale = g / np.sqrt(v + eps)
    kernel = np.ascontiguousarray(
        (w * scale[:, None, None, None]).transpose(2, 3, 1, 0)
    )
    return {
        "kernel": kernel.astype(np.float32),
        "bias": (b - m * scale).astype(np.float32),
    }


# ---------------------------------------------------------------------------
# SAM component converters
# ---------------------------------------------------------------------------

def convert_image_encoder(sd: Dict[str, np.ndarray], depth: int) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    p["patch_embed"] = _conv(sd, "patch_embed.proj")
    if "pos_embed" in sd:
        p["pos_embed"] = sd["pos_embed"]
    for i in range(depth):
        b = f"blocks.{i}"
        attn = _lin(sd, f"{b}.attn.qkv")
        attn = {"qkv": attn, "proj": _lin(sd, f"{b}.attn.proj")}
        if f"{b}.attn.rel_pos_h" in sd:
            attn["rel_pos_h"] = sd[f"{b}.attn.rel_pos_h"]
            attn["rel_pos_w"] = sd[f"{b}.attn.rel_pos_w"]
        p[f"blocks_{i}"] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "attn": attn,
            "norm2": _ln(sd, f"{b}.norm2"),
            "mlp": {
                "lin1": _lin(sd, f"{b}.mlp.lin1"),
                "lin2": _lin(sd, f"{b}.mlp.lin2"),
            },
        }
    p["neck_0"] = {"kernel": sd["neck.0.weight"].transpose(2, 3, 1, 0)}
    p["neck_1"] = _ln(sd, "neck.1")
    p["neck_2"] = {"kernel": sd["neck.2.weight"].transpose(2, 3, 1, 0)}
    p["neck_3"] = _ln(sd, "neck.3")
    return p


def convert_tiny_vit(
    sd: Dict[str, np.ndarray], depths=(2, 2, 6, 2)
) -> Dict[str, Any]:
    """MobileSAM TinyViT state dict -> models/tiny_vit.py params.

    All Conv2d_BN pairs fold into biased convs (`_conv_bn`); the
    `attention_biases` compact tables copy verbatim (the static offset
    index map is rebuilt identically in the module); the buffer
    `attention_bias_idxs` is ignored.  Key layout follows the public
    mobile_sam `TinyViT` (patch_embed.seq.{0,2}, layers.N.blocks.M,
    layers.N.downsample, neck.{0..3})."""
    p: Dict[str, Any] = {}
    p["patch_embed_0"] = _conv_bn(sd, "patch_embed.seq.0")
    p["patch_embed_2"] = _conv_bn(sd, "patch_embed.seq.2")
    for i in range(depths[0]):
        b = f"layers.0.blocks.{i}"
        p[f"layers_0_blocks_{i}"] = {
            c: _conv_bn(sd, f"{b}.{c}") for c in ("conv1", "conv2", "conv3")
        }
    for s in range(1, len(depths)):
        for i in range(depths[s]):
            b = f"layers.{s}.blocks.{i}"
            p[f"layers_{s}_blocks_{i}"] = {
                "attn": {
                    "norm": _ln(sd, f"{b}.attn.norm"),
                    "qkv": _lin(sd, f"{b}.attn.qkv"),
                    "proj": _lin(sd, f"{b}.attn.proj"),
                    "attention_biases": sd[f"{b}.attn.attention_biases"],
                },
                "local_conv": _conv_bn(sd, f"{b}.local_conv"),
                "mlp_norm": _ln(sd, f"{b}.mlp.norm"),
                "fc1": _lin(sd, f"{b}.mlp.fc1"),
                "fc2": _lin(sd, f"{b}.mlp.fc2"),
            }
    for s in range(len(depths) - 1):
        d = f"layers.{s}.downsample"
        p[f"layers_{s}_downsample"] = {
            c: _conv_bn(sd, f"{d}.{c}") for c in ("conv1", "conv2", "conv3")
        }
    p["neck_0"] = {"kernel": sd["neck.0.weight"].transpose(2, 3, 1, 0)}
    p["neck_1"] = _ln(sd, "neck.1")
    p["neck_2"] = {"kernel": sd["neck.2.weight"].transpose(2, 3, 1, 0)}
    p["neck_3"] = _ln(sd, "neck.3")
    return p


def convert_prompt_encoder(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    p: Dict[str, Any] = {
        "pe_gaussian": sd["pe_layer.positional_encoding_gaussian_matrix"],
        "point_embeddings": np.concatenate(
            [sd[f"point_embeddings.{i}.weight"] for i in range(4)], axis=0
        ),
        "not_a_point_embed": sd["not_a_point_embed.weight"],
        "no_mask_embed": sd["no_mask_embed.weight"],
    }
    p["mask_down_0"] = _conv(sd, "mask_downscaling.0")
    p["mask_down_1"] = _ln(sd, "mask_downscaling.1")
    p["mask_down_3"] = _conv(sd, "mask_downscaling.3")
    p["mask_down_4"] = _ln(sd, "mask_downscaling.4")
    p["mask_down_6"] = _conv(sd, "mask_downscaling.6")
    return p


def _convert_twoway_attention(sd, key):
    return {
        "q_proj": _lin(sd, f"{key}.q_proj"),
        "k_proj": _lin(sd, f"{key}.k_proj"),
        "v_proj": _lin(sd, f"{key}.v_proj"),
        "out_proj": _lin(sd, f"{key}.out_proj"),
    }


def _convert_mlp_head(sd, key, num_layers):
    return {
        f"layers_{i}": _lin(sd, f"{key}.layers.{i}") for i in range(num_layers)
    }


def convert_mask_decoder(
    sd: Dict[str, np.ndarray],
    transformer_depth: int = 2,
    num_mask_tokens: int = 4,
) -> Dict[str, Any]:
    """Converts whatever decoder keys exist (non-strict by construction:
    adapter checkpoints may carry only a subset)."""
    p: Dict[str, Any] = {}
    if "iou_token.weight" in sd:
        p["iou_token"] = sd["iou_token.weight"]
    if "mask_tokens.weight" in sd:
        p["mask_tokens"] = sd["mask_tokens.weight"]

    if any(k.startswith("transformer.") for k in sd):
        t: Dict[str, Any] = {}
        for i in range(transformer_depth):
            b = f"transformer.layers.{i}"
            t[f"layers_{i}"] = {
                "self_attn": _convert_twoway_attention(sd, f"{b}.self_attn"),
                "norm1": _ln(sd, f"{b}.norm1"),
                "cross_attn_token_to_image": _convert_twoway_attention(
                    sd, f"{b}.cross_attn_token_to_image"
                ),
                "norm2": _ln(sd, f"{b}.norm2"),
                "mlp": {
                    "lin1": _lin(sd, f"{b}.mlp.lin1"),
                    "lin2": _lin(sd, f"{b}.mlp.lin2"),
                },
                "norm3": _ln(sd, f"{b}.norm3"),
                "cross_attn_image_to_token": _convert_twoway_attention(
                    sd, f"{b}.cross_attn_image_to_token"
                ),
                "norm4": _ln(sd, f"{b}.norm4"),
            }
        t["final_attn_token_to_image"] = _convert_twoway_attention(
            sd, "transformer.final_attn_token_to_image"
        )
        t["norm_final_attn"] = _ln(sd, "transformer.norm_final_attn")
        p["transformer"] = t

    if "output_upscaling.0.weight" in sd:
        p["upscale_0"] = _convT2x2(sd, "output_upscaling.0")
        p["upscale_1"] = _ln(sd, "output_upscaling.1")
        p["upscale_3"] = _convT2x2(sd, "output_upscaling.3")
    for i in range(num_mask_tokens + 1):
        if f"output_hypernetworks_mlps.{i}.layers.0.weight" in sd:
            p[f"hyper_mlps_{i}"] = _convert_mlp_head(
                sd, f"output_hypernetworks_mlps.{i}", 3
            )
    if "iou_prediction_head.layers.0.weight" in sd:
        p["iou_prediction_head"] = _convert_mlp_head(sd, "iou_prediction_head", 3)
    # PWD-Net adapter heads (may be absent from the base SAM checkpoint).
    if "dino_proj.weight" in sd:
        p["dino_proj"] = _lin(sd, "dino_proj")
    if "parallel_iou_head.layers.0.weight" in sd:
        p["parallel_iou_head"] = _convert_mlp_head(sd, "parallel_iou_head", 3)
    if "point_classifier.layers.0.weight" in sd:
        p["point_classifier"] = _convert_mlp_head(sd, "point_classifier", 2)
    return p


def convert_mask_decoder_hq(
    sd: Dict[str, np.ndarray], transformer_depth: int = 2
) -> Dict[str, Any]:
    """HQ decoder state dict -> MaskDecoderHQ params (shares the base
    converter for the common subtree; maps the HQ token/fusion stacks)."""
    p = convert_mask_decoder(sd, transformer_depth, num_mask_tokens=4)
    if "hf_token.weight" in sd:
        p["hf_token"] = sd["hf_token.weight"]
    if "hf_mlp.layers.0.weight" in sd:
        p["hf_mlp"] = _convert_mlp_head(sd, "hf_mlp", 3)
    if "compress_vit_feat.0.weight" in sd:
        p["compress_vit_0"] = _convT2x2(sd, "compress_vit_feat.0")
        p["compress_vit_1"] = _ln(sd, "compress_vit_feat.1")
        p["compress_vit_3"] = _convT2x2(sd, "compress_vit_feat.3")
    if "embedding_encoder.0.weight" in sd:
        p["embed_enc_0"] = _convT2x2(sd, "embedding_encoder.0")
        p["embed_enc_1"] = _ln(sd, "embedding_encoder.1")
        p["embed_enc_3"] = _convT2x2(sd, "embedding_encoder.3")
    if "embedding_maskfeature.0.weight" in sd:
        p["embed_mf_0"] = _conv(sd, "embedding_maskfeature.0")
        p["embed_mf_1"] = _ln(sd, "embedding_maskfeature.1")
        p["embed_mf_3"] = _conv(sd, "embedding_maskfeature.3")
    return p


def convert_dinov2(sd: Dict[str, np.ndarray], depth: int = 24) -> Dict[str, Any]:
    p: Dict[str, Any] = {
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "patch_embed": _conv(sd, "patch_embed.proj"),
        "norm": _ln(sd, "norm"),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        p[f"blocks_{i}"] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "attn": {
                "qkv": _lin(sd, f"{b}.attn.qkv"),
                "proj": _lin(sd, f"{b}.attn.proj"),
            },
            "ls1_gamma": sd[f"{b}.ls1.gamma"],
            "norm2": _ln(sd, f"{b}.norm2"),
            "mlp_fc1": _lin(sd, f"{b}.mlp.fc1"),
            "mlp_fc2": _lin(sd, f"{b}.mlp.fc2"),
            "ls2_gamma": sd[f"{b}.ls2.gamma"],
        }
    return p


# ---------------------------------------------------------------------------
# Top-level loaders
# ---------------------------------------------------------------------------

def _strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def overlay(base: Dict[str, Any], update: Dict[str, Any]) -> Dict[str, Any]:
    """Non-strict overlay of a (partial) converted tree onto a full param
    tree, shape-checked (mirrors torch load_state_dict(strict=False)).

    Update keys absent from the base tree are skipped — but loudly: a
    mis-rooted tree (e.g. an adapter msgpack with an extra top-level
    nesting) would otherwise load as a complete silent no-op (ADVICE r4).
    Mirrors torch load_state_dict(strict=False) reporting unexpected_keys."""
    flat_base = traverse_util.flatten_dict(base)
    flat_upd = traverse_util.flatten_dict(update)
    skipped = []
    for k, v in flat_upd.items():
        if k in flat_base:
            assert tuple(flat_base[k].shape) == tuple(np.shape(v)), (
                f"shape mismatch for {'/'.join(k)}: "
                f"{flat_base[k].shape} vs {np.shape(v)}"
            )
            flat_base[k] = np.asarray(v)
        else:
            skipped.append("/".join(map(str, k)))
    if skipped:
        import logging

        logging.getLogger("crowdsam").warning(
            "overlay: %d/%d update keys absent from the base tree and "
            "skipped (mis-rooted checkpoint?): %s%s",
            len(skipped), len(flat_upd), ", ".join(skipped[:5]),
            ", ..." if len(skipped) > 5 else "")
    return traverse_util.unflatten_dict(flat_base)


def load_sam_checkpoint(
    path: str, encoder_depth: int, n_class: int = 1, hq: bool = False,
    tiny: bool = False,
) -> Dict[str, Any]:
    """Full SAM .pth -> {'image_encoder','prompt_encoder','mask_decoder'}.

    PWD-Net heads absent from the base checkpoint stay at their converted-or-
    random values exactly like reference strict=False loading; callers that
    need them initialized must overlay onto an init tree via `overlay`.
    `hq` selects the MaskDecoderHQ converter (sam_hq arch); `tiny` selects
    the TinyViT encoder converter (mobile_sam / vit_t arch).
    """
    sd = load_torch_state_dict(path)
    conv_dec = convert_mask_decoder_hq if hq else convert_mask_decoder
    enc_sd = _strip_prefix(sd, "image_encoder.")
    enc = (
        convert_tiny_vit(enc_sd)
        if tiny
        else convert_image_encoder(enc_sd, encoder_depth)
    )
    return {
        "image_encoder": enc,
        "prompt_encoder": convert_prompt_encoder(_strip_prefix(sd, "prompt_encoder.")),
        "mask_decoder": conv_dec(_strip_prefix(sd, "mask_decoder.")),
    }


def load_adapter_checkpoint(path: str, hq: bool = False) -> Dict[str, Any]:
    """Adapter .pth (bare mask_decoder state dict) or native msgpack ->
    partial mask_decoder tree.  `hq` converts with the HQ decoder layout
    (the reference loads the same adapter strict=False into either arch,
    crowdsam/model.py:93,101)."""
    if path.endswith((".msgpack", ".flax")):
        with open(path, "rb") as f:
            return serialization.msgpack_restore(f.read())
    conv = convert_mask_decoder_hq if hq else convert_mask_decoder
    return conv(load_torch_state_dict(path))


# ---------------------------------------------------------------------------
# Native save/load
# ---------------------------------------------------------------------------

def save_pytree(path: str, tree: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tree = jax_tree_to_numpy(tree)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(tree))


def load_pytree(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def jax_tree_to_numpy(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)

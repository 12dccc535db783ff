"""Activation parity: JAX modules + checkpoint converter vs the reference's
torch modules (loaded read-only as an oracle, random torch weights)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from crowdsam_tpu.models.image_encoder import ImageEncoderViT
from crowdsam_tpu.models.mask_decoder import MaskDecoder
from crowdsam_tpu.models.prompt_encoder import PromptEncoder
from crowdsam_tpu.models.transformer import TwoWayTransformer
from crowdsam_tpu.utils import checkpoint as ckpt

from ref_oracle import load_ref_modeling

REF = load_ref_modeling()


def _sd(module):
    torch.manual_seed(0)
    for p in module.parameters():
        if p.ndim > 1:
            torch.nn.init.normal_(p, std=0.05)
        else:
            torch.nn.init.normal_(p, std=0.02)
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_image_encoder_parity():
    torch.manual_seed(1)
    tenc = REF["image_encoder"].ImageEncoderViT(
        img_size=64, patch_size=16, embed_dim=32, depth=3, num_heads=2,
        mlp_ratio=4.0, out_chans=16, qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        use_abs_pos=True, use_rel_pos=True, window_size=3,
        global_attn_indexes=(1,),
    ).eval()
    sd = _sd(tenc)

    jenc = ImageEncoderViT(
        img_size=64, patch_size=16, embed_dim=32, depth=3, num_heads=2,
        mlp_ratio=4.0, out_chans=16, window_size=3, global_attn_indexes=(1,),
        dtype=jnp.float32,
    )
    params = ckpt.convert_image_encoder(sd, depth=3)

    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tenc(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()  # NCHW
    got = np.asarray(jenc.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=2e-5, rtol=1e-4)


def test_prompt_encoder_parity():
    torch.manual_seed(2)
    tpe = REF["prompt_encoder"].PromptEncoder(
        embed_dim=32, image_embedding_size=(4, 4), input_image_size=(64, 64),
        mask_in_chans=16,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in tpe.state_dict().items()}

    jpe = PromptEncoder(
        embed_dim=32, image_embedding_size=(4, 4), input_image_size=(64, 64),
        mask_in_chans=16, dtype=jnp.float32,
    )
    params = ckpt.convert_prompt_encoder(sd)

    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 64, (3, 2, 2)).astype(np.float32)
    labels = np.array([[1, 0], [1, 1], [0, -1]], dtype=np.int32)

    with torch.no_grad():
        sp_t, de_t = tpe(
            (torch.from_numpy(pts), torch.from_numpy(labels).long()), None, None
        )
    sp_j, de_j = jpe.apply(
        {"params": params},
        points=(jnp.asarray(pts), jnp.asarray(labels)),
    )
    np.testing.assert_allclose(np.asarray(sp_j), sp_t.detach().numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(de_j), de_t.detach().numpy().transpose(0, 2, 3, 1), atol=2e-5, rtol=1e-4
    )

    # dense PE grid
    with torch.no_grad():
        pe_t = tpe.get_dense_pe().detach().numpy()  # (1, C, H, W)
    pe_j = np.asarray(jpe.apply({"params": params}, method=jpe.get_dense_pe))
    np.testing.assert_allclose(pe_j, pe_t[0].transpose(1, 2, 0), atol=2e-5, rtol=1e-4)

    # boxes path
    boxes = rng.uniform(0, 32, (2, 4)).astype(np.float32)
    boxes[:, 2:] += 16
    with torch.no_grad():
        sp_t, _ = tpe(None, torch.from_numpy(boxes), None)
    sp_j, _ = jpe.apply({"params": params}, boxes=jnp.asarray(boxes))
    np.testing.assert_allclose(np.asarray(sp_j), sp_t.detach().numpy(), atol=2e-5, rtol=1e-4)

    # mask path
    masks = rng.normal(size=(2, 1, 16, 16)).astype(np.float32)
    with torch.no_grad():
        _, de_t = tpe(None, None, torch.from_numpy(masks))
    _, de_j = jpe.apply(
        {"params": params}, masks=jnp.asarray(masks.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(de_j), de_t.detach().numpy().transpose(0, 2, 3, 1), atol=2e-5, rtol=1e-4
    )


def test_two_way_transformer_parity():
    torch.manual_seed(3)
    ttr = REF["transformer"].TwoWayTransformer(
        depth=2, embedding_dim=32, num_heads=2, mlp_dim=64,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ttr.state_dict().items()}

    jtr = TwoWayTransformer(
        depth=2, embedding_dim=32, num_heads=2, mlp_dim=64, dtype=jnp.float32
    )
    # The converter's transformer mapping lives inside convert_mask_decoder;
    # reuse it by prefixing keys.
    params = ckpt.convert_mask_decoder(
        {f"transformer.{k}": v for k, v in sd.items()}
    )["transformer"]

    rng = np.random.default_rng(2)
    img = rng.normal(size=(3, 32, 4, 4)).astype(np.float32)   # B,C,H,W
    pe = rng.normal(size=(3, 32, 4, 4)).astype(np.float32)
    tokens = rng.normal(size=(3, 6, 32)).astype(np.float32)

    with torch.no_grad():
        q_t, k_t = ttr(
            torch.from_numpy(img), torch.from_numpy(pe),
            torch.from_numpy(tokens), None,
        )
    img_seq = img.reshape(3, 32, 16).transpose(0, 2, 1)
    pe_seq = pe.reshape(3, 32, 16).transpose(0, 2, 1)
    q_j, k_j = jtr.apply(
        {"params": params},
        jnp.asarray(img_seq), jnp.asarray(pe_seq), jnp.asarray(tokens),
    )
    np.testing.assert_allclose(np.asarray(q_j), q_t.detach().numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(k_j), k_t.detach().numpy(), atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_mask_decoder_parity_full_size():
    """Full 256-dim decoder with PWD-Net heads (the reference hardcodes
    256^2 pooling shapes, so this must run at real size)."""
    torch.manual_seed(4)
    ttr = REF["transformer"].TwoWayTransformer(
        depth=2, embedding_dim=256, num_heads=8, mlp_dim=2048
    )
    tdec = REF["mask_decoder"].MaskDecoder(
        transformer_dim=256, transformer=ttr, num_multimask_outputs=3,
        n_class=1,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in tdec.state_dict().items()}

    jdec = MaskDecoder(transformer_dim=256, n_class=1, dtype=jnp.float32)
    params = ckpt.convert_mask_decoder(sd)

    rng = np.random.default_rng(3)
    p = 2
    img_embed = rng.normal(size=(1, 256, 64, 64)).astype(np.float32) * 0.5
    img_pe = rng.normal(size=(1, 256, 64, 64)).astype(np.float32) * 0.5
    sparse = rng.normal(size=(p, 2, 256)).astype(np.float32) * 0.5
    dense = rng.normal(size=(p, 256, 64, 64)).astype(np.float32) * 0.1
    dino = rng.normal(size=(1, 73, 73, 1024)).astype(np.float32) * 0.1

    with torch.no_grad():
        m_t, iou_t, cls_t = tdec(
            image_embeddings=torch.from_numpy(img_embed),
            image_pe=torch.from_numpy(img_pe),
            sparse_prompt_embeddings=torch.from_numpy(sparse),
            dense_prompt_embeddings=torch.from_numpy(dense),
            multimask_output=True,
            dino_feats=torch.from_numpy(dino),
        )

    # Hoisted per-image DINO projection: project then bilinear to 256^2
    # (numerically identical to the in-decoder recompute, mask_decoder.py:187-188).
    import jax

    dino_proj_w = params["dino_proj"]["kernel"]
    dino_proj_b = params["dino_proj"]["bias"]
    proj = jnp.asarray(dino[0]) @ dino_proj_w + dino_proj_b  # (73, 73, 256)
    proj256 = jax.image.resize(proj, (256, 256, 256), "linear", antialias=False)

    m_j, iou_j, cls_j = jdec.apply(
        {"params": params},
        jnp.asarray(img_embed.transpose(0, 2, 3, 1)),
        jnp.asarray(img_pe[0].transpose(1, 2, 0)),
        jnp.asarray(sparse),
        jnp.asarray(dense.transpose(0, 2, 3, 1)),
        True,
        dino_feats_proj=proj256,
    )
    np.testing.assert_allclose(np.asarray(m_j), m_t.detach().numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(iou_j), iou_t.detach().numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(cls_j), cls_t.detach().numpy(), atol=2e-4, rtol=1e-3)


def test_rel_pos_interp_matches_reference():
    """Rect encode runs global blocks at grids below the parameter's native
    resolution; the table interpolation must match reference get_rel_pos
    (F.interpolate mode='linear', image_encoder.py:292-322)."""
    from crowdsam_tpu.models.image_encoder import _rel_pos_table

    torch.manual_seed(3)
    table = torch.randn(127, 16)  # native 64-grid table
    for size in (43, 48, 64):
        want = REF["image_encoder"].get_rel_pos(size, size, table).numpy()
        got = np.asarray(_rel_pos_table(jnp.asarray(table.numpy()), size))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_rect_global_attention_parity():
    """Global attention on a rectangular token grid (h != w) matches the
    reference Attention bit-for-bit-ish, including the interpolated
    rel-pos tables (rect-encode support)."""
    from crowdsam_tpu.models.image_encoder import Attention

    torch.manual_seed(4)
    tattn = REF["image_encoder"].Attention(
        dim=32, num_heads=2, qkv_bias=True, use_rel_pos=True,
        input_size=(8, 8),
    ).eval()
    sd = _sd(tattn)
    params = {
        "qkv": {"kernel": sd["qkv.weight"].T, "bias": sd["qkv.bias"]},
        "proj": {"kernel": sd["proj.weight"].T, "bias": sd["proj.bias"]},
        "rel_pos_h": sd["rel_pos_h"],
        "rel_pos_w": sd["rel_pos_w"],
    }
    jattn = Attention(dim=32, num_heads=2, qkv_bias=True, use_rel_pos=True,
                      input_size=(8, 8), dtype=jnp.float32)
    x = np.random.default_rng(5).normal(size=(2, 5, 8, 32)).astype(np.float32)
    with torch.no_grad():
        want = tattn(torch.from_numpy(x)).numpy()
    got = np.asarray(jattn.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_rect_image_encoder_parity_no_abs_pos():
    """Full encoder on a rect input (windowed + global + neck) vs the torch
    oracle.  use_abs_pos=False because the reference adds its square
    pos_embed unconditionally and cannot forward rect inputs; the abs-pos
    crop is covered by the square parity test + the slicing being a no-op
    at full size."""
    torch.manual_seed(6)
    tenc = REF["image_encoder"].ImageEncoderViT(
        img_size=64, patch_size=16, embed_dim=32, depth=3, num_heads=2,
        mlp_ratio=4.0, out_chans=16, qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        use_abs_pos=False, use_rel_pos=True, window_size=3,
        global_attn_indexes=(1,),
    ).eval()
    sd = _sd(tenc)

    jenc = ImageEncoderViT(
        img_size=64, patch_size=16, embed_dim=32, depth=3, num_heads=2,
        mlp_ratio=4.0, out_chans=16, window_size=3, global_attn_indexes=(1,),
        use_abs_pos=False, dtype=jnp.float32,
    )
    params = ckpt.convert_image_encoder(sd, depth=3)

    # 48x64 input -> 3x4 patch grid (rect), window 3 pads rows 3 -> 3, cols
    # 4 -> 6: exercises rect window partition AND the rect global block.
    x = np.random.default_rng(7).normal(size=(1, 48, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tenc(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(jenc.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=2e-5,
                               rtol=1e-4)

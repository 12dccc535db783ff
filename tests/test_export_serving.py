"""Serving-head parity vs the reference's SamOnnxModel (torch oracle).

The reference wrapper (`segment_anything_cs/utils/onnx.py:16-144`) is
loaded read-only and driven with the SAME random torch weights our
converter maps into the JAX modules, covering the full input surface:
point prompts with padding (-1) and box-corner (2/3) labels, gated mask
prompts, the num_points single-mask reweight trick, `orig_im_size`
resizing, stability-score output, and the extra-metrics path.

As shipped, the reference wrapper is dead code AND incompatible with the
modified 3-tuple decoder (`masks, scores = predict_masks(...)` at
onnx.py:124 unpacks a 3-tuple -> ValueError); the oracle shims the decoder
back to the 2-tuple surface the wrapper expects.  `calculate_stability_
score` is recreated in torch (reference amg.py:156-176) because the
reference amg module imports cv2 (absent here).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from crowdsam_tpu.models.mask_decoder import MaskDecoder
from crowdsam_tpu.models.prompt_encoder import PromptEncoder
from crowdsam_tpu.utils import checkpoint as ckpt
from crowdsam_tpu.utils.export import build_serving_fn, export_serving, load_exported

from ref_oracle import load_ref_modeling

REF = load_ref_modeling()


def _torch_stability(masks, mask_threshold, threshold_offset):
    """Reference amg.py:156-176 (int32 sums)."""
    intersections = (
        (masks > (mask_threshold + threshold_offset))
        .sum(-1, dtype=torch.int32).sum(-1, dtype=torch.int32)
    )
    unions = (
        (masks > (mask_threshold - threshold_offset))
        .sum(-1, dtype=torch.int32).sum(-1, dtype=torch.int32)
    )
    return intersections / unions


def _load_sam_onnx_model():
    src = open("/root/reference/segment_anything_cs/utils/onnx.py").read()
    src = src.replace("from ..modeling import Sam", "Sam = object")
    src = src.replace("from .amg import calculate_stability_score", "")
    ns = {"calculate_stability_score": _torch_stability}
    exec(compile(src, "ref_onnx", "exec"), ns)
    return ns["SamOnnxModel"]


class _DecoderShim(torch.nn.Module):
    """predict_masks 2-tuple surface over the modified 3-tuple decoder."""

    def __init__(self, dec, dino):
        super().__init__()
        self.dec = dec
        self.dino = dino
        self.num_mask_tokens = dec.num_mask_tokens

    def predict_masks(self, **kw):
        m, iou, _cls = self.dec.predict_masks(dino_feats=self.dino, **kw)
        return m, iou


class _FakeSam(torch.nn.Module):
    def __init__(self, pe, dec, img_size, mask_threshold=0.0):
        super().__init__()
        self.prompt_encoder = pe
        self.mask_decoder = dec
        self.mask_threshold = mask_threshold

        class _Enc:
            pass

        self.image_encoder = _Enc()
        self.image_encoder.img_size = img_size


@pytest.fixture(scope="module")
def full_size_pair():
    """(torch SamOnnxModel factory, jax sam-like + params) with shared
    random weights at full decoder size (the reference pooling hardcodes
    256^2 shapes)."""
    torch.manual_seed(11)
    tpe = REF["prompt_encoder"].PromptEncoder(
        embed_dim=256, image_embedding_size=(64, 64),
        input_image_size=(1024, 1024), mask_in_chans=16,
    ).eval()
    ttr = REF["transformer"].TwoWayTransformer(
        depth=2, embedding_dim=256, num_heads=8, mlp_dim=2048,
    )
    tdec = REF["mask_decoder"].MaskDecoder(
        transformer_dim=256, transformer=ttr, num_multimask_outputs=3,
        n_class=1,
    ).eval()
    for p in tdec.parameters():
        if p.ndim > 1:
            torch.nn.init.normal_(p, std=0.05)
        else:
            torch.nn.init.normal_(p, std=0.02)

    pe_sd = {k: v.detach().numpy() for k, v in tpe.state_dict().items()}
    dec_sd = {k: v.detach().numpy() for k, v in tdec.state_dict().items()}
    params = {
        "prompt_encoder": ckpt.convert_prompt_encoder(pe_sd),
        "mask_decoder": ckpt.convert_mask_decoder(dec_sd),
    }

    jpe = PromptEncoder(
        embed_dim=256, image_embedding_size=(64, 64),
        input_image_size=(1024, 1024), mask_in_chans=16, dtype=jnp.float32,
    )
    jdec = MaskDecoder(transformer_dim=256, n_class=1, dtype=jnp.float32)

    class SamLike:
        img_size = 1024
        mask_threshold = 0.0
        prompt_encoder = jpe
        mask_decoder = jdec

    dino = torch.zeros(1, 73, 73, 1024)
    SamOnnxModel = _load_sam_onnx_model()
    sam_like = SamLike()
    sam_like.params = params  # for export_serving

    def make_oracle(**kw):
        fake = _FakeSam(tpe, _DecoderShim(tdec, dino), 1024)
        return SamOnnxModel(model=fake, **kw).eval()

    return make_oracle, sam_like, params


def _inputs(rng, batch=2, num_points=3):
    embed = rng.normal(0, 0.5, (1, 256, 64, 64)).astype(np.float32)
    coords = rng.uniform(0, 1024, (batch, num_points, 2)).astype(np.float32)
    # labels cover pos/neg points, box corners, and padding
    labels = np.array([[1, 2, 3], [1, 0, -1]], dtype=np.float32)[:batch, :num_points]
    mask_in = rng.normal(0, 1.0, (batch, 1, 256, 256)).astype(np.float32)
    return embed, coords, labels, mask_in


def _run_oracle(oracle, embed, coords, labels, mask_in, has_mask, orig_hw):
    with torch.no_grad():
        return [
            t.numpy() for t in oracle(
                torch.from_numpy(embed), torch.from_numpy(coords),
                torch.from_numpy(labels), torch.from_numpy(mask_in),
                torch.tensor([has_mask], dtype=torch.float32),
                torch.tensor(orig_hw, dtype=torch.float32),
            )
        ]


def _run_ours(fn, params, embed, coords, labels, mask_in, has_mask):
    out = fn(
        params,
        jnp.asarray(embed.transpose(0, 2, 3, 1)),
        jnp.asarray(coords),
        jnp.asarray(labels),
        jnp.asarray(mask_in.transpose(0, 2, 3, 1)),
        jnp.asarray(has_mask, jnp.float32),
    )
    return [np.asarray(o) for o in out]


@pytest.mark.slow
@pytest.mark.parametrize(
    "single,stab,extra,has_mask",
    [
        (True, False, False, 0.0),
        (False, False, False, 1.0),
        (True, True, False, 0.0),
        (False, False, True, 1.0),
    ],
)
def test_serving_matches_sam_onnx_model(full_size_pair, single, stab, extra,
                                        has_mask):
    make_oracle, sam_like, params = full_size_pair
    orig_hw = (600, 800)
    oracle = make_oracle(
        return_single_mask=single, use_stability_score=stab,
        return_extra_metrics=extra,
    )
    fn = build_serving_fn(
        sam_like, return_single_mask=single, use_stability_score=stab,
        return_extra_metrics=extra, orig_im_size=orig_hw,
    )
    rng = np.random.default_rng(7)
    embed, coords, labels, mask_in = _inputs(rng)

    want = _run_oracle(oracle, embed, coords, labels, mask_in, has_mask, orig_hw)
    got = _run_ours(fn, params, embed, coords, labels, mask_in, has_mask)

    assert len(want) == len(got)
    names = (["masks", "scores", "stability", "areas", "low_res"] if extra
             else ["masks", "scores", "low_res"])
    for name, w, g in zip(names, want, got):
        assert g.shape == w.shape, (name, g.shape, w.shape)
        if name == "areas":
            np.testing.assert_array_equal(g, w)
        elif name == "masks":
            # 1024^2-upscale + crop + 600x800-resize chain; bilinear kernels
            # agree to float fuzz
            np.testing.assert_allclose(g, w, atol=5e-3, rtol=1e-3)
        else:
            np.testing.assert_allclose(g, w, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_serving_export_roundtrip(full_size_pair, tmp_path):
    _make_oracle, sam_like, params = full_size_pair
    path = str(tmp_path / "serving.stablehlo")
    blob = export_serving(
        sam_like, path, batch=2, num_points=3, return_single_mask=True,
        orig_im_size=(600, 800),
    )
    assert len(blob) > 1000
    # fake sam has no .params; export_serving reads sam.params
    run = load_exported(path)
    fn = build_serving_fn(sam_like, True, orig_im_size=(600, 800))
    rng = np.random.default_rng(9)
    embed, coords, labels, mask_in = _inputs(rng)
    a = _run_ours(run, params, embed, coords, labels, mask_in, 1.0)
    b = _run_ours(fn, params, embed, coords, labels, mask_in, 1.0)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=1e-4, rtol=1e-4)

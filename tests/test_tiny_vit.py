"""TinyViT (mobile_sam / vit_t arch) tests.

The reference's `build_sam_vit_t` (build_sam.py:47-93) references a TinyViT
symbol it never imports (external mobile_sam package) — dead code upstream;
here the encoder is first-party (models/tiny_vit.py) and these tests cover
the module contract, converter round trip (BN folding), and the full
CrowdSAM pipeline with the mobile_sam arch selector.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from crowdsam_tpu.models.tiny_vit import TinyViT, _attention_bias_idxs
from crowdsam_tpu.utils.init import fast_random_init


def test_attention_bias_idxs():
    idxs = _attention_bias_idxs(3, 3)
    assert idxs.shape == (9, 9)
    # symmetric offsets: |dy|,|dx| in [0,3) -> 9 unique entries
    assert idxs.max() == 8 and idxs.min() == 0
    assert np.array_equal(idxs, idxs.T)  # |.| offsets are symmetric


def test_tiny_vit_output_shape():
    m = TinyViT(img_size=256, dtype=jnp.float32)
    params = fast_random_init(m, jnp.zeros((1, 256, 256, 3), jnp.float32))
    y = m.apply({"params": params}, jnp.zeros((1, 256, 256, 3), jnp.float32))
    # stride-1 merge into the 320-dim stage keeps the grid at img/16
    assert y.shape == (1, 16, 16, 256)
    assert m.depth == 12 and m.patch_size == 16


def test_converter_roundtrip_bn_fold():
    """A synthetic torch-layout state dict converts into the module's exact
    param tree (every leaf consumed by apply), with BN folding preserving
    the eval-mode conv+BN math."""
    torch = pytest.importorskip("torch")
    from crowdsam_tpu.utils.checkpoint import _conv_bn, convert_tiny_vit

    rng = np.random.default_rng(0)

    # --- BN fold math check on a single Conv2d_BN ---
    cin, cout = 3, 8
    w = rng.normal(0, 0.1, (cout, cin, 3, 3)).astype(np.float32)
    sd = {
        "c.c.weight": w,
        "c.bn.weight": rng.normal(1, 0.1, cout).astype(np.float32),
        "c.bn.bias": rng.normal(0, 0.1, cout).astype(np.float32),
        "c.bn.running_mean": rng.normal(0, 0.1, cout).astype(np.float32),
        "c.bn.running_var": rng.uniform(0.5, 1.5, cout).astype(np.float32),
    }
    conv = torch.nn.Conv2d(cin, cout, 3, padding=1, bias=False)
    bn = torch.nn.BatchNorm2d(cout).eval()
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        bn.weight.copy_(torch.from_numpy(sd["c.bn.weight"]))
        bn.bias.copy_(torch.from_numpy(sd["c.bn.bias"]))
        bn.running_mean.copy_(torch.from_numpy(sd["c.bn.running_mean"]))
        bn.running_var.copy_(torch.from_numpy(sd["c.bn.running_var"]))
        x = torch.from_numpy(rng.normal(0, 1, (1, cin, 8, 8)).astype(np.float32))
        ref = bn(conv(x)).numpy()
    folded = _conv_bn(sd, "c")
    import jax

    y = jax.lax.conv_general_dilated(
        np.transpose(x.numpy(), (0, 2, 3, 1)),
        folded["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + folded["bias"]
    np.testing.assert_allclose(
        np.transpose(np.asarray(y), (0, 3, 1, 2)), ref, atol=1e-4
    )

    # --- full-tree structural round trip ---
    m = TinyViT(img_size=256, dtype=jnp.float32)
    params = fast_random_init(m, jnp.zeros((1, 256, 256, 3), jnp.float32))

    def synth_sd():
        """Torch-layout random state dict matching TinyViT-5M at 256."""
        sd = {}

        def add_cb(key, ci, co, groups=1):
            sd[f"{key}.c.weight"] = rng.normal(
                0, 0.05, (co, ci // groups, 3, 3)
            ).astype(np.float32)
            for n, v in (("weight", 1.0), ("bias", 0.0),
                         ("running_mean", 0.0), ("running_var", 1.0)):
                sd[f"{key}.bn.{n}"] = np.full(co, v, np.float32)

        def add_cb1(key, ci, co):  # 1x1 conv
            sd[f"{key}.c.weight"] = rng.normal(0, 0.05, (co, ci, 1, 1)).astype(
                np.float32
            )
            for n, v in (("weight", 1.0), ("bias", 0.0),
                         ("running_mean", 0.0), ("running_var", 1.0)):
                sd[f"{key}.bn.{n}"] = np.full(co, v, np.float32)

        def add_lin(key, ci, co):
            sd[f"{key}.weight"] = rng.normal(0, 0.05, (co, ci)).astype(np.float32)
            sd[f"{key}.bias"] = np.zeros(co, np.float32)

        def add_ln(key, c):
            sd[f"{key}.weight"] = np.ones(c, np.float32)
            sd[f"{key}.bias"] = np.zeros(c, np.float32)

        dims = (64, 128, 160, 320)
        depths = (2, 2, 6, 2)
        heads = (2, 4, 5, 10)
        wins = (7, 7, 14, 7)
        add_cb("patch_embed.seq.0", 3, 32)
        add_cb("patch_embed.seq.2", 32, 64)
        for i in range(depths[0]):
            b = f"layers.0.blocks.{i}"
            h = int(dims[0] * 4.0)
            add_cb1(f"{b}.conv1", dims[0], h)
            add_cb(f"{b}.conv2", h, h, groups=h)
            add_cb1(f"{b}.conv3", h, dims[0])
        for s in range(1, 4):
            d = dims[s]
            kd = d // heads[s]
            for i in range(depths[s]):
                b = f"layers.{s}.blocks.{i}"
                add_ln(f"{b}.attn.norm", d)
                add_lin(f"{b}.attn.qkv", d, 3 * kd * heads[s])
                add_lin(f"{b}.attn.proj", kd * heads[s], d)
                sd[f"{b}.attn.attention_biases"] = np.zeros(
                    (heads[s], wins[s] * wins[s]), np.float32
                )
                add_cb(f"{b}.local_conv", d, d, groups=d)
                add_ln(f"{b}.mlp.norm", d)
                add_lin(f"{b}.mlp.fc1", d, 4 * d)
                add_lin(f"{b}.mlp.fc2", 4 * d, d)
        for s in range(3):
            k = f"layers.{s}.downsample"
            add_cb1(f"{k}.conv1", dims[s], dims[s + 1])
            add_cb(f"{k}.conv2", dims[s + 1], dims[s + 1], groups=dims[s + 1])
            add_cb1(f"{k}.conv3", dims[s + 1], dims[s + 1])
        sd["neck.0.weight"] = rng.normal(0, 0.05, (256, 320, 1, 1)).astype(
            np.float32
        )
        add_ln("neck.1", 256)
        sd["neck.2.weight"] = rng.normal(0, 0.05, (256, 256, 3, 3)).astype(
            np.float32
        )
        add_ln("neck.3", 256)
        return sd

    from crowdsam_tpu.utils.checkpoint import convert_tiny_vit
    conv = convert_tiny_vit(synth_sd())

    import jax
    ref_shapes = jax.tree.map(lambda a: tuple(a.shape), params)
    got_shapes = jax.tree.map(lambda a: tuple(np.asarray(a).shape), conv)
    assert ref_shapes == got_shapes
    # converted params run through apply
    y = m.apply({"params": conv}, jnp.zeros((1, 256, 256, 3), jnp.float32))
    assert y.shape == (1, 16, 16, 256)
    assert np.isfinite(np.asarray(y)).all()


@pytest.fixture(scope="module")
def mobile_model():
    from tests.test_pipeline import tiny_config
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM

    return CrowdSAM(tiny_config(**{
        "model.sam_arch": "mobile_sam",
        "model.sam_model": "mobilevit_t",  # 'mobile' prefix strip, model.py:105
        "model.image_size": "256",
    }))


def test_mobile_sam_generate(mobile_model, rng):
    assert type(mobile_model.sam.image_encoder).__name__ == "TinyViT"
    image = rng.integers(0, 255, (200, 256, 3), dtype=np.uint8)
    data = mobile_model.generate(image)
    assert {"boxes", "scores", "rles"} <= set(data.keys())

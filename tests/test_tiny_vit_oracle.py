"""TinyViT numerical anchor: torch oracle for the BN-folding converter.

The reference configures `vit_t` but never ships TinyViT code (its
registry entry is dead without the external `mobile_sam` package —
build_sam.py:47-93), so our first-party TinyViT (models/tiny_vit.py) had
structural tests only.  This file hand-constructs a minimal torch TinyViT
from the PUBLIC architecture definition (TinyViT arXiv 2207.10666;
MobileSAM arXiv 2306.14289: Conv2d+BN pairs, MBConv stage, window
attention with trainable symmetric-offset bias tables, local conv, MLP,
stride-1 merge into 320/448/576-dim stages) and validates
`utils/checkpoint.py::convert_tiny_vit`'s BN folding and the flax modules
numerically — per block and for a small full encoder with realistic
(non-identity) BatchNorm running statistics.
"""

import itertools

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from crowdsam_tpu.models.tiny_vit import (
    MBConv,
    PatchMerging,
    TinyViT,
    TinyViTBlock,
)
from crowdsam_tpu.utils import checkpoint as ckpt


# ---------------------------------------------------------------- torch side
class TLayerNorm2d(nn.Module):
    def __init__(self, ch, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(ch))
        self.bias = nn.Parameter(torch.zeros(ch))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class Conv2dBN(nn.Sequential):
    def __init__(self, a, b, ks=1, stride=1, pad=0, groups=1):
        super().__init__()
        self.add_module("c", nn.Conv2d(a, b, ks, stride, pad, groups=groups,
                                       bias=False))
        self.add_module("bn", nn.BatchNorm2d(b))


class TMBConv(nn.Module):
    def __init__(self, dim, expand=4.0):
        super().__init__()
        h = int(dim * expand)
        self.conv1 = Conv2dBN(dim, h, 1)
        self.conv2 = Conv2dBN(h, h, 3, 1, 1, groups=h)
        self.conv3 = Conv2dBN(h, dim, 1)
        self.act = nn.GELU()

    def forward(self, x):
        s = x
        x = self.act(self.conv1(x))
        x = self.act(self.conv2(x))
        x = self.conv3(x)
        return self.act(s + x)


class TPatchMerging(nn.Module):
    def __init__(self, dim, out):
        super().__init__()
        stride = 1 if out in (320, 448, 576) else 2
        self.conv1 = Conv2dBN(dim, out, 1)
        self.conv2 = Conv2dBN(out, out, 3, stride, 1, groups=out)
        self.conv3 = Conv2dBN(out, out, 1)
        self.act = nn.GELU()

    def forward(self, x):  # (B, C, H, W) -> (B, C', H', W')
        return self.conv3(self.act(self.conv2(self.act(self.conv1(x)))))


class TAttention(nn.Module):
    def __init__(self, dim, key_dim, num_heads, attn_ratio, resolution):
        super().__init__()
        self.num_heads = num_heads
        self.key_dim = key_dim
        self.d = int(attn_ratio * key_dim)
        self.scale = key_dim ** -0.5
        h = (key_dim * 2 + self.d) * num_heads
        self.norm = nn.LayerNorm(dim)
        self.qkv = nn.Linear(dim, h)
        self.proj = nn.Linear(self.d * num_heads, dim)
        points = list(itertools.product(range(resolution[0]),
                                        range(resolution[1])))
        offsets, idxs = {}, []
        for p1 in points:
            for p2 in points:
                off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
                if off not in offsets:
                    offsets[off] = len(offsets)
                idxs.append(offsets[off])
        self.attention_biases = nn.Parameter(
            torch.zeros(num_heads, len(offsets)))
        self.register_buffer(
            "attention_bias_idxs",
            torch.LongTensor(idxs).view(len(points), len(points)),
            persistent=False,
        )

    def forward(self, x):  # (B, N, C)
        b, n, _ = x.shape
        x = self.norm(x)
        qkv = self.qkv(x).view(b, n, self.num_heads, -1)
        q, k, v = qkv.split([self.key_dim, self.key_dim, self.d], dim=3)
        q, k, v = (t.permute(0, 2, 1, 3) for t in (q, k, v))
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn + self.attention_biases[:, self.attention_bias_idxs]
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, n, self.d * self.num_heads)
        return self.proj(x)


class TMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)
        self.act = nn.GELU()

    def forward(self, x):
        return self.fc2(self.act(self.fc1(self.norm(x))))


class TTinyViTBlock(nn.Module):
    def __init__(self, dim, resolution, num_heads, window, mlp_ratio=4.0,
                 local_conv_size=3):
        super().__init__()
        self.dim = dim
        self.resolution = resolution
        self.window = window
        self.attn = TAttention(dim, dim // num_heads, num_heads, 1.0,
                               (window, window))
        self.mlp = TMlp(dim, int(dim * mlp_ratio))
        self.local_conv = Conv2dBN(dim, dim, local_conv_size, 1,
                                   local_conv_size // 2, groups=dim)

    def forward(self, x):  # (B, L, C)
        h, w = self.resolution
        b, l, c = x.shape
        res_x = x
        if h == self.window and w == self.window:
            x = self.attn(x)
        else:
            x = x.view(b, h, w, c)
            ph = (self.window - h % self.window) % self.window
            pw = (self.window - w % self.window) % self.window
            if ph or pw:
                x = torch.nn.functional.pad(x, (0, 0, 0, pw, 0, ph))
            hp, wp = h + ph, w + pw
            nh, nw = hp // self.window, wp // self.window
            x = (x.view(b, nh, self.window, nw, self.window, c)
                 .transpose(2, 3).reshape(b * nh * nw, self.window ** 2, c))
            x = self.attn(x)
            x = (x.view(b, nh, nw, self.window, self.window, c)
                 .transpose(2, 3).reshape(b, hp, wp, c)[:, :h, :w]
                 .reshape(b, l, c))
        x = res_x + x
        x = x.transpose(1, 2).reshape(b, c, h, w)
        x = self.local_conv(x)
        x = x.view(b, c, l).transpose(1, 2)
        return x + self.mlp(x)


def _randomize(module, seed):
    """Random weights AND non-trivial BatchNorm running stats — the part
    the fold must get right."""
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.3
            m.running_var = torch.rand(m.num_features, generator=g) * 2 + 0.2
            nn.init.normal_(m.weight, 1.0, 0.3, generator=g)
            nn.init.normal_(m.bias, 0.0, 0.2, generator=g)
        elif isinstance(m, (nn.Conv2d, nn.Linear)):
            nn.init.normal_(m.weight, 0, 0.08, generator=g)
            if m.bias is not None:
                nn.init.normal_(m.bias, 0, 0.04, generator=g)
        elif isinstance(m, nn.LayerNorm):
            nn.init.normal_(m.weight, 1.0, 0.2, generator=g)
            nn.init.normal_(m.bias, 0.0, 0.1, generator=g)
    for n, p in module.named_parameters():
        if n.endswith("attention_biases"):
            nn.init.normal_(p, 0, 0.5, generator=g)
    return module.eval()


def _sd(module, prefix=""):
    return {prefix + k: v.detach().numpy()
            for k, v in module.state_dict().items()}


# -------------------------------------------------------------------- tests
def test_mbconv_bn_folding_parity():
    t = _randomize(TMBConv(16), 10)
    sd = _sd(t)
    params = {c: ckpt._conv_bn(sd, c) for c in ("conv1", "conv2", "conv3")}
    x = np.random.default_rng(0).normal(size=(2, 8, 8, 16)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(MBConv(dim=16, dtype=jnp.float32).apply(
        {"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("res,window", [((4, 4), 4), ((6, 6), 4)])
def test_tiny_vit_block_parity(res, window):
    """Window attention block — both the equal-resolution fast path and the
    pad+partition path, with the bias-table expansion."""
    dim, heads = 32, 2
    t = _randomize(TTinyViTBlock(dim, res, heads, window), 11)
    sd = _sd(t)
    params = {
        "attn": {
            "norm": ckpt._ln(sd, "attn.norm"),
            "qkv": ckpt._lin(sd, "attn.qkv"),
            "proj": ckpt._lin(sd, "attn.proj"),
            "attention_biases": sd["attn.attention_biases"],
        },
        "local_conv": ckpt._conv_bn(sd, "local_conv"),
        "mlp_norm": ckpt._ln(sd, "mlp.norm"),
        "fc1": ckpt._lin(sd, "mlp.fc1"),
        "fc2": ckpt._lin(sd, "mlp.fc2"),
    }
    h, w = res
    x = np.random.default_rng(1).normal(size=(2, h, w, dim)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x.reshape(2, h * w, dim))).numpy()
    blk = TinyViTBlock(dim=dim, num_heads=heads, window_size=window,
                       input_resolution=res, dtype=jnp.float32)
    got = np.asarray(blk.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got.reshape(2, h * w, dim), want,
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("out_dim", [64, 320])
def test_patch_merging_parity(out_dim):
    """Stride-2 merge and the MobileSAM stride-1 quirk for 320-dim."""
    t = _randomize(TPatchMerging(32, out_dim), 12)
    sd = _sd(t)
    params = {c: ckpt._conv_bn(sd, c) for c in ("conv1", "conv2", "conv3")}
    x = np.random.default_rng(2).normal(size=(1, 8, 8, 32)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(PatchMerging(out_dim=out_dim, dtype=jnp.float32).apply(
        {"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               atol=2e-5, rtol=1e-4)


def test_full_tiny_vit_parity():
    """Small full encoder through convert_tiny_vit: patch embed, MBConv
    stage, three attention stages (incl. the stride-1 merge into the
    320-dim stage), and the SAM neck."""
    img, dims, depths = 64, (16, 32, 40, 320), (1, 1, 2, 1)
    heads, windows = (2, 4, 5, 10), (4, 4, 4, 4)

    class TTiny(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = nn.Module()
            self.patch_embed.seq = nn.Sequential(
                Conv2dBN(3, dims[0] // 2, 3, 2, 1), nn.GELU(),
                Conv2dBN(dims[0] // 2, dims[0], 3, 2, 1),
            )
            res = img // 4
            self.layers = nn.ModuleList()
            self.res_per_stage = []
            for s in range(4):
                layer = nn.Module()
                if s == 0:
                    layer.blocks = nn.ModuleList(
                        [TMBConv(dims[0]) for _ in range(depths[0])])
                else:
                    layer.blocks = nn.ModuleList([
                        TTinyViTBlock(dims[s], (res, res), heads[s],
                                      windows[s])
                        for _ in range(depths[s])
                    ])
                self.res_per_stage.append(res)
                if s < 3:
                    layer.downsample = TPatchMerging(dims[s], dims[s + 1])
                    if dims[s + 1] not in (320, 448, 576):
                        res = res // 2
                self.layers.append(layer)
            self.neck = nn.Sequential(
                nn.Conv2d(dims[-1], 256, 1, bias=False),
                TLayerNorm2d(256),
                nn.Conv2d(256, 256, 3, padding=1, bias=False),
                TLayerNorm2d(256),
            )

        def forward(self, x):  # (B, 3, H, W) -> (B, 256, h, w)
            x = self.patch_embed.seq(x)
            for s, layer in enumerate(self.layers):
                if s == 0:
                    for blk in layer.blocks:
                        x = blk(x)
                else:
                    b, c, h, w = x.shape
                    t = x.flatten(2).transpose(1, 2)
                    for blk in layer.blocks:
                        t = blk(t)
                    x = t.transpose(1, 2).reshape(b, c, h, w)
                if s < 3:
                    x = layer.downsample(x)
            return self.neck(x)

    t = _randomize(TTiny(), 13)
    sd = _sd(t)
    params = ckpt.convert_tiny_vit(sd, depths=depths)

    j = TinyViT(img_size=img, embed_dims=dims, depths=depths,
                num_heads=heads, window_sizes=windows, dtype=jnp.float32)
    x = np.random.default_rng(3).normal(size=(1, img, img, 3)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(j.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.transpose(0, 2, 3, 1).shape
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               atol=5e-5, rtol=1e-4)

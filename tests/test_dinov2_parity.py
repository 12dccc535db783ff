"""DINOv2 parity vs an independent torch implementation of the public
architecture (the reference consumes DINOv2 via torch.hub; its submodule is
not vendored, so the oracle here is written directly from the public spec
with facebookresearch/dinov2 state-dict naming to exercise the converter)."""

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from crowdsam_tpu.models.dinov2 import DinoVisionTransformer
from crowdsam_tpu.utils.checkpoint import convert_dinov2


class _TorchDinoBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0, ls_init=1e-5):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.ModuleDict(
            dict(qkv=nn.Linear(dim, dim * 3), proj=nn.Linear(dim, dim))
        )
        self.ls1 = nn.ParameterDict(dict(gamma=nn.Parameter(ls_init * torch.ones(dim))))
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.ModuleDict(
            dict(fc1=nn.Linear(dim, int(dim * mlp_ratio)),
                 fc2=nn.Linear(int(dim * mlp_ratio), dim))
        )
        self.ls2 = nn.ParameterDict(dict(gamma=nn.Parameter(ls_init * torch.ones(dim))))
        self.heads = heads
        self.dim = dim

    def forward(self, x):
        b, n, _ = x.shape
        h = self.heads
        d = self.dim // h
        y = self.norm1(x)
        qkv = self.attn["qkv"](y).reshape(b, n, 3, h, d).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q @ k.transpose(-2, -1)) * d**-0.5
        a = a.softmax(dim=-1)
        y = (a @ v).transpose(1, 2).reshape(b, n, self.dim)
        y = self.attn["proj"](y)
        x = x + y * self.ls1["gamma"]
        y = self.norm2(x)
        y = self.mlp["fc2"](nn.functional.gelu(self.mlp["fc1"](y)))
        return x + y * self.ls2["gamma"]


class _TorchDino(nn.Module):
    def __init__(self, patch=4, dim=32, depth=2, heads=2, pretrain_grid=4):
        super().__init__()
        self.patch = patch
        self.patch_embed = nn.ModuleDict(
            dict(proj=nn.Conv2d(3, dim, patch, patch))
        )
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(
            torch.randn(1, pretrain_grid * pretrain_grid + 1, dim) * 0.02
        )
        self.blocks = nn.ModuleList(
            [_TorchDinoBlock(dim, heads) for _ in range(depth)]
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pretrain_grid = pretrain_grid
        self.dim = dim

    def forward_features(self, x):
        b = x.shape[0]
        x = self.patch_embed["proj"](x)  # B,C,h,w
        gh, gw = x.shape[2], x.shape[3]
        x = x.flatten(2).transpose(1, 2)
        cls_pos = self.pos_embed[:, :1]
        patch_pos = self.pos_embed[:, 1:]
        if gh * gw != patch_pos.shape[1]:
            g = self.pretrain_grid
            patch_pos = patch_pos.reshape(1, g, g, self.dim).permute(0, 3, 1, 2)
            patch_pos = nn.functional.interpolate(
                patch_pos, (gh, gw), mode="bicubic", antialias=False,
                align_corners=False,
            )
            patch_pos = patch_pos.permute(0, 2, 3, 1).reshape(1, gh * gw, self.dim)
        x = x + patch_pos
        cls = self.cls_token.expand(b, -1, -1) + cls_pos
        x = torch.cat([cls, x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return {"x_norm_clstoken": x[:, 0], "x_norm_patchtokens": x[:, 1:]}


def test_dinov2_parity_same_grid():
    torch.manual_seed(5)
    tdino = _TorchDino(patch=4, dim=32, depth=2, heads=2, pretrain_grid=4).eval()
    for p in tdino.parameters():
        if p.ndim > 1:
            nn.init.normal_(p, std=0.05)
    sd = {k: v.detach().numpy() for k, v in tdino.state_dict().items()}

    jdino = DinoVisionTransformer(
        patch_size=4, embed_dim=32, depth=2, num_heads=2,
        pretrain_img_size=16, dtype=jnp.float32,
    )
    params = convert_dinov2(sd, depth=2)

    x = np.random.default_rng(4).normal(size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        want = tdino.forward_features(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = jdino.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got["x_norm_patchtokens"]),
        want["x_norm_patchtokens"].detach().numpy(),
        atol=3e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["x_norm_clstoken"]),
        want["x_norm_clstoken"].detach().numpy(),
        atol=3e-5, rtol=1e-4,
    )


def test_dinov2_pos_interpolation_grid():
    """Interpolated-pos-embed path: 4x4 pretrain grid driven at 7x7."""
    torch.manual_seed(6)
    tdino = _TorchDino(patch=4, dim=32, depth=1, heads=2, pretrain_grid=4).eval()
    sd = {k: v.detach().numpy() for k, v in tdino.state_dict().items()}
    jdino = DinoVisionTransformer(
        patch_size=4, embed_dim=32, depth=1, num_heads=2,
        pretrain_img_size=16, dtype=jnp.float32,
    )
    params = convert_dinov2(sd, depth=1)
    x = np.random.default_rng(5).normal(size=(1, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        want = tdino.forward_features(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = jdino.apply({"params": params}, jnp.asarray(x))
    assert got["x_norm_patchtokens"].shape == (1, 49, 32)
    # pos-embed interpolation uses torch-exact bicubic resize matrices.
    np.testing.assert_allclose(
        np.asarray(got["x_norm_patchtokens"]),
        want["x_norm_patchtokens"].detach().numpy(),
        atol=5e-5, rtol=1e-3,
    )

"""Fused LayerNorm kernel: numerical agreement with the two-pass reference
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from crowdsam_tpu.ops import layernorm as lnk


def _ref(x, w, b, eps=1e-6):
    x = x.astype(np.float64)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def test_layer_norm_2d_interpret(rng, monkeypatch):
    # Force interpreter mode so the kernel logic runs on CPU.
    import functools
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    x = rng.normal(0.2, 1.0, (70, 256)).astype(np.float32)
    w = rng.normal(1.0, 0.1, (256,)).astype(np.float32)
    b = rng.normal(0.0, 0.1, (256,)).astype(np.float32)
    out = lnk.layer_norm_2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                            eps=1e-6, block_rows=16)
    np.testing.assert_allclose(np.asarray(out), _ref(x, w, b),
                               atol=2e-4, rtol=1e-3)


def test_fused_layer_norm_gating(monkeypatch):
    # Enabled by default (opt-out via env); unaligned widths and non-TPU
    # backends always fall back (these tests run on CPU -> None).
    monkeypatch.delenv("CROWDSAM_DISABLE_PALLAS_LN", raising=False)
    out = lnk.fused_layer_norm(jnp.ones((4, 128)), jnp.ones(128), jnp.zeros(128))
    assert out is None  # CPU backend
    monkeypatch.setenv("CROWDSAM_DISABLE_PALLAS_LN", "1")
    out = lnk.fused_layer_norm(jnp.ones((4, 128)), jnp.ones(128), jnp.zeros(128))
    assert out is None  # explicit opt-out
    monkeypatch.delenv("CROWDSAM_DISABLE_PALLAS_LN", raising=False)
    out = lnk.fused_layer_norm(jnp.ones((4, 100)), jnp.ones(100), jnp.zeros(100))
    assert out is None  # unaligned width

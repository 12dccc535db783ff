"""Shape-only parameter initialization via jax.eval_shape.

flax `Module.init` executes the forward pass; for ViT-L-sized models with
1024^2 inputs that is minutes on CPU and a full compile on TPU.  When no
checkpoint exists (benchmarks, tests) we only need plausibly-scaled leaves,
so we derive the shape tree abstractly and fill it numerically by name:
norm/bias-style leaves get their fixed-point values, everything else gets a
small normal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util


def fast_random_init(module, *args, seed: int = 0, scale: float = 0.02, **kwargs):
    """Returns a params tree matching module.init(...)['params'] shapes."""
    shapes = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs)
    )["params"]
    flat = traverse_util.flatten_dict(shapes)
    rng = np.random.default_rng(seed)
    out = {}
    # Reference-faithful unit-scale leaves: SAM's positional Fourier matrix
    # is `scale * randn` with scale=1 (reference prompt_encoder.py:186) and
    # its prompt/token embeddings are torch nn.Embedding defaults = N(0,1).
    # A uniform 0.02 init here leaves the PE matrix with near-zero
    # frequencies — the positional kernel is then CONSTANT across the
    # image and random-weight prompts become positionally
    # indistinguishable (every prompt decodes the same mask), which
    # poisoned every random-weight fixture through round 2.
    _UNIT = ("pe_gaussian", "point_embeddings", "not_a_point_embed",
             "no_mask_embed", "iou_token", "mask_tokens")
    for path, leaf in flat.items():
        name = path[-1]
        shape = tuple(leaf.shape)
        if name in ("bias",):
            val = np.zeros(shape, np.float32)
        elif name == "weight":  # LayerNorm-style scale
            val = np.ones(shape, np.float32)
        elif name.endswith("_gamma"):  # LayerScale
            val = np.full(shape, 1e-5, np.float32)
        elif name == "pos_embed":
            val = rng.normal(0, 0.02, shape).astype(np.float32)
        elif name in _UNIT:
            val = rng.normal(0, 1.0, shape).astype(np.float32)
        else:
            val = rng.normal(0, scale, shape).astype(np.float32)
        out[path] = jnp.asarray(val)
    return traverse_util.unflatten_dict(out)

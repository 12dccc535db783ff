"""StableHLO export round-trip of the prompt-decode subgraph."""

import numpy as np
import jax.numpy as jnp

from crowdsam_tpu.models.build import sam_model_registry
from crowdsam_tpu.utils.export import build_decoder_fn, export_decoder, load_exported


def test_export_decoder_roundtrip(tmp_path):
    sam = sam_model_registry["vit_tiny"](n_class=1, dtype=jnp.float32)
    path = str(tmp_path / "decoder.stablehlo")
    blob = export_decoder(sam, path, batch=4)
    assert len(blob) > 1000

    h = sam.img_size // 16
    r = sam.img_size // 4
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(0, 0.5, (1, h, h, 256)).astype(np.float32))
    proj = jnp.asarray(rng.normal(0, 0.5, (r, r, 256)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(0, sam.img_size, (4, 1, 2)).astype(np.float32))
    labels = jnp.ones((4, 1), jnp.int32)

    run = load_exported(path)
    masks, iou, cls = run(sam.params, feats, proj, pts, labels)

    want_masks, want_iou, want_cls = build_decoder_fn(sam)(
        sam.params, feats, proj, pts, labels
    )
    np.testing.assert_allclose(np.asarray(masks), np.asarray(want_masks),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(iou), np.asarray(want_iou),
                               atol=1e-5, rtol=1e-4)

"""Batched + mesh-sharded inference: contract and mesh/no-mesh equivalence."""

import numpy as np
import pytest

from crowdsam_tpu.parallel.eval_shard import ShardedPipeline
from crowdsam_tpu.parallel.mesh import create_mesh
from test_pipeline import tiny_config


@pytest.fixture(scope="module")
def tiny_model():
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM

    return CrowdSAM(tiny_config())


def test_generate_batch_contract(tiny_model, rng):
    sp = ShardedPipeline(tiny_model, mesh=None, batch=2)
    images = [
        rng.integers(0, 255, (200, 256, 3), dtype=np.uint8),
        rng.integers(0, 255, (128, 256, 3), dtype=np.uint8),
        rng.integers(0, 255, (256, 192, 3), dtype=np.uint8),
    ]
    results = sp.generate_batch(images)
    assert len(results) == 3
    for r in results:
        assert "boxes" in r.keys() and "scores" in r.keys()
        n = len(r["boxes"])
        if n:
            assert r["boxes"].shape == (n, 4)
            assert len(r["rles"]) == n


def test_mesh_matches_single_device(tiny_model, rng):
    """Same key stream on a 4x1 mesh and on one device -> identical output."""
    images = [
        rng.integers(0, 255, (160, 256, 3), dtype=np.uint8) for _ in range(4)
    ]
    import jax

    # generate_batch consumes the MODEL's RNG stream (the generate_many
    # item-by-item contract) — reset it between the two runs.
    key0 = tiny_model._key
    sp1 = ShardedPipeline(tiny_model, mesh=None, batch=4)
    r1 = sp1.generate_batch(images)
    tiny_model._key = key0
    mesh = create_mesh((4, 1))
    sp2 = ShardedPipeline(tiny_model, mesh=mesh, batch=4)
    r2 = sp2.generate_batch(images)
    for a, b in zip(r1, r2):
        assert len(a["boxes"]) == len(b["boxes"])
        if len(a["boxes"]):
            np.testing.assert_allclose(a["boxes"], b["boxes"], atol=1e-3)
            np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-4)


def test_batched_matches_single_path(tiny_model, rng):
    """The batched tail (change-list RLEs + overflow fallback + full-res
    box refinement) must agree with CrowdSAM.generate on the same images:
    identical RLE strings and near-identical boxes/scores.  (The batched
    engine uses the XLA spec tail and vmapped cores, so tiny numeric
    drift in boxes is tolerated; RLEs come from the same binarization.)"""
    images = [
        rng.integers(0, 255, (128, 192, 3), dtype=np.uint8) for _ in range(2)
    ]
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM

    m1 = CrowdSAM(tiny_config())
    singles = [m1.generate(im) for im in images]
    m2 = CrowdSAM(tiny_config())
    sp = ShardedPipeline(m2, mesh=None, batch=2)
    batched = sp.generate_batch(images)
    for a, b in zip(singles, batched):
        assert len(a["boxes"]) == len(b["boxes"])
        if len(a["boxes"]):
            np.testing.assert_allclose(a["boxes"], b["boxes"], atol=1e-2)
            np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-4)
            assert a["rles"] == b["rles"]


def test_composed_data_x_prompt_sharding(tiny_model, rng):
    """COMPOSED BASELINE.json configs[4] layout (VERDICT r4 #8): images
    data-parallel over 'data' AND each image's prompt batches sharded over
    'model' in the SAME mesh program — output must equal the single-device
    batched path on the same key stream."""
    images = [
        rng.integers(0, 255, (160, 256, 3), dtype=np.uint8) for _ in range(4)
    ]
    key0 = tiny_model._key
    sp1 = ShardedPipeline(tiny_model, mesh=None, batch=4)
    r1 = sp1.generate_batch(images)
    tiny_model._key = key0
    mesh = create_mesh((4, 2))
    sp2 = ShardedPipeline(tiny_model, mesh=mesh, batch=4,
                          prompt_axis="model")
    r2 = sp2.generate_batch(images)
    total = 0
    for a, b in zip(r1, r2):
        assert len(a["boxes"]) == len(b["boxes"])
        total += len(a["boxes"])
        if len(a["boxes"]):
            np.testing.assert_allclose(a["boxes"], b["boxes"], atol=1e-3)
            np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-4)
            assert a["rles"] == b["rles"]
    assert total >= 1, "no detections — equivalence vacuous"

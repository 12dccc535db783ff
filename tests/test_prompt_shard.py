"""Prompt-axis sharded EPS engine == single-chip engine (VERDICT r3 #8).

Runs the full pipeline twice on the virtual 8-device CPU mesh — once with
the stock single-device engine, once with `install_prompt_sharding` over a
4-way 'model' axis — and asserts identical detections.  The sharded engine
must preserve the EPS semantics exactly: same candidate order (replicated
RNG), same occupancy pruning (collective OR == the single-chip OR over the
full 32-prompt batch), same NMS survivors.
"""

import numpy as np
import pytest

from crowdsam_tpu.parallel.mesh import create_mesh
from crowdsam_tpu.parallel.prompt_shard import install_prompt_sharding
from test_pipeline import tiny_config


@pytest.fixture(scope="module")
def images(rng_module=None):
    rng = np.random.default_rng(3)
    return [rng.integers(0, 255, (160, 256, 3), dtype=np.uint8)
            for _ in range(2)]


def _generate_all(model, images):
    outs = []
    for im in images:
        d = model.generate(im)
        outs.append(d)
    return outs


def test_prompt_sharded_matches_single(images):
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM

    m1 = CrowdSAM(tiny_config())
    singles = _generate_all(m1, images)

    m2 = CrowdSAM(tiny_config())
    mesh = create_mesh((1, 4))  # ('data', 'model')
    install_prompt_sharding(m2, mesh)
    shardeds = _generate_all(m2, images)

    for a, b in zip(singles, shardeds):
        assert len(a["boxes"]) == len(b["boxes"])
        if len(a["boxes"]):
            np.testing.assert_allclose(a["boxes"], b["boxes"], atol=1e-2)
            np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-4)
            assert a["rles"] == b["rles"]
            np.testing.assert_array_equal(a["categories"], b["categories"])


def test_prompt_sharding_rejects_indivisible_batch():
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM

    model = CrowdSAM(tiny_config(**{"test.points_per_batch": 6}))
    mesh = create_mesh((1, 4))
    with pytest.raises(AssertionError):
        install_prompt_sharding(model, mesh)

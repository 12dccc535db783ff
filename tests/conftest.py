"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 XLA CPU devices (SURVEY.md §4).  Must run before jax
initializes, hence the env mutation at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize pins jax_platforms to "axon,cpu" regardless of the
# env var; override it through the config API before any backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def ten_shot_root(tmp_path_factory):
    """Synthetic 10-shot COCO fixture set (utils/fixtures.py) — the tests'
    stand-in for the reference's bundled crowdhuman_train/ data."""
    from crowdsam_tpu.utils.fixtures import generate_ten_shot

    root = tmp_path_factory.mktemp("tenshot")
    return generate_ten_shot(str(root))

"""Cross-validate the device-accelerated deviation probe
(utils/deviation_probe.py) against the all-numpy reference loop oracle
(ref_loop_oracle.py) on the tiny CPU model.

The probe exists to measure PARITY.md deviations #1/#3/#6/#7 under the
trained fixture on TPU (tools/probe_deviations_trained.py), where the
numpy oracle's per-batch 128 MB logit transfers are infeasible.  Its
parity mode must therefore reproduce oracle mode="parity" and its
full-exact mode oracle mode="exact" detection-for-detection — otherwise
the probe would be measuring its own bugs, not the deviations."""

import dataclasses

import jax
import numpy as np
import pytest
from flax import traverse_util as tu

from crowdsam_tpu.pipeline.crowdsam import CrowdSAM
from crowdsam_tpu.pipeline.engine import make_eps_engine
from crowdsam_tpu.utils.deviation_probe import ALL_PARTS, DeviationProbe

from ref_loop_oracle import oracle_generate
from test_e2e_oracle import _structured_image, oracle_config


def _amp(params, rules):
    flat = tu.flatten_dict(params, sep="/")
    for k in list(flat):
        for pat, f in rules:
            if pat in k:
                flat[k] = flat[k] * f
    return tu.unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})


@pytest.fixture(scope="module")
def model():
    """Same amplified tiny model as test_e2e_oracle (see its docstring):
    varied, partial, prompt-dependent random-weight masks so the filters,
    occupy pruning, NMS, and cleanup are all exercised."""
    m = CrowdSAM(oracle_config())
    m.sam.params["prompt_encoder"] = _amp(
        m.sam.params["prompt_encoder"],
        [("pe_gaussian", 8.0), ("point_embeddings", 8.0)])
    m.sam.params["mask_decoder"] = _amp(
        m.sam.params["mask_decoder"],
        [("hyper_mlps", 6.0), ("upscale_3", 8.0)])
    m.engine_cfg = dataclasses.replace(m.engine_cfg, mask_threshold=28.0)
    m.engine = make_eps_engine(
        m.sam.prompt_encoder, m.sam.mask_decoder, m.engine_cfg,
        spec_with_masks=m.output_rles)
    m._build_survivor_programs()
    return m


def _sorted(scores):
    return np.argsort(-np.asarray(scores), kind="stable")


def _assert_matches(p, o, tag, box_atol):
    assert p["num_consumed"] == o["num_consumed"], (
        f"{tag}: probe consumed {p['num_consumed']}, "
        f"oracle {o['num_consumed']}")
    assert p["n_prenms"] == len(o["prenms"]["iou"]), (
        f"{tag}: probe pre-NMS {p['n_prenms']}, "
        f"oracle {len(o['prenms']['iou'])}")
    n_p, n_o = len(p["boxes"]), len(o["boxes"])
    assert n_p == n_o, f"{tag}: probe {n_p} detections, oracle {n_o}"
    if n_p == 0:
        return 0
    pi, oi = _sorted(p["scores"]), _sorted(o["scores"])
    np.testing.assert_allclose(
        np.asarray(p["scores"])[pi], o["scores"][oi], atol=2e-4,
        err_msg=f"{tag}: scores")
    np.testing.assert_array_equal(
        np.asarray(p["categories"])[pi], o["categories"][oi],
        err_msg=f"{tag}: categories")
    np.testing.assert_allclose(
        np.asarray(p["stability"])[pi], o["stability"][oi], atol=1e-4,
        err_msg=f"{tag}: stability")
    np.testing.assert_allclose(
        np.asarray(p["boxes"])[pi], o["boxes"][oi], atol=box_atol,
        err_msg=f"{tag}: boxes")
    return n_p


@pytest.mark.slow
def test_probe_parity_matches_oracle_parity(model, rng):
    total = 0
    for t in range(2):
        image = _structured_image(rng, 160 + 16 * t, 256)
        sub = jax.random.split(model._key)[1]
        probe = DeviationProbe(model)
        probe.SLAB = 32
        p = probe.generate(image, sub, parts=())
        o = oracle_generate(model, image, sub, mode="parity")
        total += _assert_matches(p, o, f"trial {t} parity", box_atol=0.5)
    assert total >= 3, f"only {total} detections across trials — vacuous"


@pytest.fixture(scope="module")
def bound_model():
    """test_e2e_oracle's bound_model recipe: lower mask threshold and the
    stability/pred-IoU filters off — image-resolution stability on
    knife-edge random-weight masks collapses to ~0, so exact mode yields
    zero detections under the strict fixture (see its docstring)."""
    m = CrowdSAM(oracle_config(**{
        "test.pred_iou_thresh": "0.0",
        "test.stability_score_thresh": "0.0",
    }))
    m.sam.params["prompt_encoder"] = _amp(
        m.sam.params["prompt_encoder"],
        [("pe_gaussian", 8.0), ("point_embeddings", 8.0)])
    m.sam.params["mask_decoder"] = _amp(
        m.sam.params["mask_decoder"],
        [("hyper_mlps", 6.0), ("upscale_3", 8.0)])
    m.engine_cfg = dataclasses.replace(m.engine_cfg, mask_threshold=20.0)
    m.engine = make_eps_engine(
        m.sam.prompt_encoder, m.sam.mask_decoder, m.engine_cfg,
        spec_with_masks=m.output_rles)
    m._build_survivor_programs()
    return m


@pytest.mark.slow
def test_probe_exact_matches_oracle_exact(bound_model, rng):
    model = bound_model
    total = 0
    for t in range(2):
        image = _structured_image(rng, 160 + 16 * t, 256)
        sub = jax.random.split(model._key)[1]
        probe = DeviationProbe(model)
        probe.SLAB = 32
        p = probe.generate(image, sub, parts=ALL_PARTS)
        o = oracle_generate(model, image, sub, mode="exact")
        total += _assert_matches(p, o, f"trial {t} exact", box_atol=1.0)
    assert total >= 3, f"only {total} detections across trials — vacuous"

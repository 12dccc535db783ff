"""Pin the shipped engine defaults to the documented values.

Round-2 regression (VERDICT r2, weak #2): commit 5f04a71 moved the
`EngineConfig.spec_survivors` dataclass default 16 -> 32, but
`CrowdSAM.__init__` overrode it with a hard-coded `tpucfg.get(...,16)`,
so every real entry point (bench.py, tools, ShardedPipeline) silently
kept running at 16 and crowded images missed the in-engine speculative
tail.  This test builds the pipeline exactly the way the tools do (from
a config file) and asserts the engine config that actually ships.
"""

import dataclasses

from crowdsam_tpu.config import load_config, modify_config
from crowdsam_tpu.pipeline.crowdsam import CrowdSAM
from crowdsam_tpu.pipeline.engine import EngineConfig


def _small_cfg(path="configs/crowdhuman.yaml"):
    # Shrink the models so CrowdSAM.__init__ is cheap on CPU; the tpu/test
    # sections under test are untouched.
    return modify_config(load_config(path), [
        "model.sam_model", "vit_tiny",
        "model.dino_model", "dinov2_vits14",
        "model.sam_checkpoint", "",
        "model.dino_checkpoint", "",
        "model.sam_adapter_checkpoint", "",
    ])


def test_shipped_engine_defaults_match_dataclass():
    model = CrowdSAM(_small_cfg())
    cfg = model.engine_cfg

    # The headline one: the speculative in-engine survivor tail must cover
    # the CrowdHuman-average detection count (~22-27) by default.
    assert cfg.spec_survivors == EngineConfig.spec_survivors == 32

    # Reference-contract thresholds from configs/crowdhuman.yaml.
    assert cfg.box_nms_thresh == 0.65
    assert cfg.points_per_batch == 32
    assert cfg.max_prompts == 500
    assert cfg.min_mask_region_area == 100

    # TPU-knob defaults (config.py DEFAULTS["tpu"] + dataclass).
    assert cfg.fused_decode is True
    assert cfg.fullres_cleanup is False
    assert cfg.accumulate_occupy is False
    assert cfg.max_keep == EngineConfig.max_keep
    assert cfg.max_rle_changes == EngineConfig.max_rle_changes


def test_callsite_defaults_track_dataclass_defaults():
    """Any EngineConfig field the CrowdSAM callsite sources from the tpu
    config section with a literal fallback must agree with the dataclass
    default, so a future dataclass-only change cannot silently not ship
    (cc_max_iters is the documented exception: DEFAULTS['tpu'] sets 256)."""
    model = CrowdSAM(_small_cfg())
    defaults = {f.name: f.default for f in dataclasses.fields(EngineConfig)}
    for name in ("spec_survivors", "fused_decode", "fullres_cleanup",
                 "accumulate_occupy"):
        assert getattr(model.engine_cfg, name) == defaults[name], name


def test_tpu_section_override_still_wins():
    cfg = _small_cfg()
    cfg["tpu"]["spec_survivors"] = 8
    model = CrowdSAM(cfg)
    assert model.engine_cfg.spec_survivors == 8

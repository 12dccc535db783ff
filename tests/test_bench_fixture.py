"""Trained bench-fixture cache precedence (VERDICT r3 #5).

Committed weights (adapter_weights/, in git) load before the machine-local
data/ cache, which loads before train-on-miss — so a fresh driver machine
never pays the ~8 min on-chip training when the repo ships the weights.
"""

import numpy as np
import pytest

from crowdsam_tpu.utils import bench_fixture as bf
from crowdsam_tpu.utils.checkpoint import save_pytree


class _FakePredictor:
    rect_encode = False


class _FakeSam:
    def __init__(self):
        self.params = {"mask_decoder": None}


class _FakeModel:
    def __init__(self):
        self.sam = _FakeSam()
        self.predictor = _FakePredictor()


def _tree(v):
    return {"w": np.full((2, 2), v, np.float32)}


def test_committed_beats_local_cache(tmp_path, monkeypatch):
    committed = tmp_path / "committed.msgpack"
    local = tmp_path / "local.msgpack"
    save_pytree(str(committed), {"mask_decoder": _tree(1.0)})
    save_pytree(str(local), {"mask_decoder": _tree(2.0)})
    monkeypatch.setattr(bf, "committed_path_for",
                        lambda s, lr, r="": str(committed))

    model = _FakeModel()
    meta = bf.train_or_load_decoder(model, cache_path=str(local))
    assert meta["trained_cache"] == "committed"
    assert float(np.asarray(model.sam.params["mask_decoder"]["w"][0, 0])) == 1.0


def test_local_cache_when_no_committed(tmp_path, monkeypatch):
    local = tmp_path / "local.msgpack"
    save_pytree(str(local), {"mask_decoder": _tree(2.0)})
    monkeypatch.setattr(bf, "committed_path_for",
                        lambda s, lr, r="": str(tmp_path / "missing.msgpack"))

    model = _FakeModel()
    meta = bf.train_or_load_decoder(model, cache_path=str(local))
    assert meta["trained_cache"] == "hit"
    assert float(np.asarray(model.sam.params["mask_decoder"]["w"][0, 0])) == 2.0


def test_cache_keys_disambiguate_recipes():
    a = bf.committed_path_for(800, 2e-4, "")
    b = bf.committed_path_for(800, 2e-4, "tpu.rect_encode=True")
    c = bf.committed_path_for(2000, 2e-4, "tpu.rect_encode=True")
    assert len({a, b, c}) == 3
    assert a.startswith("adapter_weights")
    # data/ and adapter_weights/ keys line up for the same recipe
    assert bf.cache_path_for(2000, 2e-4, "x").split("/")[-1] == \
        bf.committed_path_for(2000, 2e-4, "x").split("/")[-1]

"""bench.py crash diagnosability (VERDICT r3 #3).

The r3 driver bench crashed with rc=1 and a raw traceback — zero JSON, so
the artifact of record recorded nothing about the stage, fixture, or config
that failed.  These tests fault-inject every measurement stage and assert
the process still emits ONE parseable JSON line carrying the stage name,
the error, and any partial results — and that a rect-path failure
automatically retries the whole measurement square.

All CPU: the heavy pieces (model build, fixture training, timed loops) are
monkeypatched out; what is under test is the bench harness control flow.
"""

import json

import pytest

import bench


class _FakeModel:
    def __init__(self):
        self.tail_stats = None
        self._key = None  # swapped by the golden gate's pinned-PRNG pass
        # run_measurement snapshots the pre-fixture decoder for canary reuse.
        self.sam = type("S", (), {"params": {"mask_decoder": {}}})()

    def generate(self, img):
        # 3 boxes: the golden gate's self-AP ceiling is (n-1)/n = 2/3,
        # above its 0.5 low-signal cutoff.
        return {"boxes": [[0, 0, 4, 4], [10, 10, 14, 14], [20, 0, 24, 4]],
                "scores": [0.9, 0.8, 0.7]}

    def generate_many(self, imgs, times_out=None):
        if times_out is not None:
            times_out.extend([0.1] * len(imgs))
        self.tail_stats = [{"n": 1, "path": "spec"} for _ in imgs]
        return [{"boxes": [[0, 0, 4, 4]], "scores": [0.9]} for _ in imgs]

    def prewarm_survivors(self):
        pass

    def prewarm_pipeline(self, img):
        self.prewarm_survivors()

    def crop_image(self, img, box):
        pass

    def _dispatch_crop(self, img, box):
        return {"summary": 0}, {}

    def _finalize_crop(self, res, meta):
        return {"boxes": [[0, 0, 1, 1]]}


class _FakePredictor:
    def set_image_presized(self, img):
        pass

    def get_image_embedding(self):
        return 0


def _patch_happy_path(monkeypatch):
    import numpy as np

    fake = _FakeModel()
    fake.predictor = _FakePredictor()
    fake.image = None
    img = np.zeros((8, 8, 3), dtype=np.uint8)

    monkeypatch.setattr(bench, "_wait_backend", lambda: 0.0)
    monkeypatch.setattr(bench, "_build_model", lambda rect: fake)
    monkeypatch.setattr(
        bench, "_canary",
        lambda iters=5, model=None, pristine_decoder=None: {
            "dispatch_median_ms": 1.0, "dispatch_iters_ms": [1.0],
            "spec": "stub"})
    monkeypatch.setattr(
        bench, "stage_probe",
        lambda model, image: {"encode_ms": 1, "dispatch_ms": 1,
                              "finalize_ms": 1})
    monkeypatch.setattr(bench, "_batched_supplement",
                        lambda model, image, batch, iters=3: {"batch": batch})

    import sys
    import types

    fixture_mod = types.ModuleType("crowdsam_tpu.utils.bench_fixture")
    fixture_mod.crowd_scene = lambda seed, **kw: (img, [(0, 0, 1, 1)])
    fixture_mod.mid_scene = lambda seed, **kw: (img, [(0, 0, 1, 1)])
    fixture_mod.sparse_scene = lambda seed, **kw: img
    fixture_mod.train_or_load_decoder = (
        lambda model, steps, lr, recipe="": {"trained_steps": steps,
                                             "trained_cache": "stub"})
    monkeypatch.setitem(sys.modules, "crowdsam_tpu.utils.bench_fixture",
                        fixture_mod)
    # Keep the golden gate's candidate writes out of the repo tree.
    import tempfile
    golden_dir = tempfile.mkdtemp(prefix="bench_golden_test_")
    monkeypatch.setattr(
        bench, "GOLDEN_PATH",
        __import__("os").path.join(golden_dir, "golden.json"))
    # main() does `import jax` + jax.config updates: real jax on CPU is fine.
    return fake


def _run_main(capsys):
    bench.main()
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one JSON line, got {lines}"
    return json.loads(lines[0])


def test_golden_gate_no_snapshot_writes_candidate(monkeypatch, capsys):
    """First run with no committed golden: the gate is skipped and the
    candidate snapshot lands next to GOLDEN_PATH for blessing."""
    import os

    _patch_happy_path(monkeypatch)
    monkeypatch.setenv("BENCH_ITERS", "2")
    out = _run_main(capsys)
    g = out["quality"]["golden"]
    assert "no golden snapshot" in g["skipped"]
    cand = json.load(open(bench.GOLDEN_PATH + ".candidate"))
    assert set(cand["regimes"]) == {"crowded", "sparse"}
    assert cand["regimes"]["crowded"]["boxes"][0] == [0.0, 0.0, 4.0, 4.0]
    assert os.path.exists(bench.GOLDEN_PATH) is False


def test_golden_gate_scores_against_snapshot(monkeypatch, capsys):
    """With a blessed snapshot matching the fixture identity, the gate
    emits per-regime cross-AP; identical sets pass, disjoint sets fail."""
    _patch_happy_path(monkeypatch)
    monkeypatch.setenv("BENCH_ITERS", "2")
    _run_main(capsys)  # writes the candidate
    cand = json.load(open(bench.GOLDEN_PATH + ".candidate"))
    # Regression in one regime: golden sparse boxes nowhere near current.
    cand["regimes"]["sparse"]["boxes"] = [
        [100.0, 100.0, 120.0, 120.0], [130.0, 100.0, 150.0, 120.0],
        [160.0, 100.0, 180.0, 120.0]]
    json.dump(cand, open(bench.GOLDEN_PATH, "w"))
    out = _run_main(capsys)
    g = out["quality"]["golden"]
    assert g["crowded"]["ok"] is True
    assert g["crowded"]["cross_ap"] >= 0.99 * g["crowded"]["ceiling"]
    assert g["sparse"]["ok"] is False
    assert g["sparse"]["cross_ap"] <= 0.1


def test_golden_gate_identity_mismatch_skips(monkeypatch, capsys):
    _patch_happy_path(monkeypatch)
    monkeypatch.setenv("BENCH_ITERS", "2")
    _run_main(capsys)
    cand = json.load(open(bench.GOLDEN_PATH + ".candidate"))
    cand["identity"]["fixture"]["trained_steps"] = 999
    json.dump(cand, open(bench.GOLDEN_PATH, "w"))
    out = _run_main(capsys)
    assert out["quality"]["golden"]["skipped"] == "golden identity mismatch"


def test_happy_path_emits_json(monkeypatch, capsys):
    _patch_happy_path(monkeypatch)
    monkeypatch.setenv("BENCH_ITERS", "2")
    out = _run_main(capsys)
    assert out["value"] > 0
    assert out["crowded_vs_baseline"] > 0
    assert out["canary"]["dispatch_median_ms"] == 1.0
    assert "error" not in out


@pytest.mark.parametrize("stage_fn,stage_name", [
    ("_build_model", "build_model"),
    ("_timed_regime", "crowded_timed"),
    ("stage_probe", "stage_probes"),
])
def test_fault_injection_yields_artifact(monkeypatch, capsys, stage_fn,
                                         stage_name):
    """Killing any stage (square mode, no retry) still yields one JSON line
    with the stage name, the error, and partial results."""
    _patch_happy_path(monkeypatch)
    monkeypatch.setenv("BENCH_ITERS", "2")
    monkeypatch.setenv("BENCH_RECT", "0")

    def boom(*a, **kw):
        raise ValueError("injected-fault")

    monkeypatch.setattr(bench, stage_fn, boom)
    out = _run_main(capsys)
    assert "injected-fault" in out["error"]
    assert out["stage"] == stage_name
    assert out["value"] == 0.0
    assert "partial" in out and "traceback_tail" in out


def test_rect_failure_retries_square(monkeypatch, capsys):
    """A rect-path crash retries the whole measurement square and records
    the failed rect attempt in the artifact (the r3 lesson)."""
    fake = _patch_happy_path(monkeypatch)
    monkeypatch.setenv("BENCH_ITERS", "2")
    monkeypatch.setenv("BENCH_RECT", "1")

    real_timed = bench._timed_regime
    calls = {"n": 0}

    def flaky(model, image, iters, lead=2):
        calls["n"] += 1
        if calls["n"] == 1:  # first (rect) crowded loop crashes
            raise ValueError("rect-only-crash")
        return real_timed(model, image, iters, lead)

    monkeypatch.setattr(bench, "_timed_regime", flaky)
    out = _run_main(capsys)
    assert out["value"] > 0, out
    assert out["rect_encode"] is False
    assert "rect-only-crash" in out["rect_attempt"]["error"]
    assert out["rect_attempt"]["stage"] == "crowded_timed"


def test_double_failure_still_emits_artifact(monkeypatch, capsys):
    """Rect fails AND the square retry fails: still one JSON line, both
    errors recorded."""
    _patch_happy_path(monkeypatch)
    monkeypatch.setenv("BENCH_ITERS", "2")
    monkeypatch.setenv("BENCH_RECT", "1")

    def boom(*a, **kw):
        raise RuntimeError("always-crashes")

    monkeypatch.setattr(bench, "_timed_regime", boom)
    out = _run_main(capsys)
    assert out["value"] == 0.0
    assert "always-crashes" in out["error"]
    assert "always-crashes" in out["rect_attempt"]["error"]


def test_watchdog_emits_artifact_and_exits():
    """A hung device->host readback (r5 tunnel degradation) must yield the
    one-line partial artifact + exit 3, not a hung driver.  Driven in a
    subprocess because the watchdog hard-exits via os._exit."""
    import os
    import subprocess
    import sys

    code = (
        "import os, time, json\n"
        "os.environ['BENCH_WATCHDOG_S'] = '2'\n"
        "import bench\n"
        "progress = {'stage': 'crowded_timed'}\n"
        "bench._start_watchdog(progress)\n"
        "time.sleep(60)\n"  # simulate a wedged readback; watchdog fires first
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-c", code], cwd=repo,
                       capture_output=True, text=True, timeout=45)
    assert r.returncode == 3, (r.returncode, r.stderr[-500:])
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["value"] == 0.0
    assert "watchdog" in out["error"]
    assert out["stage"] == "crowded_timed"


def test_watchdog_does_not_fire_while_progress_moves():
    import os
    import subprocess
    import sys

    code = (
        "import os, time\n"
        "os.environ['BENCH_WATCHDOG_S'] = '3'\n"
        "import bench\n"
        "progress = {'stage': 'x'}\n"
        "bench._start_watchdog(progress)\n"
        "for i in range(8):\n"
        "    progress['tick'] = i\n"
        "    time.sleep(1)\n"
        "print('CLEAN-EXIT')\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-c", code], cwd=repo,
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, (r.returncode, r.stderr[-500:])
    assert "CLEAN-EXIT" in r.stdout

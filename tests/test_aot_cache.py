"""AOT export-cache tests (utils/aot_cache.py).

The cache must (a) return results identical to the plain jit path,
(b) actually serve a fresh process/instance from the disk artifact with
no re-trace of the underlying function, (c) key on static context so two
programs with identical avals but different closures never collide, and
(d) fall back to plain jit on any failure instead of crashing (the bench
artifact-of-record rule, VERDICT r3 weak #3).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crowdsam_tpu.utils import aot_cache
from crowdsam_tpu.utils.aot_cache import AotProgram, aot_jit


@pytest.fixture()
def isolated_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("CROWDSAM_AOT_CACHE", str(tmp_path))
    monkeypatch.delenv("CROWDSAM_DISABLE_AOT_CACHE", raising=False)
    return tmp_path


def test_matches_plain_jit_and_serves_from_disk(isolated_cache):
    traces = []

    def fn(x, y):
        traces.append(1)
        return {"s": x @ y, "m": jnp.maximum(x, 0.0).sum()}

    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 8)), jnp.float32)
    y = jnp.asarray(np.random.default_rng(1).normal(size=(8, 8)), jnp.float32)

    prog = aot_jit(fn, "t_basic", static_key="k")
    got = prog(x, y)
    want = jax.jit(fn)(x, y)
    np.testing.assert_array_equal(np.asarray(got["s"]), np.asarray(want["s"]))
    np.testing.assert_array_equal(np.asarray(got["m"]), np.asarray(want["m"]))
    assert prog.loaded_from_disk == 0
    files = list(isolated_cache.glob("t_basic-*.jaxexp"))
    assert len(files) == 1, files

    # A fresh instance (= fresh process stand-in) must deserialize the
    # artifact and NEVER call the underlying python function again.
    traces.clear()
    prog2 = aot_jit(fn, "t_basic", static_key="k")
    got2 = prog2(x, y)
    assert prog2.loaded_from_disk == 1
    assert traces == [], "deserialized path must not re-trace fn"
    np.testing.assert_array_equal(np.asarray(got2["s"]), np.asarray(want["s"]))
    assert prog2._cache_size() == 1


def test_static_key_separates_identical_avals(isolated_cache):
    def make(scale):
        def fn(x):
            return x * scale
        return fn

    x = jnp.ones((4,), jnp.float32)
    a = aot_jit(make(2.0), "t_key", static_key="scale=2")(x)
    b = aot_jit(make(3.0), "t_key", static_key="scale=3")(x)
    np.testing.assert_array_equal(np.asarray(a), 2.0 * np.ones(4))
    np.testing.assert_array_equal(np.asarray(b), 3.0 * np.ones(4))
    assert len(list(isolated_cache.glob("t_key-*.jaxexp"))) == 2


def test_shape_change_is_a_new_entry(isolated_cache):
    prog = aot_jit(lambda x: x.sum(), "t_shapes")
    prog(jnp.ones((4,)))
    prog(jnp.ones((8,)))
    assert prog._cache_size() == 2
    assert len(list(isolated_cache.glob("t_shapes-*.jaxexp"))) == 2


def test_non_array_leaf_falls_back_to_plain_jit(isolated_cache):
    prog = aot_jit(lambda x, n: x * n, "t_fallback")
    out = prog(jnp.ones((3,)), 4)  # python-int leaf: no export
    np.testing.assert_array_equal(np.asarray(out), 4.0 * np.ones(3))
    assert list(isolated_cache.glob("t_fallback-*.jaxexp")) == []
    assert prog._cache_size() == 1  # served by the plain jit


def test_tracer_args_inline_without_export(isolated_cache):
    inner = aot_jit(lambda x: x + 1.0, "t_inner")

    @jax.jit
    def outer(x):
        return inner(x) * 2.0

    out = outer(jnp.ones((3,)))
    np.testing.assert_array_equal(np.asarray(out), 4.0 * np.ones(3))
    assert list(isolated_cache.glob("t_inner-*.jaxexp")) == []


def test_corrupt_artifact_reexports(isolated_cache):
    prog = aot_jit(lambda x: x - 1.0, "t_corrupt", static_key="c")
    x = jnp.ones((5,))
    prog(x)
    [f] = list(isolated_cache.glob("t_corrupt-*.jaxexp"))
    f.write_bytes(b"not an exported program")
    prog2 = aot_jit(lambda x: x - 1.0, "t_corrupt", static_key="c")
    out = prog2(x)  # must warn + re-export, not crash
    np.testing.assert_array_equal(np.asarray(out), np.zeros(5))
    assert prog2.loaded_from_disk == 0


def test_disable_env_bypasses_cache(isolated_cache, monkeypatch):
    monkeypatch.setenv("CROWDSAM_DISABLE_AOT_CACHE", "1")
    prog = aot_jit(lambda x: x * 0.5, "t_disabled")
    out = prog(jnp.ones((2,)))
    np.testing.assert_array_equal(np.asarray(out), 0.5 * np.ones(2))
    assert list(isolated_cache.glob("t_disabled-*.jaxexp")) == []


def test_crowdsam_flags_key_the_environment(monkeypatch):
    base = aot_cache._env_key()
    monkeypatch.setenv("CROWDSAM_DISABLE_FLASH", "1")
    assert aot_cache._env_key() != base
    monkeypatch.setenv("CROWDSAM_AOT_CACHE", "/tmp/elsewhere")
    monkeypatch.delenv("CROWDSAM_DISABLE_FLASH")
    assert aot_cache._env_key() == base  # cache DIR is not program identity


def test_pipeline_programs_roundtrip_through_cache(isolated_cache, rng):
    """Integration: a tiny CrowdSAM's engine + survivor programs export on
    first build and a second instance serves them from disk with identical
    detections."""
    from tests.test_pipeline import tiny_config
    from crowdsam_tpu.pipeline.crowdsam import CrowdSAM

    image = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    m1 = CrowdSAM(tiny_config())
    d1 = m1.generate(image)
    assert isinstance(m1.engine, AotProgram)
    assert isinstance(m1._survivor_gathered, AotProgram)
    assert list(isolated_cache.glob("eps_engine-*.jaxexp"))

    m2 = CrowdSAM(tiny_config())
    d2 = m2.generate(image)
    assert m2.engine.loaded_from_disk >= 1
    assert len(d1["boxes"]) == len(d2["boxes"])
    if len(d1["boxes"]):
        np.testing.assert_allclose(d1["boxes"], d2["boxes"])
        np.testing.assert_allclose(d1["scores"], d2["scores"])


def test_kwargs_calling_convention(isolated_cache):
    """jax.jit accepts keyword args; the drop-in wrapper must too (the
    fused-decode parity test calls the engine program with **kwargs —
    regression: r4 AotProgram only took positional args)."""

    def fn(x, y, scale):
        return x * scale + y

    x = jnp.arange(8.0)
    y = jnp.ones((8,))
    s = jnp.asarray(2.0)

    prog = aot_jit(fn, "t_kwargs", static_key="k")
    want = jax.jit(fn)(x, y, scale=s)
    np.testing.assert_array_equal(
        np.asarray(prog(x, y, scale=s)), np.asarray(want)
    )
    # mixed/all-kwargs call styles are distinct signatures but same math
    np.testing.assert_array_equal(
        np.asarray(prog(x=x, y=y, scale=s)), np.asarray(want)
    )
    # a fresh instance must serve the kwargs signature from disk
    prog2 = aot_jit(fn, "t_kwargs", static_key="k")
    np.testing.assert_array_equal(
        np.asarray(prog2(x, y, scale=s)), np.asarray(want)
    )
    assert prog2.loaded_from_disk == 1


def test_compute_digest_scope(tmp_path, monkeypatch):
    """The artifact key digests ONLY compute-path sources (models/ops/
    pipeline + aot_cache itself): editing a tool/eval/visualize module
    must leave every exported artifact valid, editing an op must
    invalidate (VERDICT r4 #6)."""
    import pathlib

    root = pathlib.Path(aot_cache.__file__).resolve().parents[1]
    files = aot_cache.compute_source_files(root)
    rels = {str(p.relative_to(root)) for p in files}
    # Host-only modules stay out of the key ...
    for excluded in ("utils/visualize.py", "utils/bench_fixture.py",
                     "utils/deviation_probe.py", "evallib/crowdhuman.py",
                     "train/trainer.py"):
        assert excluded not in rels, excluded
    # ... every compute module is in it.
    for included in ("pipeline/engine.py", "models/mask_decoder.py",
                     "ops/survivor_kernel.py", "utils/aot_cache.py"):
        assert included in rels, included

    # Digest function: sensitive to included content, stable otherwise.
    fake = tmp_path / "pkg"
    for rel in ("models/a.py", "ops/b.py", "pipeline/c.py",
                "utils/aot_cache.py", "utils/visualize.py", "tools_x.py"):
        p = fake / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(f"# {rel}\n")
    d0 = aot_cache._tree_digest(fake, aot_cache.compute_source_files(fake))
    (fake / "utils/visualize.py").write_text("# edited\n")
    d1 = aot_cache._tree_digest(fake, aot_cache.compute_source_files(fake))
    assert d0 == d1, "non-compute edit changed the digest"
    (fake / "ops/b.py").write_text("# edited\n")
    d2 = aot_cache._tree_digest(fake, aot_cache.compute_source_files(fake))
    assert d2 != d0, "compute edit did not change the digest"


def test_model_static_keys_materialize_no_param_values():
    """`repr(model)` feeds the AOT static key (pipeline/predictor.py:71-76);
    it must exclude the parameter tree.  Including it fetches every tensor
    device->host just to stringify (~1.2 GB for ViT-L over the tunnel) and
    wedges model construction whenever the readback path degrades (observed
    r5: CrowdSAM.__init__ hung >20 min inside dataclass __repr__)."""
    from crowdsam_tpu.models.build import sam_model_registry

    sam = sam_model_registry["vit_tiny"](n_class=1, dtype=jnp.float32)
    for obj in (sam, sam.mask_decoder, sam.prompt_encoder, sam.image_encoder):
        r = repr(obj)
        assert "params=" not in r
        assert len(r) < 20_000, (type(obj).__name__, len(r))

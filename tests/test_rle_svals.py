"""Device-side RLE change-index extraction (survivor pass).

The gather-based compaction (per-column counts + searchsorted; no
1M-element scatter) must agree with the packed-bitmap ground truth, and
columns with more than _COL_SLOTS transitions must route the mask to the
packed fallback by reporting maxc+1 changes.
"""

import numpy as np
import jax.numpy as jnp

from crowdsam_tpu.pipeline.engine import (
    EngineConfig,
    _COL_SLOTS,
    make_survivor_pass,
)


def _decode_svals(svals, n, in_hw):
    """Column-major change positions -> mask (toggle reconstruction)."""
    h, w = in_hw
    flat = np.zeros(h * w + 1, np.int32)
    np.add.at(flat, svals[:n], 1)
    mask_f = (np.cumsum(flat[:-1]) % 2).astype(bool)
    return mask_f.reshape(w, h).T  # Fortran order


def test_svals_match_packed(rng):
    from scipy.ndimage import gaussian_filter

    s, r, k = 256, 64, 6
    cfg = EngineConfig(img_size=s, low_res=r, min_mask_region_area=0.0)
    run = make_survivor_pass(cfg, with_masks=True)

    x = gaussian_filter(rng.normal(size=(k, r, r)), sigma=5.0, axes=(1, 2))
    logits = ((x - np.median(x, axis=(1, 2), keepdims=True)) * 30).astype(
        np.float32
    )
    in_h, in_w = 200, 256  # non-square valid region
    out = run(jnp.asarray(logits), jnp.int32(k), jnp.asarray((in_h, in_w),
                                                             jnp.int32))
    summary = np.asarray(out["summary"])
    svals = np.asarray(out["rle_svals"])
    packed = np.asarray(out["packed"])
    full = np.unpackbits(packed, axis=-1)[:, :in_h, :in_w].astype(bool)

    for i in range(k):
        nch = int(summary[i, 10])
        if nch > svals.shape[1]:
            continue  # overflow path: host uses the packed bitmap
        got = _decode_svals(svals[i], nch, (in_h, in_w))
        np.testing.assert_array_equal(got, full[i], err_msg=f"mask {i}")
        # svals are strictly increasing over the valid slots, -1 after.
        assert (np.diff(svals[i][:nch]) > 0).all()
        assert (svals[i][nch:] == -1).all()


def test_svals_from_cand_matches_xla_path(rng):
    """Host flatten of the survivor kernel's candidate table (the
    production TPU path: kernel cand/n_col -> rle.svals_from_cand ->
    encode_changes_coco) must agree with the XLA path's rle_svals AND with
    a direct bitmap encode (ADVICE r2: this composition had no CPU test).
    """
    from scipy.ndimage import gaussian_filter

    from crowdsam_tpu.ops import rle as rle_ops
    from crowdsam_tpu.ops.survivor_kernel import survivor_rle_pallas

    s, r, k = 256, 64, 4
    cfg = EngineConfig(img_size=s, low_res=r, min_mask_region_area=0.0)
    run_xla = make_survivor_pass(cfg, with_masks=True)

    x = gaussian_filter(rng.normal(size=(k, r, r)), sigma=5.0, axes=(1, 2))
    logits = ((x - np.median(x, axis=(1, 2), keepdims=True)) * 30).astype(
        np.float32
    )
    in_h, in_w = 172, 256
    hw = jnp.asarray((in_h, in_w), jnp.int32)

    out_x = run_xla(jnp.asarray(logits), jnp.int32(k), hw)
    edit = np.zeros((k, r, r), np.int8)
    out_k = survivor_rle_pallas(
        jnp.asarray(logits), jnp.asarray(edit), hw, thresh=0.0,
        interpret=True,
    )

    svals_xla = np.asarray(out_x["rle_svals"])
    summary = np.asarray(out_x["summary"])
    cand = rle_ops.unpack_cand10(np.asarray(out_k["cand"]))
    ncol = np.asarray(out_k["n_col"])
    packed = np.asarray(out_k["packed"])
    total = in_h * in_w

    for i in range(k):
        nch = int(summary[i, 10])
        if nch > svals_xla.shape[1]:
            continue
        got = rle_ops.svals_from_cand(cand[i], ncol[i], in_h)
        np.testing.assert_array_equal(got, svals_xla[i, :nch],
                                      err_msg=f"mask {i}")
        # And the COCO string built from the flatten equals the direct
        # bitmap encode of the kernel's own packed output.
        full = np.unpackbits(packed[i : i + 1], axis=-1)[
            :, :in_h, :in_w
        ].astype(bool)
        via_changes = rle_ops.encode_changes_coco(got, total, (in_h, in_w))
        via_bitmap = rle_ops.encode_masks_coco(full)[0]
        assert via_changes == via_bitmap, f"mask {i}"


def test_svals_column_overflow_falls_back():
    s, r = 256, 64
    cfg = EngineConfig(img_size=s, low_res=r, min_mask_region_area=0.0)
    run = make_survivor_pass(cfg, with_masks=True)
    # Alternating stripes along y in a band of columns: the 4x upsample
    # yields > _COL_SLOTS transitions per column.
    logits = -np.ones((1, r, r), np.float32)
    logits[0, :: 2, 8:16] = 1.0
    n_transitions = 2 * (r // 2)  # per column, at low res
    assert n_transitions > _COL_SLOTS
    out = run(jnp.asarray(logits), jnp.int32(1), jnp.asarray((s, s),
                                                             jnp.int32))
    nch = int(np.asarray(out["summary"])[0, 10])
    assert nch == cfg.max_rle_changes + 1  # forced packed fallback

"""Survivor-tail Pallas kernel vs the XLA reference path (interpret mode).

Checks the kernel's packed bits, change counts/candidate rows, boxes, and
scalar summary against an independent numpy/XLA recomputation of the same
semantics (upsample+binarize, nearest edit expansion, valid-region crop,
Fortran-order change extraction — engine.py `_survivor_core`'s full-res
block)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crowdsam_tpu.ops.survivor_kernel import _COL_SLOTS, survivor_rle_pallas


def _blob_logits(rng, k, r):
    logits = np.full((k, r, r), -8.0, np.float32)
    edit = np.zeros((k, r, r), np.int8)
    for i in range(k):
        cy, cx = rng.integers(10, r - 20, 2)
        ry, rx = rng.integers(4, r // 4, 2)
        yy, xx = np.mgrid[0:r, 0:r]
        m = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
        logits[i][m] = 8.0
        # noise speckles
        for _ in range(6):
            y, x = rng.integers(0, r, 2)
            logits[i, y, x] = 8.0
        # cleanup edits: a forced-off and a forced-on cell
        edit[i, (cy + 10) % r, (cx + 10) % r] = -1
        edit[i, 2, 2] = 1
    return logits, edit


def _reference(logits, edit, in_h, in_w, thresh=0.0):
    k, r, _ = logits.shape
    s = 4 * r
    up = np.asarray(jax.image.resize(
        jnp.asarray(logits, jnp.float32), (k, s, s), "linear",
        antialias=False))
    full = up > thresh
    ed = np.kron(edit, np.ones((4, 4), np.int8))
    full = np.where(ed > 0, True, np.where(ed < 0, False, full))
    ys, xs = np.mgrid[0:s, 0:s]
    full &= (ys < in_h) & (xs < in_w)

    packed = np.packbits(full, axis=-1)

    boxes = np.zeros((k, 4), np.int32)
    nonempty = np.zeros(k, bool)
    n_col = np.zeros((k, s), np.int64)
    cand = np.full((k, _COL_SLOTS, s), s, np.int64)
    total = np.zeros(k, np.int64)
    for i in range(k):
        yy, xx = np.nonzero(full[i])
        if len(yy):
            boxes[i] = [xx.min(), yy.min(), xx.max(), yy.max()]
            nonempty[i] = True
        # Fortran-order change positions within the valid region.
        flat = full[i, :in_h, :in_w].flatten(order="F")
        chg = np.nonzero(np.diff(np.concatenate([[0], flat.astype(np.int8)]))
                         != 0)[0]
        total[i] = len(chg)
        cols = chg // in_h
        rows = chg % in_h
        for c, rw in zip(cols, rows):
            n = n_col[i, c]
            if n < _COL_SLOTS:
                cand[i, n, c] = rw
            n_col[i, c] += 1
    return dict(packed=packed, boxes=boxes, nonempty=nonempty, n_col=n_col,
                cand=cand, total=total)


@pytest.mark.parametrize("in_hw", [(256, 256), (172, 256), (256, 200)])
def test_kernel_matches_reference(rng, in_hw):
    k, r = 3, 64
    logits, edit = _blob_logits(rng, k, r)
    in_h, in_w = in_hw
    out = survivor_rle_pallas(
        jnp.asarray(logits), jnp.asarray(edit),
        jnp.asarray(in_hw, jnp.int32), thresh=0.0, interpret=True)
    ref = _reference(logits, edit, in_h, in_w)

    np.testing.assert_array_equal(np.asarray(out["packed"]), ref["packed"])
    np.testing.assert_array_equal(np.asarray(out["n_col"]), ref["n_col"])
    summary = np.asarray(out["summary"])
    np.testing.assert_array_equal(summary[:, :4], ref["boxes"])
    np.testing.assert_array_equal(summary[:, 4] > 0, ref["nonempty"])
    np.testing.assert_array_equal(summary[:, 5], ref["total"])
    # candidate rows agree on every VALID slot (slot < n_col); exhausted
    # slots are a never-read sentinel (kernel: S-1 after the 10-bit clamp,
    # reference: S) and are excluded from the comparison.
    from crowdsam_tpu.ops.rle import unpack_cand10

    cand = unpack_cand10(np.asarray(out["cand"]))
    for i in range(k):
        valid = (np.arange(_COL_SLOTS)[:, None]
                 < np.minimum(ref["n_col"][i], _COL_SLOTS)[None, :])
        np.testing.assert_array_equal(cand[i][valid],
                                      ref["cand"][i][valid])
    # overflow flag: no column here exceeds the slot budget
    assert (summary[:, 6] == (ref["n_col"].max(axis=1) > _COL_SLOTS)).all()


def test_kernel_empty_and_full_masks(rng):
    r = 64
    logits = np.stack([
        np.full((r, r), -8.0, np.float32),   # empty
        np.full((r, r), 8.0, np.float32),    # full frame
    ])
    edit = np.zeros((2, r, r), np.int8)
    in_hw = (200, 256)
    out = survivor_rle_pallas(
        jnp.asarray(logits), jnp.asarray(edit),
        jnp.asarray(in_hw, jnp.int32), thresh=0.0, interpret=True)
    ref = _reference(logits, edit, *in_hw)
    np.testing.assert_array_equal(np.asarray(out["packed"]), ref["packed"])
    summary = np.asarray(out["summary"])
    np.testing.assert_array_equal(summary[:, :4], ref["boxes"])
    np.testing.assert_array_equal(summary[:, 5], ref["total"])
    # full-frame mask: one change per column at row 0 within valid width
    np.testing.assert_array_equal(np.asarray(out["n_col"])[1],
                                  ref["n_col"][1])

"""Connected components / small-region cleanup vs cv2 ground truth."""

import numpy as np
import jax.numpy as jnp

from crowdsam_tpu.ops.connected import (
    component_areas,
    label_components,
    remove_small_regions,
)


def _cv2_remove_small_regions(mask, area_thresh, mode):
    """Reference-semantics implementation on top of cv2 (amg.py:267-291)."""
    import cv2

    correct_holes = mode == "holes"
    working_mask = (correct_holes ^ mask).astype(np.uint8)
    n_labels, regions, stats, _ = cv2.connectedComponentsWithStats(working_mask, 8)
    sizes = stats[:, -1][1:]
    small_regions = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if len(small_regions) == 0:
        return mask, False
    fill_labels = [0] + small_regions
    if not correct_holes:
        fill_labels = [i for i in range(n_labels) if i not in fill_labels]
        if len(fill_labels) == 0:
            fill_labels = [int(np.argmax(sizes)) + 1]
    return np.isin(regions, fill_labels), True


def _blobs(rng, h=48, w=64):
    from scipy.ndimage import gaussian_filter

    x = gaussian_filter(rng.uniform(size=(h, w)), 2.5)
    return x > np.quantile(x, 0.6)


def test_label_components_count(rng):
    mask = np.zeros((2, 16, 16), dtype=bool)
    mask[0, 1:4, 1:4] = True
    mask[0, 10:14, 10:14] = True
    mask[1, 0, :] = True
    labels = np.asarray(label_components(jnp.asarray(mask)))
    # Two components in image 0, one in image 1.
    assert len(np.unique(labels[0])) == 3  # bg + 2
    assert len(np.unique(labels[1])) == 2
    # Diagonal connectivity (8-connected).
    diag = np.zeros((1, 8, 8), dtype=bool)
    diag[0, [0, 1, 2], [0, 1, 2]] = True
    lab = np.asarray(label_components(jnp.asarray(diag)))
    assert len(np.unique(lab[0])) == 2


def test_component_areas(rng):
    mask = np.zeros((1, 16, 16), dtype=bool)
    mask[0, 1:4, 1:4] = True      # area 9
    mask[0, 10:14, 10:14] = True  # area 16
    labels = label_components(jnp.asarray(mask))
    areas = np.asarray(component_areas(labels))[0]
    assert set(np.unique(areas)) == {0, 9, 16}


def test_remove_small_regions_matches_cv2(rng):
    for _ in range(4):
        mask = _blobs(rng)
        for mode in ["holes", "islands"]:
            for thresh in [5, 40, 200]:
                want, want_changed = _cv2_remove_small_regions(mask, thresh, mode)
                got, got_changed = remove_small_regions(
                    jnp.asarray(mask[None]), thresh, mode
                )
                np.testing.assert_array_equal(
                    np.asarray(got)[0], want,
                    err_msg=f"mode={mode} thresh={thresh}",
                )
                assert bool(np.asarray(got_changed)[0]) == want_changed


def test_islands_keep_largest_when_all_small():
    mask = np.zeros((1, 16, 16), dtype=bool)
    mask[0, 0:2, 0:2] = True   # area 4
    mask[0, 8:11, 8:11] = True # area 9
    got, changed = remove_small_regions(jnp.asarray(mask), 100, "islands")
    got = np.asarray(got)[0]
    assert got.sum() == 9 and got[8:11, 8:11].all()
    assert bool(np.asarray(changed)[0])


def test_remove_small_regions_noise_matches_cv2(rng):
    """Pure noise: worst case for label convergence (many thin diagonal
    structures); exercises the bounded-hop windowed path at the engine's
    real threshold (100px at 1024^2 -> 6.25 at 256^2)."""
    for i in range(3):
        mask = rng.random((96, 96)) > 0.5
        for mode in ["holes", "islands"]:
            want, want_changed = _cv2_remove_small_regions(mask, 6.25, mode)
            got, got_changed = remove_small_regions(
                jnp.asarray(mask[None]), 6.25, mode
            )
            np.testing.assert_array_equal(
                np.asarray(got)[0], want, err_msg=f"iter={i} mode={mode}"
            )
            assert bool(np.asarray(got_changed)[0]) == want_changed


def test_remove_small_regions_staircase():
    """A long 8-connected diagonal staircase is one LARGE component whose
    labels converge only after O(length) global sweeps; the bounded-hop
    window test must still keep it (convergence check rejects the
    still-growing label partitions)."""
    mask = np.zeros((1, 64, 64), dtype=bool)
    for i in range(60):
        mask[0, i, i] = True
    got, changed = remove_small_regions(jnp.asarray(mask), 6.25, "islands")
    np.testing.assert_array_equal(np.asarray(got)[0], mask[0])
    assert not bool(np.asarray(changed)[0])
    # And small diagonal fragments ARE removed.
    frag = np.zeros((1, 64, 64), dtype=bool)
    frag[0, [2, 3, 4], [2, 3, 4]] = True      # area 3 < 6.25
    for i in range(20, 40):
        frag[0, i, i] = True                   # area 20 survives
    got, changed = remove_small_regions(jnp.asarray(frag), 6.25, "islands")
    got = np.asarray(got)[0]
    assert not got[2, 2] and got[25, 25]
    assert bool(np.asarray(changed)[0])

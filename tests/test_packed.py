"""Packed mask layout round trips + coordinate/box/index equivalence."""

import jax.numpy as jnp
import numpy as np

from crowdsam_tpu.ops.amg import batched_mask_to_box
from crowdsam_tpu.ops.packed import (
    pack_spatial,
    packed_coord_maps,
    packed_flat_index,
    packed_mask_to_box,
    unpack_spatial,
)

H = W = 16  # base grid -> 64x64 spatial


def test_pack_unpack_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(3, 4 * H, 4 * W)).astype(np.float32))
    packed = pack_spatial(x)
    assert packed.shape == (3, H * W, 16)
    np.testing.assert_array_equal(unpack_spatial(packed, H, W), x)


def test_coord_maps_match_unpack():
    xmap, ymap = packed_coord_maps(H, W)
    xs = unpack_spatial(xmap[None], H, W)[0]
    ys = unpack_spatial(ymap[None], H, W)[0]
    gx, gy = np.meshgrid(np.arange(4 * W), np.arange(4 * H))
    np.testing.assert_array_equal(np.asarray(xs), gx)
    np.testing.assert_array_equal(np.asarray(ys), gy)


def test_packed_flat_index():
    py = jnp.asarray([0, 1, 5, 63, 17])
    px = jnp.asarray([0, 2, 60, 63, 33])
    flat = packed_flat_index(py, px, W)
    # Indexing the packed ravel must hit the same element as spatial.
    spatial = jnp.arange(4 * H * 4 * W, dtype=jnp.int32).reshape(4 * H, 4 * W)
    packed = pack_spatial(spatial[None])[0].reshape(-1)
    np.testing.assert_array_equal(
        np.asarray(packed[flat]), np.asarray(spatial[py, px])
    )


def test_packed_mask_to_box_matches_spatial(rng):
    masks = rng.random((8, 4 * H, 4 * W)) > 0.995
    masks[3] = False  # empty mask case
    masks[5] = False
    masks[5, 10, 20] = True  # single pixel
    m = jnp.asarray(masks)
    ref = batched_mask_to_box(m)
    xmap, ymap = packed_coord_maps(H, W)
    got = packed_mask_to_box(pack_spatial(m), xmap, ymap, H, W)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

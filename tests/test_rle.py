"""RLE: uncompressed round-trip, COCO codec (C++ and Python paths)."""

import numpy as np
import jax.numpy as jnp

from crowdsam_tpu.native import load_rle_codec
from crowdsam_tpu.ops import rle


def _random_masks(rng, b=5, h=37, w=23):
    # Blobby masks with structure (not iid noise) to get realistic runs.
    base = rng.uniform(size=(b, h, w))
    from scipy.ndimage import gaussian_filter

    sm = np.stack([gaussian_filter(x, 3) for x in base])
    return sm > np.median(sm)


def test_uncompressed_roundtrip(rng):
    masks = _random_masks(rng)
    rles = rle.mask_to_rle(masks)
    for m, r in zip(masks, rles):
        assert sum(r["counts"]) == m.size
        np.testing.assert_array_equal(rle.rle_to_mask(r), m)
        assert rle.area_from_rle(r) == m.sum()


def test_leading_one_run():
    m = np.ones((1, 4, 4), dtype=bool)
    r = rle.mask_to_rle(m)[0]
    assert r["counts"][0] == 0  # explicit zero-length leading 0-run
    np.testing.assert_array_equal(rle.rle_to_mask(r), m[0])


def test_coco_compress_roundtrip_python(rng):
    masks = _random_masks(rng)
    for m, r in zip(masks, rle.mask_to_rle(masks)):
        enc = rle.coco_encode_rle(r)
        assert isinstance(enc["counts"], str)
        dec = rle._decompress_counts_py(enc["counts"])
        assert dec == list(r["counts"])


def test_cpp_codec_available_and_matches_python(rng):
    lib = load_rle_codec()
    assert lib is not None, "C++ RLE codec failed to build"
    masks = _random_masks(rng, b=8)
    fast = rle.encode_masks_coco(masks)
    slow = [rle.coco_encode_rle(r) for r in rle.mask_to_rle(masks)]
    for f, s in zip(fast, slow):
        assert f == s


def test_cpp_decode_roundtrip(rng):
    masks = _random_masks(rng, b=4)
    for m, enc in zip(masks, rle.encode_masks_coco(masks)):
        dec = rle.coco_decode_rle(enc)
        np.testing.assert_array_equal(dec.astype(bool), m)


def test_known_coco_string():
    # A mask whose pycocotools-encoded counts string is known.
    # 3x3, fortran order runs: [1 zero, 2 ones, 6 zeros] from column data.
    m = np.zeros((3, 3), dtype=bool)
    m[1, 0] = True
    m[2, 0] = True
    enc = rle.encode_masks_coco(m[None])[0]
    dec = rle.coco_decode_rle(enc)
    np.testing.assert_array_equal(dec.astype(bool), m)

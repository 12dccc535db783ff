"""Automatic-mask-generation math + the MaskData container.

Behavioural contracts: reference `segment_anything_cs/utils/amg.py`
(MaskData :16-75, stability :156-176, point grids :179-197, crop boxes
:200-234, uncrop :237-264, mask->box :303-346) and `crowdsam/utils.py`
(crop-box variant with source offset :104-139, mask uncrop-with-resize
:193-203).

Tensor functions are jit-safe; `MaskData`, point-grid and crop-box builders
are host-side (tiny, shape-determining) helpers.
"""

from __future__ import annotations

import math
from copy import deepcopy
from itertools import product
from typing import Any, Dict, Generator, ItemsView, List, Tuple

import jax.numpy as jnp
import numpy as np


_MASKDATA_TYPES = (list, np.ndarray, jnp.ndarray)


class MaskData:
    """Per-detection field store with row-wise filter/concat semantics.

    API contract (names + behaviour): reference `amg.py:16-75`.  The
    pipeline shell keeps one row per detection across heterogeneous
    fields — arrays (device or host) and plain lists (RLE dicts) — and
    needs to subset or merge all of them in lockstep.
    """

    def __init__(self, **kwargs) -> None:
        self._d: Dict[str, Any] = {}
        for k, v in kwargs.items():
            self[k] = v

    def __setitem__(self, key: str, item: Any) -> None:
        if not isinstance(item, _MASKDATA_TYPES):
            raise AssertionError(
                f"MaskData field {key!r}: expected a list or a "
                f"numpy/jax array, got {type(item).__name__}"
            )
        self._d[key] = item

    def __delitem__(self, key: str) -> None:
        del self._d[key]

    def __getitem__(self, key: str) -> Any:
        return self._d[key]

    def __contains__(self, key: str) -> bool:
        return key in self._d

    def items(self) -> ItemsView[str, Any]:
        return self._d.items()

    def keys(self):
        return self._d.keys()

    def get(self, key: str, default: Any = None) -> Any:
        return self._d.get(key, default)

    def filter(self, keep) -> None:
        """Row-subset every field by a boolean mask or index array."""
        keep = np.asarray(keep)
        by_flag = keep.dtype == np.bool_
        for k, v in self._d.items():
            if v is None:
                continue
            if isinstance(v, (np.ndarray, jnp.ndarray)):
                self._d[k] = v[keep]
            elif isinstance(v, list):
                rows = np.flatnonzero(keep) if by_flag else keep
                self._d[k] = [v[int(i)] for i in rows]
            else:
                raise TypeError(f"cannot filter MaskData field {k!r} "
                                f"of type {type(v).__name__}")

    def cat(self, other: "MaskData") -> None:
        """Row-append `other`'s fields (introducing absent keys)."""
        for k, v in other.items():
            cur = self._d.get(k)
            if cur is None:
                self._d[k] = deepcopy(v) if isinstance(v, list) else v
            elif isinstance(v, jnp.ndarray):
                self._d[k] = jnp.concatenate([cur, v], axis=0)
            elif isinstance(v, np.ndarray):
                self._d[k] = np.concatenate([cur, v], axis=0)
            elif isinstance(v, list):
                self._d[k] = cur + deepcopy(v)
            else:
                raise TypeError(f"cannot concat MaskData field {k!r} "
                                f"of type {type(v).__name__}")

    def to_numpy(self) -> None:
        for k, v in self._d.items():
            if isinstance(v, jnp.ndarray):
                self._d[k] = np.asarray(v)


def batch_iterator(batch_size: int, *args) -> Generator[List[Any], None, None]:
    """Slice-synchronized batching (reference `amg.py:98-104`)."""
    assert len(args) > 0 and all(len(a) == len(args[0]) for a in args)
    n_batches = len(args[0]) // batch_size + int(len(args[0]) % batch_size != 0)
    for b in range(n_batches):
        yield [arg[b * batch_size : (b + 1) * batch_size] for arg in args]


def calculate_stability_score(
    masks: jnp.ndarray, mask_threshold: float, threshold_offset: float
) -> jnp.ndarray:
    """IoU between high/low-threshold binarizations (reference `amg.py:156-176`)."""
    intersections = (masks > (mask_threshold + threshold_offset)).sum(
        axis=(-1, -2), dtype=jnp.int32
    )
    unions = (masks > (mask_threshold - threshold_offset)).sum(
        axis=(-1, -2), dtype=jnp.int32
    )
    return intersections / unions


def build_point_grid(n_per_side: int) -> np.ndarray:
    """Evenly spaced [0,1]^2 grid (reference `amg.py:179-186`)."""
    offset = 1 / (2 * n_per_side)
    points_one_side = np.linspace(offset, 1 - offset, n_per_side)
    points_x = np.tile(points_one_side[None, :], (n_per_side, 1))
    points_y = np.tile(points_one_side[:, None], (1, n_per_side))
    return np.stack([points_x, points_y], axis=-1).reshape(-1, 2)


def build_all_layer_point_grids(
    n_per_side: int, n_layers: int, scale_per_layer: int
) -> List[np.ndarray]:
    """Point grids per crop layer (reference `amg.py:189-197`)."""
    return [
        build_point_grid(int(n_per_side / (scale_per_layer**i)))
        for i in range(n_layers + 1)
    ]


def generate_crop_boxes(
    im_size: Tuple[int, ...], n_layers: int, overlap_ratio: float
) -> Tuple[List[List[int]], List[int]]:
    """Crop boxes per layer, xyxy (reference `amg.py:200-234`)."""
    crop_boxes, layer_idxs = [], []
    im_h, im_w = int(im_size[0]), int(im_size[1])
    short_side = min(im_h, im_w)

    crop_boxes.append([0, 0, im_w, im_h])
    layer_idxs.append(0)

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_crops_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_crops_per_side))
        crop_w = crop_len(im_w, n_crops_per_side, overlap)
        crop_h = crop_len(im_h, n_crops_per_side, overlap)
        crop_box_x0 = [int((crop_w - overlap) * i) for i in range(n_crops_per_side)]
        crop_box_y0 = [int((crop_h - overlap) * i) for i in range(n_crops_per_side)]
        for x0, y0 in product(crop_box_x0, crop_box_y0):
            crop_boxes.append([x0, y0, min(x0 + crop_w, im_w), min(y0 + crop_h, im_h)])
            layer_idxs.append(i_layer + 1)

    return crop_boxes, layer_idxs


def uncrop_masks(
    masks: jnp.ndarray, crop_box: List[int], orig_h: int, orig_w: int
) -> jnp.ndarray:
    """Pad crop-frame masks back into image frame (reference `amg.py:255-264`)."""
    x0, y0, x1, y1 = crop_box
    if x0 == 0 and y0 == 0 and x1 == orig_w and y1 == orig_h:
        return masks
    pad_x, pad_y = orig_w - (x1 - x0), orig_h - (y1 - y0)
    pad = [(0, 0)] * (masks.ndim - 2) + [(y0, pad_y - y0), (x0, pad_x - x0)]
    return jnp.pad(masks, pad)


def batched_mask_to_box(masks: jnp.ndarray) -> jnp.ndarray:
    """xyxy boxes around binary masks; [0,0,0,0] for empty masks.

    Shape (..., H, W) -> (..., 4).  Matches reference `amg.py:303-346`
    (inclusive right/bottom edge indices).
    """
    if masks.size == 0:
        return jnp.zeros(masks.shape[:-2] + (4,), dtype=jnp.int32)

    shape = masks.shape
    h, w = shape[-2:]
    flat = masks.reshape(-1, h, w)

    in_height = jnp.max(flat, axis=-1)  # (B, H) bool
    hcoords = in_height * jnp.arange(h)[None, :]
    bottom_edges = jnp.max(hcoords, axis=-1)
    top_edges = jnp.min(hcoords + h * (~in_height), axis=-1)

    in_width = jnp.max(flat, axis=-2)
    wcoords = in_width * jnp.arange(w)[None, :]
    right_edges = jnp.max(wcoords, axis=-1)
    left_edges = jnp.min(wcoords + w * (~in_width), axis=-1)

    empty = (right_edges < left_edges) | (bottom_edges < top_edges)
    out = jnp.stack([left_edges, top_edges, right_edges, bottom_edges], axis=-1)
    out = out * (~empty)[..., None]
    return out.reshape(shape[:-2] + (4,))


def uncrop_masks_resized(
    masks: jnp.ndarray, crop_box: List[int], orig_h: int, orig_w: int
) -> jnp.ndarray:
    """Resize crop-frame masks to crop size then pad into image frame.

    Matches reference `crowdsam/utils.py:193-203` (nearest interpolate of the
    bool mask to the crop's true extent, then zero pad).
    """
    import jax

    x0, y0, x1, y1 = crop_box
    w, h = x1 - x0, y1 - y0
    resized = jax.image.resize(
        masks.astype(jnp.float32), masks.shape[:-2] + (h, w), method="nearest"
    ).astype(bool)
    if x0 == 0 and y0 == 0 and x1 == orig_w and y1 == orig_h:
        return resized
    pad_x, pad_y = orig_w - (x1 - x0), orig_h - (y1 - y0)
    pad = [(0, 0)] * (masks.ndim - 2) + [(y0, pad_y - y0), (x0, pad_x - x0)]
    return jnp.pad(resized, pad)

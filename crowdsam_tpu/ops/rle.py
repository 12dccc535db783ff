"""Run-length encoding: device-side extraction + host-side COCO codec.

Behavioural contracts:
- uncompressed RLE dicts {"size": [h, w], "counts": [...]} in Fortran order,
  matching reference `segment_anything_cs/utils/amg.py:107-153`
  (mask_to_rle_pytorch / rle_to_mask / area_from_rle) and
  `crowdsam/utils.py:619-648` (numpy variant);
- COCO-compressed strings matching pycocotools' format, produced by the
  first-party C++ codec in `crowdsam_tpu/native/rle_codec.cpp` (pycocotools
  is NOT a dependency of this framework) with a pure-Python fallback.
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from crowdsam_tpu.native import load_rle_codec


# ---------------------------------------------------------------------------
# Uncompressed RLE (counts lists)
# ---------------------------------------------------------------------------

def mask_to_rle(masks) -> List[Dict[str, Any]]:
    """(B, H, W) binary masks -> uncompressed Fortran-order RLE dicts.

    Host-side (numpy) counterpart of reference `amg.py:107-135`; the
    device-side work (thresholding/upsampling) happens before this call.
    """
    masks = np.asarray(masks)
    b, h, w = masks.shape
    flat = masks.transpose(0, 2, 1).reshape(b, -1).astype(bool)  # Fortran order
    out = []
    for i in range(b):
        row = flat[i]
        diff = row[1:] != row[:-1]
        change = np.nonzero(diff)[0]
        idxs = np.concatenate([[0], change + 1, [h * w]])
        btw = np.diff(idxs)
        # A leading one-run needs an explicit zero-length 0-run first.
        counts: List[int] = [0] if row[0] else []
        counts.extend(btw.tolist())
        out.append({"size": [h, w], "counts": counts})
    return out


def rle_to_mask(rle: Dict[str, Any]) -> np.ndarray:
    """Uncompressed RLE -> (H, W) bool mask (reference `amg.py:138-149`)."""
    h, w = rle["size"]
    mask = np.empty(h * w, dtype=bool)
    idx = 0
    parity = False
    for count in rle["counts"]:
        mask[idx : idx + count] = parity
        idx += count
        parity ^= True
    return mask.reshape(w, h).transpose()


def area_from_rle(rle: Dict[str, Any]) -> int:
    """Foreground area (reference `amg.py:152-153`)."""
    return sum(rle["counts"][1::2])


# ---------------------------------------------------------------------------
# COCO-compressed RLE (printable-ASCII delta varint strings)
# ---------------------------------------------------------------------------

def _compress_counts_py(cnts: List[int]) -> str:
    """Pure-Python encoder for the COCO compressed-counts string format."""
    s = []
    for i, cnt in enumerate(cnts):
        x = int(cnt)
        if i > 2:
            x -= int(cnts[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            s.append(chr(c + 48))
    return "".join(s)


def _decompress_counts_py(s: str) -> List[int]:
    cnts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    return cnts


def coco_encode_rle(uncompressed_rle: Dict[str, Any]) -> Dict[str, Any]:
    """Uncompressed RLE dict -> {"size": [h, w], "counts": str}.

    Same contract as reference `amg.py:294-300` (which round-trips through
    pycocotools `frPyObjects` and utf-8 decodes the bytes).
    """
    h, w = uncompressed_rle["size"]
    counts = _compress_counts_py(list(uncompressed_rle["counts"]))
    return {"size": [h, w], "counts": counts}


def coco_decode_rle(encoded_rle: Dict[str, Any]) -> np.ndarray:
    """{"size": [h, w], "counts": str} -> (H, W) uint8 mask.

    Same contract as reference `crowdsam/utils.py:59-70`.  Uses the C++
    codec when available.
    """
    h, w = encoded_rle["size"]
    s = encoded_rle["counts"]
    lib = load_rle_codec()
    if lib is not None:
        out = np.empty(h * w, dtype=np.uint8)
        raw = s.encode("utf-8")
        status = lib.rle_decode_mask(raw, len(raw), out.ctypes.data, h * w)
        if status == 0:
            return out.reshape(w, h).transpose().copy()
    cnts = _decompress_counts_py(s)
    return rle_to_mask({"size": [h, w], "counts": cnts}).astype(np.uint8)


def encode_masks_coco(masks) -> List[Dict[str, Any]]:
    """Batched (B, H, W) binary masks -> COCO-compressed RLE dicts.

    Fast path: one C++ call over the Fortran-flattened byte batch (single
    pass per mask, no Python loop over runs).
    """
    masks = np.asarray(masks)
    if masks.ndim == 2:
        masks = masks[None]
    b, h, w = masks.shape
    if b == 0:
        return []
    flat = np.ascontiguousarray(
        masks.transpose(0, 2, 1).reshape(b, -1).astype(np.uint8)
    )
    lib = load_rle_codec()
    if lib is not None:
        # Worst case every pixel alternates: ~2 chars per run bound by n+16.
        stride = h * w + 16
        out = np.empty((b, stride), dtype=np.uint8)
        lens = np.empty((b,), dtype=np.int64)
        status = lib.rle_encode_batch(
            flat.ctypes.data, b, h * w, out.ctypes.data, stride, lens.ctypes.data
        )
        if status == 0:
            return [
                {"size": [h, w], "counts": out[i, : lens[i]].tobytes().decode("utf-8")}
                for i in range(b)
            ]
    return [coco_encode_rle(r) for r in mask_to_rle(masks)]


def encode_changes_coco(changes: np.ndarray, total: int,
                        size) -> Dict[str, Any]:
    """Fortran-order change indices -> COCO-compressed RLE dict.

    `changes`: ascending positions (in the column-major flattening of the
    (h, w) mask) where the value differs from its predecessor (with an
    implicit 0 before position 0 — COCO counts start with the zero run).
    `total` = h*w.  Equivalent to `encode_masks_coco` on the dense mask;
    this is the host half of the device-side RLE extraction (the TPU ships
    only the change indices, ~KBs instead of the 131 KB full-res bitmap).
    """
    h, w = size
    changes = np.asarray(changes, dtype=np.int64)
    if changes.size == 0:
        counts = np.asarray([total], dtype=np.int64)
    else:
        counts = np.empty(changes.size + 1, dtype=np.int64)
        counts[0] = changes[0]
        counts[1:-1] = np.diff(changes)
        counts[-1] = total - changes[-1]
    lib = load_rle_codec()
    if lib is not None:
        cap = int(counts.size * 12 + 16)
        out = np.empty(cap, dtype=np.uint8)
        ln = lib.rle_compress_counts(
            counts.ctypes.data, counts.size, out.ctypes.data, cap
        )
        if ln >= 0:
            return {"size": [int(h), int(w)],
                    "counts": out[:ln].tobytes().decode("utf-8")}
    return {"size": [int(h), int(w)],
            "counts": _compress_counts_py([int(c) for c in counts])}


def unpack_cand10(cand_packed: "np.ndarray") -> "np.ndarray":
    """Decode the survivor kernel's packed candidate table: (..., W, S)
    int32 words holding 3 x 10-bit change-row positions each ->
    (..., 3W, S) slot-major rows (slot s = word s//3, field s%3 from the
    high bits).  Vectorized over any leading batch dims."""
    import numpy as np

    c = np.asarray(cand_packed)
    r0 = (c >> 20) & 0x3FF
    r1 = (c >> 10) & 0x3FF
    r2 = c & 0x3FF
    out = np.stack([r0, r1, r2], axis=-2)       # (..., W, 3, S)
    return out.reshape(*c.shape[:-2], c.shape[-2] * 3, c.shape[-1])


def svals_from_cand(cand: "np.ndarray", n_col: "np.ndarray",
                    in_h: int) -> "np.ndarray":
    """Flatten the survivor kernel's per-column change candidates into the
    sorted Fortran-order change-position list `encode_changes_coco` takes.

    cand: (slots, S) int — first `slots` change rows per column; n_col:
    (S,) int counts (<= slots for non-overflow masks; overflow masks are
    routed to the packed-bitmap fallback before reaching here).
    """
    import numpy as np

    cols = np.nonzero(n_col)[0]
    reps = n_col[cols].astype(np.int64)
    col_rep = np.repeat(cols, reps)
    starts = np.cumsum(reps) - reps
    slot = np.arange(len(col_rep), dtype=np.int64) - np.repeat(starts, reps)
    rows = cand[slot, col_rep]
    return col_rep * in_h + rows

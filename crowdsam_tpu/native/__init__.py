"""Native (C++) host ops, compiled on demand with g++ and loaded via ctypes.

Currently: the COCO RLE codec (`rle_codec.cpp`) replacing pycocotools.
`load_rle_codec()` returns a ctypes CDLL or None if compilation fails
(callers fall back to the pure-Python codec in `crowdsam_tpu.ops.rle`).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

_SRC = Path(__file__).parent / "rle_codec.cpp"
_cached_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _build_dir() -> Path:
    d = Path(os.environ.get("CROWDSAM_TPU_CACHE", tempfile.gettempdir())) / "crowdsam_tpu_native"
    d.mkdir(parents=True, exist_ok=True)
    return d


def load_rle_codec() -> Optional[ctypes.CDLL]:
    """Compile (once, content-hashed) and load the RLE codec shared lib."""
    global _cached_lib, _load_attempted
    if _cached_lib is not None or _load_attempted:
        return _cached_lib
    _load_attempted = True
    try:
        src = _SRC.read_bytes()
        tag = hashlib.sha256(src).hexdigest()[:16]
        so_path = _build_dir() / f"rle_codec_{tag}.so"
        if not so_path.exists():
            tmp = so_path.with_suffix(".so.tmp")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(tmp)],
                check=True, capture_output=True,
            )
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(str(so_path))
        lib.rle_encode_mask.restype = ctypes.c_int64
        lib.rle_encode_mask.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
        lib.rle_decode_mask.restype = ctypes.c_int64
        lib.rle_decode_mask.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
        lib.rle_encode_batch.restype = ctypes.c_int64
        lib.rle_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.rle_area.restype = ctypes.c_int64
        lib.rle_area.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.rle_compress_counts.restype = ctypes.c_int64
        lib.rle_compress_counts.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
        _cached_lib = lib
    except Exception:
        _cached_lib = None
    return _cached_lib

"""Load the reference's torch modeling files as a numerical oracle.

The reference package __init__ pulls in torchvision (absent here), so we
mount only `segment_anything_cs/modeling/` as a standalone package.  Used
strictly read-only for activation-parity tests; no reference code is copied
into the framework.
"""

import importlib
import sys
import types

_REF_MODELING = "/root/reference/segment_anything_cs/modeling"


def load_ref_modeling():
    if "refsam" not in sys.modules:
        pkg = types.ModuleType("refsam")
        pkg.__path__ = [_REF_MODELING]
        sys.modules["refsam"] = pkg
    mods = {}
    for name in ["common", "image_encoder", "prompt_encoder", "transformer",
                 "mask_decoder"]:
        mods[name] = importlib.import_module(f"refsam.{name}")
    return mods

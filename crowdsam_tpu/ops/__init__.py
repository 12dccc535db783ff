"""Pure-JAX tensor ops: box geometry, AMG math, NMS, RLE, connected components.

Everything here is jit-safe with static shapes; the only host-side pieces are
explicitly named ``*_host`` or live in :mod:`crowdsam_tpu.ops.rle` encoding
finalization.
"""

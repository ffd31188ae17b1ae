"""Minimal CPU stand-in for xformers, used ONLY by tools/golden_dump.py to
import the torch reference (`unet_v2v.py:10-11`) in this image, where the real
CUDA xformers wheel is absent.

`ops.memory_efficient_attention` is mathematically plain softmax attention —
the reference relies on that equivalence (exact semantics, fused kernel), so a
dense torch implementation reproduces it bit-for-fp32-tolerance on CPU.
"""

from . import ops  # noqa: F401

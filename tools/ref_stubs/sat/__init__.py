"""Minimal single-process SwissArmyTransformer (SAT) stand-in, used ONLY by
tools/golden_dump.py to run the reference's patched DiT
(cogvideox-based/sat/dit_video_concat.py) in this image.

The reference repo ships its OWN patched copy of SAT's transformer.py
(cogvideox-based/transformer.py — SelfAttention/MLP/BaseTransformerLayer with
the LIEM additions and the full BaseTransformer forward); this stub supplies
the pieces that file and dit_video_concat.py import from the sat package:
mpu (single-GPU, world size 1), ops.layernorm, transformer_defaults (the
standard attention/mlp/embedding hook defaults), and model.base_model
(mixin + hook bookkeeping). Model-parallel layers degrade to plain Linear —
exact math at world size 1.
"""

from . import mpu  # noqa: F401

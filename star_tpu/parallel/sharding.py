"""Parameter sharding rules (Megatron-style TP via pjit annotations).

Replaces SAT's ColumnParallelLinear / RowParallelLinear
(cogvideox-based/transformer.py:67-94): qkv/in projections shard their OUTPUT
feature dim over 'tensor' (column parallel), out/down projections shard their
INPUT feature dim (row parallel) — XLA inserts the all-reduce the reference
does by hand in RowParallelLinear.

Rules are regex -> PartitionSpec over flax param-tree paths, so the same
table serves the video UNet, the DiT, and the text towers.
"""

from __future__ import annotations

import re
from typing import Any, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXIS_TENSOR

# (path regex, spec for kernel). Dense kernels are [in, out]; Conv kernels
# are [kh, kw, in, out]. Biases follow the output dim of their layer.
TP_RULES: Sequence[Tuple[str, P]] = (
    # attention column-parallel: q/k/v project INTO the sharded head dim
    # (UNet to_q/k/v, CLIP in_proj, DiT qkv(+LoRA a), T5 q/k/v)
    (r'(to_q|to_k|to_v|in_proj)/kernel$', P(None, AXIS_TENSOR)),
    (r'(to_q|to_k|to_v|in_proj)/bias$', P(AXIS_TENSOR)),
    (r'qkv/(base|lora_a)/kernel$', P(None, AXIS_TENSOR)),
    (r'qkv/base/bias$', P(AXIS_TENSOR)),
    (r'(^|/)(q|k|v)/kernel$', P(None, AXIS_TENSOR)),
    # attention row-parallel: output projection reads sharded heads
    (r'(to_out|out_proj)/kernel$', P(AXIS_TENSOR, None)),
    (r'dense/(base|lora_b)/kernel$', P(AXIS_TENSOR, None)),
    (r'(^|/)o/kernel$', P(AXIS_TENSOR, None)),
    # GEGLU / MLP column then row (UNet ff, DiT/CLIP mlp, T5 wi/wo)
    (r'(ff/proj|mlp_fc|wi_0|wi_1)/kernel$', P(None, AXIS_TENSOR)),
    (r'(ff/proj|mlp_fc)/bias$', P(AXIS_TENSOR)),
    (r'(ff/out|mlp_proj|(^|/)wo)/kernel$', P(AXIS_TENSOR, None)),
)


def spec_for_path(path: str) -> P:
    for pat, spec in TP_RULES:
        if re.search(pat, path):
            return spec
    return P()  # replicate


def param_specs(params: Any) -> Any:
    """PartitionSpec pytree matching a flax param tree. Stacked (nn.scan)
    params carry a leading layer axis; rules are written for the base rank,
    so pad leading None axes to the leaf rank."""
    def _spec(path, leaf):
        name = '/'.join(str(getattr(k, 'key', k)) for k in path)
        spec = spec_for_path(name)
        ndim = getattr(leaf, 'ndim', None)
        if len(spec) and ndim is not None and ndim > len(spec):
            spec = P(*([None] * (ndim - len(spec)) + list(spec)))
        return spec
    return jax.tree_util.tree_map_with_path(_spec, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """device_put the param tree with the TP rules over `mesh`."""
    specs = param_specs(params)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs)

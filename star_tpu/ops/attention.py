"""Multi-head attention for the video backbones.

Two backends behind one functional API:
  * 'xla'    — einsum + fp32 softmax; XLA fuses well at short/medium seq.
  * 'pallas' — flash-attention TPU kernel (ops/flash_attention.py) for the
               long spatial sequences (hw up to ~26k tokens at 720p+ latents),
               where materializing the logits matrix would blow HBM.

The reference runs every attention through xformers CUDA kernels
(unet_v2v.py:179-185) with fp32 softmax for the math path (unet_v2v.py:356-360);
here softmax always accumulates in fp32 regardless of compute dtype.

Layout: q [B, Sq, H, D], k/v [B, Sk, H, D] (batch, seq, heads, head_dim),
returns [B, Sq, H, D].
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_BACKEND = 'auto'


def set_attention_backend(name: str) -> None:
    """'auto' | 'xla' | 'pallas'."""
    global _BACKEND
    assert name in ('auto', 'xla', 'pallas')
    _BACKEND = name


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ('cpu',)
    except Exception:  # pragma: no cover
        return False


def _xla_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   scale: float) -> jax.Array:
    dtype = q.dtype
    logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum('bhqk,bkhd->bqhd', probs.astype(dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          scale: float | None = None,
                          backend: str | None = None) -> jax.Array:
    """Plain (non-causal, unmasked) multi-head attention.

    All attention in the I2VGen-XL UNet is unmasked (self or text-cross);
    causal masking lives with the CLIP/T5 towers which use their own path.
    """
    assert q.ndim == 4 and k.ndim == 4 and v.ndim == 4
    d = q.shape[-1]
    scale = (1.0 / math.sqrt(d)) if scale is None else scale

    be = backend or _BACKEND
    if be == 'auto':
        # pallas flash attention pays off once the logits matrix is big;
        # short sequences (temporal attn over f<=64, text cross-attn k=77)
        # are faster through plain XLA fusion.
        use_pallas = _on_tpu() and q.shape[1] >= 512 and k.shape[1] >= 512
        be = 'pallas' if use_pallas else 'xla'

    if be == 'pallas':
        try:
            from .flash_attention import flash_attention
        except ImportError:
            pass
        else:
            return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale)


def dot_product_attention_packed(q: jax.Array, k: jax.Array, v: jax.Array,
                                 num_heads: int, scale: float | None = None,
                                 kv_valid: int | None = None,
                                 backend: str | None = None,
                                 prescaled: bool = False) -> jax.Array:
    """Natural-layout attention: q/k/v [B, S, H*D] -> [B, S, H*D].

    On TPU at long sequences this takes the packed Pallas kernel, which
    consumes the projection output directly — no [B,S,H,D] -> [B,H,S,D]
    relayout on either side (that relayout + pads cost the CogVideoX DiT
    step ~180 ms at 42 layers). Off TPU / short seq it reshapes and runs
    the XLA path. kv_valid masks a dead key tail (rows >= kv_valid get no
    weight)."""
    b, s, c = q.shape
    d = c // num_heads
    scale = (1.0 / math.sqrt(d)) if scale is None else scale
    be = backend or _BACKEND
    if be == 'auto':
        # 128-lane head-pair blocks, or whole-row blocks for odd head
        # counts (c itself is a legal minor-dim block; c capped so the
        # in-kernel logits temp + row buffers fit scoped VMEM)
        packed_ok = ((c % 128 == 0 and 128 % d == 0)
                     or (c % d == 0 and c % 16 == 0 and c <= 1024))
        use_packed = (_on_tpu() and packed_ok and s >= 512
                      and k.shape[1] >= 512)
        be = 'pallas' if use_packed else 'unpack'
    if be == 'pallas':
        from .flash_attention import flash_attention_packed
        return flash_attention_packed(q, k, v, num_heads, scale,
                                      kv_valid=kv_valid,
                                      prescaled=prescaled)
    # fall back through the 4D entry (which itself picks unpacked flash on
    # TPU / XLA elsewhere) — never route a 14k-token sequence to the
    # logits-materializing XLA path just because the head count is odd
    if prescaled:
        from .flash_attention import LN2
        scale = LN2          # q already carries scale*log2e
    to4 = lambda t: t.reshape(t.shape[0], t.shape[1], num_heads, d)
    kv = k.shape[1] if kv_valid is None else min(kv_valid, k.shape[1])
    out = dot_product_attention(
        to4(q), to4(k[:, :kv]), to4(v[:, :kv]), scale,
        backend=None if be in ('auto', 'unpack') else be)
    return out.reshape(b, s, c)


def attention_qkv(x: jax.Array, context: jax.Array, wq, wk, wv, wo, bo,
                  num_heads: int, scale: float | None = None) -> jax.Array:
    """Fused qkv-projection + attention + out-projection helper.

    x: [B, Sq, C]; context: [B, Sk, Cc]; weights are plain arrays so callers
    (flax modules) keep ownership of params.
    """
    b, sq, _ = x.shape
    sk = context.shape[1]
    q = (x @ wq).reshape(b, sq, num_heads, -1)
    k = (context @ wk).reshape(b, sk, num_heads, -1)
    v = (context @ wv).reshape(b, sk, num_heads, -1)
    out = dot_product_attention(q, k, v, scale=scale)
    out = out.reshape(b, sq, -1)
    return out @ wo + bo

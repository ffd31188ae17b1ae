"""Dense softmax attention with xformers' calling convention.

Accepts 3D [B, S, D] (the reference reshapes heads into batch before calling,
unet_v2v.py:165-186) or 4D [B, S, H, D]. `op`/`attn_bias` mirror the real
signature; only attn_bias=None is exercised by the reference UNet.
"""

import math

import torch


def memory_efficient_attention(q, k, v, attn_bias=None, op=None, p=0.0):
    if p:
        raise NotImplementedError('dropout not supported in the stub')
    squeeze_heads = q.dim() == 4
    if squeeze_heads:  # [B, S, H, D] -> [B*H, S, D]
        b, s, h, d = q.shape
        q = q.permute(0, 2, 1, 3).reshape(b * h, s, d)
        k = k.permute(0, 2, 1, 3).reshape(b * h, k.shape[1], d)
        v = v.permute(0, 2, 1, 3).reshape(b * h, v.shape[1], d)
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = torch.baddbmm(
        torch.zeros(q.shape[0], q.shape[1], k.shape[1], dtype=q.dtype),
        q, k.transpose(-2, -1), beta=0, alpha=scale)
    if attn_bias is not None:
        logits = logits + attn_bias
    out = torch.softmax(logits, dim=-1) @ v
    if squeeze_heads:
        out = out.reshape(b, h, s, d).permute(0, 2, 1, 3)
    return out

"""OpenCLIP ViT-H-14 text tower (penultimate layer), in flax.

Behavioral reference: FrozenOpenCLIPEmbedder
(/root/reference/video_to_video/modules/embedder.py:12-72): token embedding +
positional embedding, causal transformer, stop one resblock before the end
('penultimate'), then ln_final — output [B, 77, 1024].

ViT-H-14 text config: vocab 49408, width 1024, heads 16, layers 24, ctx 77.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.norms import layer_norm


class _LayerNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        return layer_norm(x, scale, bias, self.eps)


class CLIPAttention(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        b, s, c = x.shape
        hd = self.width // self.heads
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name='in_proj')(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, self.heads, hd)
        k = k.reshape(b, s, self.heads, hd)
        v = v.reshape(b, s, self.heads, hd)
        logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * (1.0 / np.sqrt(hd)) + mask[None, None]
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum('bhqk,bkhd->bqhd', probs.astype(self.dtype), v)
        return nn.Dense(self.width, dtype=self.dtype, name='out_proj')(
            out.reshape(b, s, c))


class CLIPBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        x = x + CLIPAttention(self.width, self.heads, dtype=self.dtype,
                              name='attn')(_LayerNorm(name='ln_1')(x), mask)
        h = _LayerNorm(name='ln_2')(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name='mlp_fc')(h)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(self.dtype)
        h = nn.Dense(self.width, dtype=self.dtype, name='mlp_proj')(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """tokens [B, 77] int32 -> features [B, 77, width]."""
    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = 77
    penultimate: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        b, s = tokens.shape
        tok_emb = self.param('token_embedding',
                             nn.initializers.normal(0.02),
                             (self.vocab_size, self.width), jnp.float32)
        pos_emb = self.param('positional_embedding',
                             nn.initializers.normal(0.01),
                             (self.context_length, self.width), jnp.float32)
        x = tok_emb[tokens].astype(self.dtype) + pos_emb[None, :s].astype(self.dtype)
        mask = jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)
        n_blocks = self.layers - (1 if self.penultimate else 0)
        for i in range(n_blocks):
            x = CLIPBlock(self.width, self.heads, dtype=self.dtype,
                          name=f'resblock_{i}')(x, mask)
        return _LayerNorm(name='ln_final')(x)

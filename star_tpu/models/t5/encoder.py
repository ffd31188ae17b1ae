"""T5 v1.1 encoder (XXL config) in flax — the CogVideoX text conditioner.

Behavioral reference: FrozenT5Embedder (sgm/modules/encoders/modules.py:
234-281) — returns last_hidden_state for 226 zero-padded tokens, notably with
NO attention mask (the reference passes input_ids only), which we reproduce.

T5 v1.1 semantics: RMSNorm pre-norm (eps 1e-6), unscaled dot-product
attention (the 1/sqrt(d) is folded into initialization), relative position
bias from block 0 shared across layers (32 buckets, max distance 128,
bidirectional), gated-GELU feed-forward (wi_0 * gelu-gate convention:
h = gelu(wi_0(x)) * wi_1(x)), no biases anywhere.

XXL: d_model 4096, d_ff 10240, 24 layers, 64 heads x 64.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


def relative_position_buckets(q_len: int, k_len: int, num_buckets: int = 32,
                              max_distance: int = 128) -> np.ndarray:
    """Bidirectional T5 bucket matrix [q_len, k_len], host-side."""
    context_pos = np.arange(q_len)[:, None]
    memory_pos = np.arange(k_len)[None, :]
    rel = memory_pos - context_pos
    nb = num_buckets // 2
    ret = (rel > 0).astype(np.int64) * nb
    n = np.abs(rel)
    max_exact = nb // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / np.log(max_distance / max_exact)
        * (nb - max_exact)).astype(np.int64)
    val_large = np.minimum(val_large, nb - 1)
    return ret + np.where(is_small, n, val_large)


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param('scale', nn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        return (x32 * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) \
            * scale.astype(x.dtype)


class T5Block(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_bias):
        b, s, _ = x.shape
        hd = self.d_model // self.num_heads
        h = RMSNorm(name='ln_attn')(x)
        dense = lambda f, name: nn.Dense(f, use_bias=False, dtype=self.dtype,
                                         name=name)
        q = dense(self.d_model, 'q')(h).reshape(b, s, self.num_heads, hd)
        k = dense(self.d_model, 'k')(h).reshape(b, s, self.num_heads, hd)
        v = dense(self.d_model, 'v')(h).reshape(b, s, self.num_heads, hd)
        # T5: NO 1/sqrt(d) scaling; bias added pre-softmax
        logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + pos_bias
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        attn = jnp.einsum('bhqk,bkhd->bqhd', probs.astype(self.dtype), v)
        x = x + dense(self.d_model, 'o')(attn.reshape(b, s, self.d_model))

        h = RMSNorm(name='ln_mlp')(x)
        g = dense(self.d_ff, 'wi_0')(h)
        g = jax.nn.gelu(g.astype(jnp.float32), approximate=True).astype(self.dtype)
        h = g * dense(self.d_ff, 'wi_1')(h)
        x = x + dense(self.d_model, 'wo')(h)
        return x


class T5Encoder(nn.Module):
    vocab_size: int = 32128
    d_model: int = 4096
    d_ff: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    rel_buckets: int = 32
    rel_max_distance: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        b, s = tokens.shape
        emb = self.param('token_embedding', nn.initializers.normal(1.0),
                         (self.vocab_size, self.d_model), jnp.float32)
        x = emb[tokens].astype(self.dtype)

        rel_bias = self.param('relative_attention_bias',
                              nn.initializers.normal(0.1),
                              (self.rel_buckets, self.num_heads), jnp.float32)
        buckets = jnp.asarray(relative_position_buckets(
            s, s, self.rel_buckets, self.rel_max_distance))
        pos_bias = rel_bias[buckets].transpose(2, 0, 1)[None]  # [1,H,S,S]

        for i in range(self.num_layers):
            x = T5Block(self.d_model, self.num_heads, self.d_ff,
                        dtype=self.dtype, name=f'block_{i}')(x, pos_bias)
        return RMSNorm(name='final_norm')(x)

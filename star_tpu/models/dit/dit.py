"""CogVideoX-5B DiT with STAR's SR modifications, TPU-first.

Behavioral reference: cogvideox-based/sat/dit_video_concat.py (mixins) +
cogvideox-based/transformer.py (SAT base layers with LIEM added).

Config (cogvideox_5b_infer_sr.yaml): 42 layers, hidden 3072, 48 heads
(head_dim 64), patch 2, latent 16ch (proj_sr consumes 32 = noisy||LQ
channel-concat), text T5-XXL 4096 -> 3072, text_length 226, time_embed 512,
adaLN-Zero 12-way per layer with separate text/img modulation, qk-LayerNorm,
3D RoPE (t:h:w = 16:24:24 of head_dim 64) on image tokens only, LIEM
spatial+temporal gates on the modulated attention input, final adaLN +
unpatchify. LoRA r=512 lives on the attention projections at training time
(lora_rank>0); converted checkpoints merge it.

TPU-first deltas: channels-last [B,T,H,W,C]; the 42 layers run under
lax.scan over stacked per-layer params (one compile of one layer); attention
uses ops.attention (Pallas flash at these ~10k-token sequences); RoPE tables
are host-precomputed static constants.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ...ops.attention import dot_product_attention
from ...ops.norms import layer_norm
from ..unet.blocks import sinusoidal_embedding


def rope_head_perm(head_dim: int) -> np.ndarray:
    """Head-dim permutation taking the reference's interleaved RoPE pairs
    (2i, 2i+1) to half-split slots (i, i + hd/2) — NeoX-style rotate_half.

    Attention logits are invariant under any shared q/k head-dim
    permutation, so this is a pure layout change; on TPU the half-split
    rotate is ONE 32-lane shift + negate, where the interleaved
    stack/reshape lowered to ~90 ms of pad/negate fusions per CogVideoX
    step (r3 trace). Converted checkpoints apply the same permutation to
    the q/k projection outputs and qk-LN params (convert_dit)."""
    return np.concatenate([np.arange(0, head_dim, 2),
                           np.arange(1, head_dim, 2)])


def rope_3d_tables(t_size: int, height: int, width: int, head_dim: int,
                   theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) tables [T*H*W, head_dim] for the 3D RoPE
    (dit_video_concat.py:254-311): dims split t=hd/4, h=w=3*hd/8; each
    frequency repeated twice (pair-interleaved in the reference), then
    permuted to the half-split basis (rope_head_perm)."""
    dim_t = head_dim // 4
    dim_h = head_dim // 8 * 3
    dim_w = head_dim // 8 * 3

    def freqs(dim):
        return 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2] / dim))

    ft = np.outer(np.arange(t_size), freqs(dim_t))
    fh = np.outer(np.arange(height), freqs(dim_h))
    fw = np.outer(np.arange(width), freqs(dim_w))
    rep2 = lambda a: np.repeat(a, 2, axis=-1)
    ft, fh, fw = rep2(ft), rep2(fh), rep2(fw)
    full = np.concatenate([
        np.broadcast_to(ft[:, None, None, :], (t_size, height, width, dim_t)),
        np.broadcast_to(fh[None, :, None, :], (t_size, height, width, dim_h)),
        np.broadcast_to(fw[None, None, :, :], (t_size, height, width, dim_w)),
    ], axis=-1).reshape(t_size * height * width, head_dim)
    full = full[:, rope_head_perm(head_dim)]
    return np.cos(full), np.sin(full)


def rotate_half_split(x: jax.Array) -> jax.Array:
    """(x0..x_{d/2-1}, x_{d/2}..x_{d-1}) -> (-x_{d/2}.., x_0..): the
    half-split rotate matching rope_3d_tables' permuted basis. Reference
    semantics (interleaved rotate, dit_video_concat.py:247-251) are
    recovered exactly by the shared q/k permutation — see rope_head_perm."""
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, S, H, D]; cos/sin: [S, D] (half-split basis)."""
    c = cos[None, :, None, :].astype(jnp.float32)
    s = sin[None, :, None, :].astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    return (x32 * c + rotate_half_split(x32) * s).astype(x.dtype)




def modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class SpatialLIEMTokens(nn.Module):
    """LIEM spatial gate on [BT, H, W, C] (transformer.py:316-340)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mx = jnp.max(x, axis=-1, keepdims=True)
        mn = jnp.mean(x, axis=-1, keepdims=True)
        w = nn.Conv(1, (7, 7), padding=3, use_bias=False, dtype=self.dtype,
                    name='conv')(jnp.concatenate([mx, mn], axis=-1))
        return jax.nn.sigmoid(w.astype(jnp.float32)).astype(x.dtype) * x


class TemporalLIEMTokens(nn.Module):
    """LIEM temporal gate on [BHW, T, C] (transformer.py:342-365)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mx = jnp.max(x, axis=-1, keepdims=True)
        mn = jnp.mean(x, axis=-1, keepdims=True)
        w = nn.Dense(1, use_bias=False, dtype=self.dtype, name='proj')(
            jnp.concatenate([mx, mn], axis=-1))
        return jax.nn.sigmoid(w.astype(jnp.float32)).astype(x.dtype) * x


class LoraDense(nn.Module):
    """Dense with optional additive LoRA (SAT LoraMixin r=512 on attention
    projections; B zero-init so init == base)."""
    features: int
    lora_rank: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                     name='base')(x)
        if self.lora_rank > 0:
            a = nn.Dense(self.lora_rank, use_bias=False, dtype=self.dtype,
                         name='lora_a')(x)
            y = y + nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                             kernel_init=nn.initializers.zeros,
                             name='lora_b')(a)
        return y


class DiTLayer(nn.Module):
    hidden_size: int
    num_heads: int
    text_length: int
    t_size: int
    height: int
    width: int
    lora_rank: int = 0
    liem: bool = True     # STAR SR adds LIEM gates; stock CogVideoX (T2V
    #                       demos, cli_demo.py) has none
    dtype: jnp.dtype = jnp.float32
    # Ulysses sequence parallelism (opt-in): shard the token dim over
    # `sp_axis` of `sp_mesh`; attention swaps seq<->heads via all_to_all
    # (reference consumer: opensora/models/layers/blocks.py:345-423)
    sp_mesh: Optional[Mesh] = None
    sp_axis: str = 'context'

    @nn.compact
    def __call__(self, h_states: jax.Array, emb: jax.Array,
                 rope_cos: jax.Array, rope_sin: jax.Array) -> jax.Array:
        hd = self.hidden_size // self.num_heads
        tl = self.text_length
        b, s, c = h_states.shape

        mod = nn.Dense(12 * self.hidden_size, dtype=self.dtype,
                       name='adaln')(jax.nn.silu(emb.astype(jnp.float32))
                                     .astype(self.dtype))
        (sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp,
         t_sh_msa, t_sc_msa, t_g_msa, t_sh_mlp, t_sc_mlp, t_g_mlp) = \
            jnp.split(mod, 12, axis=-1)

        def make_ln(name):
            scale = self.param(f'{name}_scale', nn.initializers.ones,
                               (c,), jnp.float32)
            bias = self.param(f'{name}_bias', nn.initializers.zeros,
                              (c,), jnp.float32)
            # eps 1e-5, NOT 1e-6: SAT builds per-layer norms as
            # layernorm(hidden_size, eps=layernorm_epsilon) — the call-site
            # eps=1e-5 overrides the partial's 1e-6 (transformer.py:414,
            # dit_video_concat.py:670); only the mixin-owned norms (qk-LN,
            # norm_final) really are 1e-6. Verified by the dit_small golden.
            return lambda x: layer_norm(x, scale, bias, eps=1e-5)

        input_ln = make_ln('input_ln')
        post_ln = make_ln('post_ln')

        text, img = h_states[:, :tl], h_states[:, tl:]

        # --- attention branch: ONE shared input layernorm applied separately
        # to text/img parts (dit_video_concat.py:518-521)
        img_in = modulate(input_ln(img), sh_msa, sc_msa)
        text_in = modulate(input_ln(text), t_sh_msa, t_sc_msa)

        # LIEM on the modulated image stream (dit_video_concat.py:523-533);
        # stock CogVideoX (T2V) has no LIEM
        # dead pad rows (SP carrying the stream at a padded length) sit at
        # the sequence tail: real image tokens are the first n_img rows
        n_img = self.t_size * self.height * self.width
        img_tail = img_in[:, n_img:]
        img_in = img_in[:, :n_img]
        if self.liem:
            bt = b * self.t_size
            spa = img_in.reshape(b, self.t_size, self.height, self.width, c)
            _spa_in = spa.reshape(bt, self.height, self.width, c)
            if (self.sp_mesh is not None
                    and self.sp_mesh.shape[self.sp_axis] > 1):
                # pin the 7x7 LIEM conv input replicated: XLA's spatially
                # partitioned conv produced wrong halos for seq-sharded
                # inputs inside nn.scan (observed at context=4 on the CPU
                # mesh); the gate conv is 2ch->1ch and cheap, the gather is
                # one layer's image tokens — same order as the Ulysses
                # all_to_alls
                _spa_in = jax.lax.with_sharding_constraint(
                    _spa_in, NamedSharding(self.sp_mesh, P()))
            spa = SpatialLIEMTokens(dtype=self.dtype, name='spa_local')(
                _spa_in)
            spa = spa.reshape(b, self.t_size, self.height, self.width, c)
            tmp = spa.transpose(0, 2, 3, 1, 4).reshape(
                b * self.height * self.width, self.t_size, c)
            tmp = TemporalLIEMTokens(dtype=self.dtype, name='temp_local')(tmp)
            img_in = tmp.reshape(b, self.height, self.width, self.t_size, c) \
                .transpose(0, 3, 1, 2, 4).reshape(b, n_img, c)

        attn_in = jnp.concatenate([text_in, img_in, img_tail], axis=1)
        qkv = LoraDense(3 * self.hidden_size, self.lora_rank,
                        dtype=self.dtype, name='qkv')(attn_in)
        q, k, v = jnp.split(qkv, 3, axis=-1)           # natural [B, S, C]
        # qk-LN (per layer, shared across heads; dit_video_concat.py:467-480)
        # fused with the 3D RoPE as ONE Pallas pass in natural layout
        # (ops/qk_ln_rope.py): rope_cos/rope_sin are full-sequence
        # head-tiled tables whose text/tail rows are identity rotations
        # (dit_video_concat.py:332-333 rotates image tokens only). The
        # attention softmax scale*log2e folds into q's LN affine (rotation
        # commutes with scalar scale), so the flash kernel skips its own
        # fold pass (prescaled=True).
        from ...ops.qk_ln_rope import LOG2E, qk_ln_rope
        q = qk_ln_rope(q, self.param('q_ln_scale', nn.initializers.ones,
                                     (hd,), jnp.float32),
                       self.param('q_ln_bias', nn.initializers.zeros,
                                  (hd,), jnp.float32),
                       rope_cos, rope_sin, self.num_heads,
                       fold_scale=LOG2E / math.sqrt(hd))
        k = qk_ln_rope(k, self.param('k_ln_scale', nn.initializers.ones,
                                     (hd,), jnp.float32),
                       self.param('k_ln_bias', nn.initializers.zeros,
                                  (hd,), jnp.float32),
                       rope_cos, rope_sin, self.num_heads)

        valid = tl + n_img
        sp_n = (self.sp_mesh.shape[self.sp_axis]
                if self.sp_mesh is not None else 1)
        if sp_n > 1:
            assert s % sp_n == 0 and self.num_heads % sp_n == 0, (
                f'Ulysses SP needs heads ({self.num_heads}) and the padded '
                f'seq ({s}) divisible by the {self.sp_axis!r} size {sp_n}')
            from ...parallel.ulysses import ulysses_attention
            from ...ops.flash_attention import LN2
            to4 = lambda t: t.reshape(b, s, self.num_heads, hd)
            attn = ulysses_attention(to4(q), to4(k), to4(v), self.sp_mesh,
                                     self.sp_axis, scale=LN2,
                                     kv_valid=valid if valid < s else None)
            attn = attn.reshape(b, s, self.hidden_size)
        else:
            # natural-layout attention: q/k/v never leave [B, S, H*D], the
            # packed flash kernel needs NO head transpose and the dead tail
            # (if the stream is carried padded) is masked via kv_valid
            from ...ops.attention import dot_product_attention_packed
            attn = dot_product_attention_packed(
                q, k, v, self.num_heads,
                kv_valid=valid if valid < s else None, prescaled=True)
        attn = LoraDense(self.hidden_size, self.lora_rank, dtype=self.dtype,
                         name='dense')(attn)

        text = text + t_g_msa[:, None, :] * attn[:, :tl]
        img = img + g_msa[:, None, :] * attn[:, tl:]

        # --- mlp branch --------------------------------------------------------
        img_m = modulate(post_ln(img), sh_mlp, sc_mlp)
        text_m = modulate(post_ln(text), t_sh_mlp, t_sc_mlp)
        mlp_in = jnp.concatenate([text_m, img_m], axis=1)
        hdn = nn.Dense(4 * self.hidden_size, dtype=self.dtype,
                       name='mlp_fc')(mlp_in)
        hdn = jax.nn.gelu(hdn.astype(jnp.float32), approximate=True) \
            .astype(self.dtype)
        mlp = nn.Dense(self.hidden_size, dtype=self.dtype,
                       name='mlp_proj')(hdn)

        text = text + t_g_mlp[:, None, :] * mlp[:, :tl]
        img = img + g_mlp[:, None, :] * mlp[:, tl:]
        return jnp.concatenate([text, img], axis=1)


class _DiTScanCell(nn.Module):
    """nn.scan cell: carry = (h, emb, rope_cos, rope_sin)."""
    hidden_size: int
    num_heads: int
    text_length: int
    t_size: int
    height: int
    width: int
    lora_rank: int = 0
    liem: bool = True
    dtype: jnp.dtype = jnp.float32
    sp_mesh: Optional[Mesh] = None
    sp_axis: str = 'context'

    @nn.compact
    def __call__(self, carry, _):
        h, emb, cos, sin = carry
        h = DiTLayer(hidden_size=self.hidden_size, num_heads=self.num_heads,
                     text_length=self.text_length, t_size=self.t_size,
                     height=self.height, width=self.width,
                     lora_rank=self.lora_rank, liem=self.liem,
                     dtype=self.dtype,
                     sp_mesh=self.sp_mesh, sp_axis=self.sp_axis,
                     name='layer')(h, emb, cos, sin)
        return (h, emb, cos, sin), None


class CogVideoDiT(nn.Module):
    """x [B, T, H, W, 2*Cz] (noisy||LQ channel-concat), t_idx [B] int,
    context [B, 226, 4096] -> v-prediction [B, T, H, W, Cz]."""
    hidden_size: int = 3072
    num_layers: int = 42
    num_heads: int = 48
    patch_size: int = 2
    latent_channels: int = 16
    text_hidden_size: int = 4096
    text_length: int = 226
    time_embed_dim: int = 512
    lora_rank: int = 0
    liem: bool = True     # False = stock CogVideoX-5B (T2V mode)
    scan_layers: bool = True
    dtype: jnp.dtype = jnp.float32
    # Ulysses SP opt-in for >13-latent-frame sampling: activations between
    # layers live sequence-sharded over `sp_axis`; attention all_to_alls to
    # head-sharded locally (parallel/ulysses.py)
    sp_mesh: Optional[Mesh] = None
    sp_axis: str = 'context'

    @nn.compact
    def __call__(self, x: jax.Array, t_idx: jax.Array,
                 context: jax.Array) -> jax.Array:
        b, t, hh, ww, cin = x.shape
        p = self.patch_size
        hp, wp = hh // p, ww // p
        c = self.hidden_size

        # timestep embedding (sinusoidal over model_channels=hidden_size,
        # then 512-dim MLP — dit_video_concat.py:690-694,799-800)
        e = sinusoidal_embedding(t_idx.astype(jnp.float32), c)
        e = nn.Dense(self.time_embed_dim, dtype=jnp.float32,
                     name='time_embed_1')(e)
        e = jax.nn.silu(e)
        e = nn.Dense(self.time_embed_dim, dtype=jnp.float32,
                     name='time_embed_2')(e).astype(self.dtype)

        # patchify (proj_sr, 2x2 stride-2 conv over 32 channels)
        xf = x.astype(self.dtype).reshape(b * t, hh, ww, cin)
        emb = nn.Conv(c, (p, p), strides=p, dtype=self.dtype,
                      name='proj_sr')(xf)
        emb = emb.reshape(b, t * hp * wp, c)
        text_emb = nn.Dense(c, dtype=self.dtype, name='text_proj')(
            context.astype(self.dtype))
        h_states = jnp.concatenate([text_emb, emb], axis=1)

        layer_cfg = dict(hidden_size=c, num_heads=self.num_heads,
                         text_length=self.text_length, t_size=t, height=hp,
                         width=wp, lora_rank=self.lora_rank, liem=self.liem,
                         dtype=self.dtype,
                         sp_mesh=self.sp_mesh, sp_axis=self.sp_axis)
        s_real = self.text_length + t * hp * wp
        sp_n = (self.sp_mesh.shape[self.sp_axis]
                if self.sp_mesh is not None else 1)
        # Carry the residual stream at a padded length: multiple of 16 so
        # the packed flash kernel finds divisor blocks (9676 -> 9680 — the
        # explicit pads cost ~45 ms/step in the r3 trace), and of the SP
        # axis so non-divisible sequences work sharded (round-2 review
        # item 8). Layers slice the real image rows for LIEM and mask the
        # dead tail out of attention (kv_valid); the tail is dropped before
        # the final layer.
        mult = 16 * sp_n // math.gcd(16, sp_n)
        s_pad = -(-s_real // mult) * mult
        if s_pad != s_real:
            h_states = jnp.pad(h_states,
                               ((0, 0), (0, s_pad - s_real), (0, 0)))
        if sp_n > 1:
            assert self.num_heads % sp_n == 0, (
                f'Ulysses SP needs heads ({self.num_heads}) divisible by '
                f'{self.sp_axis!r}={sp_n}')
            # keep the residual stream sequence-sharded between layers so
            # per-device activation memory scales 1/P (the point of SP)
            h_states = jax.lax.with_sharding_constraint(
                h_states, NamedSharding(self.sp_mesh,
                                        P(None, self.sp_axis, None)))

        # full-sequence head-tiled RoPE tables with identity rows for the
        # text tokens and the pad tail (layers apply qk-LN + RoPE as ONE
        # natural-layout elementwise chain — qk_ln_rope)
        hd_ = c // self.num_heads
        cos_np, sin_np = rope_3d_tables(t, hp, wp, hd_)
        cos_full = np.ones((s_pad, c), np.float32)
        sin_full = np.zeros((s_pad, c), np.float32)
        cos_full[self.text_length:s_real] = np.tile(cos_np,
                                                    (1, self.num_heads))
        sin_full[self.text_length:s_real] = np.tile(sin_np,
                                                    (1, self.num_heads))
        rope_cos = jnp.asarray(cos_full, jnp.float32)
        rope_sin = jnp.asarray(sin_full, jnp.float32)

        if self.scan_layers:
            # one traced layer, scanned over stacked per-layer params
            cell = nn.remat(_DiTScanCell, prevent_cse=False)
            scanned = nn.scan(
                cell,
                variable_axes={'params': 0},
                split_rngs={'params': True},
                length=self.num_layers,
                metadata_params={nn.PARTITION_NAME: None},
            )(**layer_cfg, name='layers')
            (h_states, _, _, _), _ = scanned((h_states, e, rope_cos, rope_sin),
                                             None)
        else:
            for i in range(self.num_layers):
                h_states = DiTLayer(**layer_cfg, name=f'layer_{i}')(
                    h_states, e, rope_cos, rope_sin)

        # transformer-level final layernorm over the full sequence BEFORE the
        # final-layer mixin (transformer.py:789-791; eps 1e-5 like the other
        # transformer-owned norms) — the checkpoint's
        # transformer.final_layernorm.{weight,bias}
        pscale = self.param('pre_final_ln_scale', nn.initializers.ones, (c,),
                            jnp.float32)
        pbias = self.param('pre_final_ln_bias', nn.initializers.zeros, (c,),
                           jnp.float32)
        h_states = layer_norm(h_states, pscale, pbias, eps=1e-5)

        # final layer (dit_video_concat.py:372-410); drop any SP pad tail
        img = h_states[:, self.text_length:self.text_length + t * hp * wp]
        fscale = self.param('final_ln_scale', nn.initializers.ones, (c,),
                            jnp.float32)
        fbias = self.param('final_ln_bias', nn.initializers.zeros, (c,),
                           jnp.float32)
        img = layer_norm(img, fscale, fbias, eps=1e-6)
        fmod = nn.Dense(2 * c, dtype=self.dtype, name='final_adaln')(
            jax.nn.silu(e.astype(jnp.float32)).astype(self.dtype))
        f_shift, f_scale = jnp.split(fmod, 2, axis=-1)
        img = modulate(img, f_shift, f_scale)
        img = nn.Dense(p * p * self.latent_channels, dtype=self.dtype,
                       name='final_linear')(img)
        # unpatchify: (b, t*hp*wp, p*p*cz) -> (b, t, h, w, cz)
        img = img.reshape(b, t, hp, wp, self.latent_channels, p, p)
        img = img.transpose(0, 1, 2, 5, 3, 6, 4)  # b,t,hp,p,wp,p,cz
        return img.reshape(b, t, hh, ww, self.latent_channels)

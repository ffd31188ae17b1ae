"""Context-parallel halo conv/GN and Ulysses SP attention vs single-device
references, on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from star_tpu.ops.attention import dot_product_attention
from star_tpu.ops.norms import group_norm
from star_tpu.parallel import make_mesh
from star_tpu.parallel.context_parallel import cp_causal_conv3d, cp_group_norm
from star_tpu.parallel.ulysses import ulysses_attention


def _ref_causal_conv(x, kernel, bias):
    kt, kh, kw = kernel.shape[:3]
    front = jnp.repeat(x[:, :1], kt - 1, axis=1)
    xp = jnp.concatenate([front, x], axis=1)
    out = jax.lax.conv_general_dilated(
        xp, kernel, (1, 1, 1),
        [(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    return out + bias


def test_cp_causal_conv_matches_single_device(eight_devices):
    mesh = make_mesh(context=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 6, 6, 4))
    kernel = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 4, 5)) * 0.2
    bias = jax.random.normal(jax.random.PRNGKey(2), (5,)) * 0.1
    ref = _ref_causal_conv(x, kernel, bias)
    with mesh:
        got = cp_causal_conv3d(x, kernel, bias, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_cp_group_norm_matches_global_stats(eight_devices):
    mesh = make_mesh(context=4)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 4, 4, 32)) * 2 + 1
    scale = jax.random.normal(jax.random.PRNGKey(4), (32,))
    bias = jax.random.normal(jax.random.PRNGKey(5), (32,))
    # reference: GN over the whole video per batch elem (gathered stats)
    ref = group_norm(x.reshape(2, -1, 32), scale, bias, 32,
                     1e-6).reshape(x.shape)
    with mesh:
        got = cp_group_norm(x, scale, bias, mesh, 32, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_ulysses_attention_matches_full(eight_devices):
    mesh = make_mesh(context=4)
    b, s, h, d = 2, 64, 8, 16
    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    ref = dot_product_attention(q, k, v)
    with mesh:
        got = ulysses_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_ulysses_rejects_indivisible_heads(eight_devices):
    mesh = make_mesh(context=4)
    q = jnp.zeros((1, 8, 6, 4))  # 6 heads not divisible by 4
    with pytest.raises(AssertionError):
        with mesh:
            ulysses_attention(q, q, q, mesh)


def test_dit_ulysses_sp_matches_unsharded(eight_devices):
    """CogVideoDiT with sp_mesh over 'context' == the plain forward — the
    Ulysses opt-in (VERDICT item 7; reference SP consumer:
    opensora/models/layers/blocks.py:345-423)."""
    from star_tpu.models.dit.dit import CogVideoDiT

    kw = dict(hidden_size=64, num_layers=2, num_heads=4, patch_size=2,
              latent_channels=4, text_hidden_size=32, text_length=8,
              time_embed_dim=16)
    b, t, h, w = 1, 2, 8, 8      # seq = 8 + 2*4*4 = 40, divisible by 2 and 4
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, h, w, 8))
    ti = jnp.array([5], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 8, 32))

    plain = CogVideoDiT(**kw)
    params = plain.init(jax.random.PRNGKey(2), x, ti, ctx)
    expect = plain.apply(params, x, ti, ctx)

    mesh = make_mesh(context=4)
    sp = CogVideoDiT(**kw, sp_mesh=mesh, sp_axis='context')
    with mesh:
        got = jax.jit(sp.apply)(params, x, ti, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=2e-5, rtol=1e-4)


def test_ulysses_pads_indivisible_seq(eight_devices):
    """s % axis != 0 pads + masks instead of asserting (round-2 review
    item 8); result equals the unsharded attention on the real rows."""
    mesh = make_mesh(context=4)
    b, s, h, d = 1, 61, 4, 16            # 61 % 4 != 0
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (b, s, h, d))
    k = jax.random.normal(ks[1], (b, s, h, d))
    v = jax.random.normal(ks[2], (b, s, h, d))
    ref = dot_product_attention(q, k, v)
    with mesh:
        got = jax.jit(lambda q, k, v: ulysses_attention(q, k, v, mesh))(
            q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_composed_pipeline_cp_sp_matches_single_device(eight_devices):
    """COMPOSED multi-device end-to-end: a tiny CogVideoSRPipeline whose
    jitted run graph contains BOTH the context-parallel causal-VAE encode
    (shard_map halos + gathered GN) AND the Ulysses-SP DiT, on a
    data=2 x context=4 mesh, must reproduce the single-device pipeline
    byte-for-byte(±1 uint8 rounding). The components are each tested alone;
    the composition is where the XLA-partitioner class of bug lives (the
    7x7-conv-under-scan halo bug). Reference composed path:
    cogvideox-based/sat/sample_sr.py:213-228 + vae_modules/cp_enc_dec.py
    :360-430 (cp_size>1 rank execution)."""
    from star_tpu.models.dit.dit import CogVideoDiT
    from star_tpu.models.t5.tokenizer import T5HashTokenizer
    from star_tpu.pipeline.cogvideo_sr import (CogModelBundle,
                                               CogSamplerConfig,
                                               CogVideoSRPipeline)
    from star_tpu.vae.causal_vae import (COGVIDEO_VAE_SCALING,
                                         CausalDecoder3D, CausalEncoder3D,
                                         CogVideoVAE, cp_encode)

    ENC_KW = dict(ch=32, ch_mult=(1, 1, 1, 1), num_res_blocks=1,
                  z_channels=4)
    CTX_DIM, TEXT_LEN = 32, 8

    class TinyVAE(CogVideoVAE):
        def setup(self):
            self.encoder = CausalEncoder3D(**ENC_KW, name='encoder')
            self.decoder = CausalDecoder3D(**ENC_KW, name='decoder')

    vae = TinyVAE()
    dit_kw = dict(hidden_size=64, num_layers=2, num_heads=4, patch_size=2,
                  latent_channels=4, text_hidden_size=CTX_DIM,
                  text_length=TEXT_LEN, time_embed_dim=16)
    dit = CogVideoDiT(**dit_kw)

    # 33 frames -> 9 latent frames (odd, chunked decode); CP encode needs
    # T = 1 + P*k with k = 8 surviving two temporal downsamples per rank.
    f, h, w = 33, 32, 48
    t_lat = (f - 1) // 4 + 1
    vparams = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, f, h, w, 3)))
    dparams = dit.init(jax.random.PRNGKey(1),
                       jnp.zeros((2, t_lat, h // 8, w // 8, 8)),
                       jnp.zeros((2,), jnp.int32),
                       jnp.zeros((2, TEXT_LEN, CTX_DIM)))

    def text_encode(_p, tokens):
        t = jnp.asarray(tokens, jnp.float32)
        return jnp.stack([t * (i + 1) / 1000.0 for i in range(CTX_DIM)],
                         axis=-1)

    class Tok(T5HashTokenizer):
        def __call__(self, texts, max_length=TEXT_LEN):
            return super().__call__(texts, max_length)

    def vae_decode_window(vp, latents, cache, first):
        variables = {'params': vp['params']}
        if cache:
            variables['cache'] = cache
        out, mut = vae.apply(variables, latents, True, first,
                             method=TinyVAE.decode, mutable=['cache'])
        return out, mut['cache']

    def make_pipe(dit_apply, vae_encode):
        bundle = CogModelBundle(
            dit_apply=dit_apply, vae_encode=vae_encode,
            vae_decode_window=vae_decode_window, text_encode=text_encode,
            tokenizer=Tok(),
            params={'dit': dparams, 'vae': vparams, 'text': {}})
        return CogVideoSRPipeline(bundle, CogSamplerConfig(num_steps=4))

    frames = (np.random.RandomState(0).uniform(0, 255, (f, h, w, 3))
              .astype(np.uint8))

    # --- single-device pipeline
    plain = make_pipe(
        lambda p, x, t, c: dit.apply(p, x, t, c),
        lambda p, v, key: vae.apply(p, v, key, method=TinyVAE.encode))
    expect = plain.enhance_a_video(frames, 'a boat', seed=3)

    # --- composed CP-encode + SP-DiT pipeline on the data=2 x context=4 mesh
    mesh = make_mesh(data=2, context=4)
    sp_dit = CogVideoDiT(**dit_kw, sp_mesh=mesh, sp_axis='context')

    def cp_vae_encode(vp, video, key):
        # mirrors CogVideoVAE.encode (causal_vae.py:337-346) with the
        # encoder run context-parallel inside the pipeline's jitted graph
        moments = cp_encode(vp['params']['encoder'], video, mesh, **ENC_KW)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        std = jnp.exp(0.5 * logvar.astype(jnp.float32)).astype(mean.dtype)
        mean = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
        return mean * COGVIDEO_VAE_SCALING

    sharded = make_pipe(lambda p, x, t, c: sp_dit.apply(p, x, t, c),
                        cp_vae_encode)
    with mesh:
        got = sharded.enhance_a_video(frames, 'a boat', seed=3)

    assert got.shape == expect.shape and got.dtype == np.uint8
    diff = np.abs(got.astype(np.int16) - expect.astype(np.int16))
    assert diff.max() <= 1, f'max uint8 diff {diff.max()}'
    assert (diff > 0).mean() < 0.01, f'{(diff > 0).mean():.4f} pixels differ'


def test_dit_sp_indivisible_seq_matches_unsharded(eight_devices):
    """CogVideoDiT under SP with seq % axis != 0 (odd-frame clips at
    context=4): the stream carries masked dead tail rows and the output
    matches the plain forward (round-2 review item 8)."""
    from star_tpu.models.dit.dit import CogVideoDiT

    # seq = 7 + 2*4*4 = 39, not divisible by 4
    kw = dict(hidden_size=64, num_layers=2, num_heads=4, patch_size=2,
              latent_channels=4, text_hidden_size=32, text_length=7,
              time_embed_dim=16)
    b, t, h, w = 1, 2, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(8), (b, t, h, w, 8))
    ti = jnp.array([5], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(9), (b, 7, 32))

    plain = CogVideoDiT(**kw)
    params = plain.init(jax.random.PRNGKey(10), x, ti, ctx)
    expect = plain.apply(params, x, ti, ctx)

    mesh = make_mesh(context=4)
    sp = CogVideoDiT(**kw, sp_mesh=mesh, sp_axis='context')
    with mesh:
        got = jax.jit(sp.apply)(params, x, ti, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=2e-5, rtol=1e-4)

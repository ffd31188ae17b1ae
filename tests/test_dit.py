"""CogVideoX DiT structure/behavior tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from star_tpu.models.dit.dit import (CogVideoDiT, rope_3d_tables,
                                     apply_rope, rope_head_perm,
                                     rotate_half_split)

TINY = dict(hidden_size=64, num_layers=2, num_heads=4, patch_size=2,
            latent_channels=4, text_hidden_size=32, text_length=8,
            time_embed_dim=16)


@pytest.fixture(scope='module')
def dit():
    m = CogVideoDiT(**TINY)
    b, t, h, w = 1, 3, 8, 12
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, h, w, 8))
    ti = jnp.array([500], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 8, 32))
    params = m.init(jax.random.PRNGKey(2), x, ti, ctx)
    return m, params, (x, ti, ctx)


def test_shapes_and_finiteness(dit):
    m, params, (x, ti, ctx) = dit
    out = m.apply(params, x, ti, ctx)
    assert out.shape == (1, 3, 8, 12, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_scan_params_are_stacked(dit):
    m, params, _ = dit
    qkv = params['params']['layers']['layer']['qkv']['base']['kernel']
    assert qkv.shape == (2, 64, 192)  # [layers, in, 3*hidden]


def test_scan_equals_unrolled(dit):
    """nn.scan over stacked layers == python-loop layers with the same
    per-layer weights."""
    m, params, (x, ti, ctx) = dit
    m2 = CogVideoDiT(**TINY, scan_layers=False)
    # un-stack: layer_i <- tree[...][i]
    stacked = params['params']['layers']['layer']
    unrolled = {}
    for i in range(TINY['num_layers']):
        unrolled[f'layer_{i}'] = jax.tree.map(lambda a: a[i], stacked)
    p2 = dict(params['params'])
    del p2['layers']
    p2.update(unrolled)
    out1 = m.apply(params, x, ti, ctx)
    out2 = m2.apply({'params': p2}, x, ti, ctx)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=2e-5)


def test_timestep_conditioning_matters(dit):
    m, params, (x, ti, ctx) = dit
    out1 = m.apply(params, x, jnp.array([10], jnp.int32), ctx)
    out2 = m.apply(params, x, jnp.array([900], jnp.int32), ctx)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_lq_channel_half_matters(dit):
    """proj_sr consumes [noisy || LQ]; zeroing the LQ half must change the
    output (the SR conditioning path)."""
    m, params, (x, ti, ctx) = dit
    x2 = x.at[..., 4:].set(0.0)
    out1 = m.apply(params, x, ti, ctx)
    out2 = m.apply(params, x2, ti, ctx)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_rope_rotation_preserves_norm():
    cos, sin = rope_3d_tables(2, 3, 4, 16)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 24, 2, 16))
    y = apply_rope(x, jnp.asarray(cos), jnp.asarray(sin))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1),
                               rtol=1e-5)


def test_rotate_half_split_matches_interleaved_reference():
    """Half-split rotate in the permuted basis == the reference's
    interleaved rotate (dit_video_concat.py:247-251) mapped through
    rope_head_perm — the logit-preserving TPU layout change."""
    d = 8
    perm = rope_head_perm(d)
    x = jnp.arange(float(d))[None]
    # reference interleaved rotate: (-x1, x0, -x3, x2, ...)
    ref = np.asarray([-1, 0, -3, 2, -5, 4, -7, 6], np.float32)
    got = np.asarray(rotate_half_split(x[:, perm]))[0]
    np.testing.assert_allclose(got, ref[perm])


def test_lora_zero_init_is_identity(dit):
    """lora_b is zero-init (SAT LoraMixin convention) -> a LoRA model with
    the same base weights computes exactly the base model's output."""
    m, params, (x, ti, ctx) = dit
    m_lora = CogVideoDiT(**TINY, lora_rank=4)
    p_lora = m_lora.init(jax.random.PRNGKey(7), x, ti, ctx)

    def graft(lora_tree, base_tree):
        out = {}
        for k, v in lora_tree.items():
            if isinstance(v, dict):
                out[k] = graft(v, base_tree.get(k, {})) \
                    if k in base_tree else v
            else:
                out[k] = base_tree.get(k, v)
        return out

    grafted = {'params': graft(p_lora['params'], params['params'])}
    out_base = m.apply(params, x, ti, ctx)
    out_lora = m_lora.apply(grafted, x, ti, ctx)
    np.testing.assert_allclose(np.asarray(out_lora), np.asarray(out_base),
                               atol=1e-6)

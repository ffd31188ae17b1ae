"""Structural/behavioral tests of the video UNet + ControlNet (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from star_tpu.models.unet.blocks import sinusoidal_embedding
from star_tpu.models.unet.unet import VideoUNetTrunk


TINY = dict(dim=32, dim_mult=(1, 2, 4, 4), head_dim=16,
            num_heads_init_temporal=2, context_dim=64, num_res_blocks=2)


class TinyControlled(nn.Module):
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.unet = VideoUNetTrunk(dtype=self.dtype, name='unet', **TINY)
        self.controlnet = VideoUNetTrunk(dtype=self.dtype, is_controlnet=True,
                                         name='controlnet', **TINY)

    def __call__(self, x, t, y, hint):
        controls = self.controlnet(x, t, y, hint=hint)
        return self.unet(x, t, y, controls=controls)


def _inputs(b=1, f=4, h=18, w=16, ctx=64):
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    return (jax.random.normal(ks[0], (b, f, h, w, 4)),
            jnp.array([899] * b, jnp.int32),
            jax.random.normal(ks[1], (b, 77, ctx)),
            jax.random.normal(ks[2], (b, f, h, w, 4)))


def test_sinusoidal_embedding_matches_reference_layout():
    # cos-first (unet_v2v.py:96-108)
    t = jnp.array([0.0, 500.0])
    emb = sinusoidal_embedding(t, 8)
    assert emb.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(emb[0, :4]), np.ones(4), atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), np.zeros(4), atol=1e-6)
    half = 4
    freqs = 10000.0 ** (-np.arange(half) / half)
    np.testing.assert_allclose(np.asarray(emb[1]), np.concatenate(
        [np.cos(500 * freqs), np.sin(500 * freqs)]), rtol=1e-5)


@pytest.fixture(scope='module')
def tiny_model():
    m = TinyControlled()
    x, t, y, hint = _inputs()
    params = m.init(jax.random.PRNGKey(0), x, t, y, hint)
    return m, params


def test_forward_shape_and_finite(tiny_model):
    m, params = tiny_model
    x, t, y, hint = _inputs()
    out = m.apply(params, x, t, y, hint)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_zero_init_head_gives_zero_output_at_init(tiny_model):
    """head_conv is zero-init (unet_v2v.py:1554-1555) -> freshly initialized
    model outputs exactly zero."""
    m, params = tiny_model
    x, t, y, hint = _inputs()
    out = m.apply(params, x, t, y, hint)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_controlnet_zero_convs_make_init_controls_zero(tiny_model):
    """All ControlNet taps go through zero-convs -> at init the control
    residuals are exactly zero and the UNet is unaffected by the hint."""
    m, params = tiny_model
    x, t, y, hint = _inputs()
    controls = m.apply(params, x, t, y, hint=hint,
                       method=lambda mdl, x, t, y, hint:
                       mdl.controlnet(x, t, y, hint=hint))
    assert len(controls) == 13
    for c in controls:
        np.testing.assert_allclose(np.asarray(c), 0.0)


def test_hint_changes_output_after_perturbing_zero_convs(tiny_model):
    """Sanity: once the zero convs are non-zero, the hint must matter."""
    m, params = tiny_model
    x, t, y, hint = _inputs()

    def bump(path, p):
        name = '/'.join(str(k) for k in path)
        if ('controlnet' in name and ('zero_conv' in name or 'middle_out' in name
                                      or 'input_hint' in name)) and 'kernel' in name:
            return p + 0.05
        return p
    params2 = jax.tree_util.tree_map_with_path(bump, params)
    ctrl_method = lambda mdl, x, t, y, hint: mdl.controlnet(x, t, y, hint=hint)
    c1 = m.apply(params2, x, t, y, hint=hint, method=ctrl_method)
    c2 = m.apply(params2, x, t, y, hint=hint * 0.0, method=ctrl_method)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(c1, c2))


def test_frame_count_flexibility(tiny_model):
    """Same params must serve any frame count (temporal layers are
    shape-polymorphic) — the pipeline's chunking depends on this."""
    m, params = tiny_model
    for f in (1, 2, 8):
        x, t, y, hint = _inputs(f=f)
        out = m.apply(params, x, t, y, hint)
        assert out.shape[1] == f


def test_spatial_shape_flexibility(tiny_model):
    m, params = tiny_model
    x, t, y, hint = _inputs(h=26, w=24)
    out = m.apply(params, x, t, y, hint)
    assert out.shape == x.shape


def test_temporal_inplace_attention_equals_transposed():
    """TemporalAttentionInplace([B,F,N,C]) must equal plain Attention on the
    reference's (B*N, F, C) transposed layout with the same weights."""
    from star_tpu.models.unet.blocks import Attention, TemporalAttentionInplace
    b, f, n, c = 2, 4, 6, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (b, f, n, c))
    m_new = TemporalAttentionInplace(2, 16, c)
    p = m_new.init(jax.random.PRNGKey(1), x)
    out_new = m_new.apply(p, x)

    m_old = Attention(2, 16, c)
    x_t = x.transpose(0, 2, 1, 3).reshape(b * n, f, c)
    out_old = m_old.apply(p, x_t)  # same param tree (to_q/k/v/out)
    out_old = out_old.reshape(b, n, f, c).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_old),
                               atol=1e-5)


def test_cfg_pair_prefix_matches_naive_pair():
    """cfg_pair=True (shared y-independent prefix at half batch) == running
    the duplicated pair through the default path (VERDICT item 9; reference
    runs the full pair end to end, diffusion_sdedit.py:44-115)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from star_tpu.models.unet.unet import ControlledV2VUNet

    m = ControlledV2VUNet(dim=32, dim_mult=(1, 2), num_res_blocks=1,
                          attn_scales=(1.0, 0.5), head_dim=16,
                          num_heads_init_temporal=2, context_dim=32)
    b, f, h, w = 1, 2, 10, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (b, f, h, w, 4))
    t = jnp.array([7], jnp.int32)
    hint = jax.random.normal(jax.random.PRNGKey(1), (b, f, h, w, 4))
    y_pair = jax.random.normal(jax.random.PRNGKey(2), (2 * b, 7, 32))

    params = m.init(jax.random.PRNGKey(3), x, t, y_pair[:b], x)
    # perturb zero-init convs so the ControlNet path actually contributes
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: v + 0.01 if any(s in '/'.join(map(str, p)) for s in
                                     ('zero_conv', 'middle_out', 'input_hint',
                                      'proj_out')) else v, params)

    xp = jnp.concatenate([x, x], axis=0)
    tp = jnp.concatenate([t, t], axis=0)
    hp = jnp.concatenate([hint, hint], axis=0)
    naive = m.apply(params, xp, tp, y_pair, hp)
    shared = m.apply(params, x, t, y_pair, hint, cfg_pair=True)
    assert shared.shape == naive.shape
    np.testing.assert_allclose(np.asarray(shared), np.asarray(naive),
                               atol=2e-5, rtol=1e-4)

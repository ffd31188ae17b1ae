"""CogVideoX diffusion math: golden parity + behavioral tests."""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from star_tpu.diffusion.vpsde_sampler import (sample_vpsde_dpmpp_2m,
                                              vpsde_dpmpp_2m_ladder)
from star_tpu.diffusion.zero_snr import (ZeroSNRDDPMDiscretization,
                                         dynamic_cfg_scale, video_scaling)


@pytest.fixture(scope='module')
def ref_discretizer():
    """Load the reference discretizer standalone (its sgm package needs
    pytorch_lightning, absent here) by faking the two util imports with
    their documented one-liners."""
    torch = pytest.importorskip('torch')
    base = '/root/reference/cogvideox-based/sat/sgm'
    for n in ('refsgm', 'refsgm.modules', 'refsgm.modules.diffusionmodules'):
        m = types.ModuleType(n)
        m.__path__ = []
        sys.modules.setdefault(n, m)
    util = types.ModuleType('refsgm.util')
    util.append_zero = lambda x: torch.cat([x, x.new_zeros([1])])
    sys.modules['refsgm.util'] = util
    dutil = types.ModuleType('refsgm.modules.diffusionmodules.util')

    def make_beta_schedule(schedule, n_timestep, linear_start=1e-4,
                           linear_end=2e-2, cosine_s=8e-3):
        assert schedule == 'linear'
        return (torch.linspace(linear_start**0.5, linear_end**0.5, n_timestep,
                               dtype=torch.float64)**2).numpy()

    dutil.make_beta_schedule = make_beta_schedule
    sys.modules['refsgm.modules.diffusionmodules.util'] = dutil
    spec = importlib.util.spec_from_file_location(
        'refsgm.modules.diffusionmodules.discretizer',
        base + '/modules/diffusionmodules/discretizer.py')
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_zero_snr_ladder_matches_reference(ref_discretizer):
    ref = ref_discretizer.ZeroSNRDDPMDiscretization(shift_scale=1.0)
    for n in (50, 25):
        s_ref, idx_ref = ref(n, do_append_zero=False, return_idx=True)
        s, idx = ZeroSNRDDPMDiscretization(shift_scale=1.0).get_sqrt_alphas(
            n, flip=True, return_idx=True)
        np.testing.assert_allclose(s, s_ref.numpy(), atol=1e-6)
        np.testing.assert_array_equal(idx, np.asarray(idx_ref))
    # n == num_timesteps: the reference's return_idx path crashes there
    # (UnboundLocalError) — ours defines idx; compare values only.
    s_ref = ref(1000, do_append_zero=False)
    s = ZeroSNRDDPMDiscretization(shift_scale=1.0).get_sqrt_alphas(1000)
    np.testing.assert_allclose(s, s_ref.numpy(), atol=1e-6)


def test_zero_snr_shift_scale(ref_discretizer):
    ref = ref_discretizer.ZeroSNRDDPMDiscretization(shift_scale=3.0)
    s_ref = ref(50, do_append_zero=False)
    s = ZeroSNRDDPMDiscretization(shift_scale=3.0).get_sqrt_alphas(50)
    np.testing.assert_allclose(s, s_ref.numpy(), atol=1e-6)


def test_video_scaling_convention():
    c_skip, c_out, c_in = video_scaling(0.8)
    assert c_skip == pytest.approx(0.8)
    assert c_out == pytest.approx(-np.sqrt(1 - 0.64))
    assert c_in == 1.0


def test_dynamic_cfg_schedule_values():
    # guiders.py:65: 1 + scale*(1-cos(pi*(i/N)^exp))/2
    assert dynamic_cfg_scale(6, 5, 50, 0) == pytest.approx(1.0)
    assert dynamic_cfg_scale(6, 5, 50, 50) == pytest.approx(7.0)
    mid = dynamic_cfg_scale(6, 5, 50, 25)
    assert 1.0 < mid < 7.0


def test_vpsde_ladder_structure():
    disc = ZeroSNRDDPMDiscretization()
    ladder, ts = vpsde_dpmpp_2m_ladder(disc, 50)
    assert len(ladder) == 51 and ladder[-1] == 1.0
    assert ladder[0] == 0.0          # zero-terminal-SNR head
    assert ts[0] == 999 and ts[-1] == 19   # descending conditioning ints
    assert np.all(np.diff(ladder) > 0)


def test_vpsde_sampler_perfect_model_recovers_x0():
    disc = ZeroSNRDDPMDiscretization()
    x0_true = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4, 4, 4)) * 0.4

    def denoise_fn(x, t, a, scale):
        return jnp.broadcast_to(x0_true, x.shape)

    out = sample_vpsde_dpmpp_2m(denoise_fn, jax.random.normal(
        jax.random.PRNGKey(1), x0_true.shape), disc, 50, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_true), atol=1e-3)


def test_vpsde_sampler_deterministic_and_step_count():
    disc = ZeroSNRDDPMDiscretization()
    calls = []

    def denoise_fn(x, t, a, scale):
        calls.append(1)
        return x * 0.5

    init = jnp.ones((1, 8))
    a = sample_vpsde_dpmpp_2m(denoise_fn, init, disc, 50, jax.random.PRNGKey(0))
    b = sample_vpsde_dpmpp_2m(denoise_fn, init, disc, 50, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # traced denoise calls: step0 + scan body (once) + terminal
    assert sum(calls) == 2 * 3

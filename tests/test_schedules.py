"""Golden parity of the noise schedule vs the PyTorch reference.

The reference has no test suite (SURVEY.md §4); we import its pure-torch
schedule module directly (read-only) and assert numerical agreement — the
schedule feeds every downstream sigma, so this anchors the whole diffusion
stack.
"""

import importlib.util
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from star_tpu.diffusion import (Schedule, build_sigma_ladder,
                                default_star_schedule, noise_schedule,
                                sigma_to_t, t_to_sigma, trailing_timesteps)

REF = '/root/reference/video_to_video/diffusion/schedules_sdedit.py'


def _load_ref_schedules():
    torch = pytest.importorskip('torch')
    spec = importlib.util.spec_from_file_location('ref_schedules', REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_logsnr_cosine_interp_matches_reference():
    ref = _load_ref_schedules()
    ref_sigmas = ref.noise_schedule('logsnr_cosine_interp', n=1000,
                                    zero_terminal_snr=True,
                                    scale_min=2.0, scale_max=4.0).numpy()
    ours = noise_schedule('logsnr_cosine_interp', n=1000,
                          zero_terminal_snr=True, scale_min=2.0,
                          scale_max=4.0)
    np.testing.assert_allclose(ours, ref_sigmas, rtol=0, atol=2e-6)
    assert ours[-1] == pytest.approx(1.0, abs=1e-7)  # zero terminal SNR


def test_karras_schedule_matches_reference():
    ref = _load_ref_schedules()
    ref_s = ref.karras_schedule(20, 0.01, 50.0, 7.0).numpy()
    ours = __import__('star_tpu.diffusion.schedules', fromlist=['karras_schedule']) \
        .karras_schedule(20, 0.01, 50.0, 7.0)
    np.testing.assert_allclose(ours, ref_s, atol=1e-6)


def test_alphas_identity():
    sched = default_star_schedule()
    np.testing.assert_allclose(sched.alphas**2 + sched.sigmas**2,
                               np.ones(1000), atol=1e-12)


def test_sigma_t_roundtrip():
    sched = default_star_schedule()
    for t in [0.0, 1.0, 13.0, 499.5, 874.0, 998.0]:
        sigma = t_to_sigma(sched, np.array([t]))[0]
        t_back = sigma_to_t(sched, float(sigma))
        assert abs(t_back - t) < 1e-3, (t, sigma, t_back)
    # terminal timestep maps to +inf (zero-terminal-SNR)
    assert np.isinf(t_to_sigma(sched, np.array([999.0]))[0])
    assert sigma_to_t(sched, np.inf) == 999.0


def test_trailing_fast_split_is_4_plus_11():
    """The 15-step fast ladder: 4 steps in [900,500), 11 in [500,0)
    (diffusion_sdedit.py:370-376 + inference defaults)."""
    steps = trailing_timesteps(1000, 15, t_max=999, t_min=0,
                               solver_mode='fast')
    assert len(steps) == 15
    assert steps[0] == 999.0
    np.testing.assert_allclose(steps[:4], [999, 874, 749, 624])
    np.testing.assert_allclose(steps[4], 500.0)
    assert steps[-1] > 0


def test_sigma_ladder_structure():
    sched = default_star_schedule()
    sig = build_sigma_ladder(sched, steps=15, solver_mode='fast',
                             discretization='trailing',
                             discard_penultimate_step=True)
    # inf head (t=999 under zero-terminal-SNR), 0 tail, monotone in between
    assert np.isinf(sig[0])
    assert sig[-1] == 0.0
    finite = sig[1:-1]
    assert np.all(np.diff(finite) < 0)
    assert len(sig) == 15  # 16 raw minus the discarded penultimate

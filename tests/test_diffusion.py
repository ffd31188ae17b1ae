"""Unit tests for the v-prediction diffusion core + solvers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick

from star_tpu.diffusion import (DiffusionTables, build_sigma_ladder,
                                default_star_schedule, diffuse,
                                denoise_to_x0, get_velocity, get_x0,
                                guide_rescale_combine, sample_dpmpp_2m_sde,
                                sample_heun)


@pytest.fixture(scope='module')
def sched():
    return default_star_schedule()


@pytest.fixture(scope='module')
def tables(sched):
    return DiffusionTables.from_schedule(sched)


def test_diffuse_and_invert(tables):
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 3, 4, 4, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([100, 899])
    xt = diffuse(tables, x0, t, noise)
    v = get_velocity(tables, x0, xt, t)
    x0_back = get_x0(tables, v, xt, t)
    np.testing.assert_allclose(np.asarray(x0_back), np.asarray(x0), atol=1e-4)


def test_velocity_definition(tables):
    # v = alpha*eps - sigma*x0  (equivalent form)
    key = jax.random.PRNGKey(2)
    x0 = jax.random.normal(key, (1, 8))
    eps = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
    t = jnp.array([500])
    xt = diffuse(tables, x0, t, eps)
    v = get_velocity(tables, x0, xt, t)
    a = tables.alphas[500]
    s = tables.sigmas[500]
    np.testing.assert_allclose(np.asarray(v), np.asarray(a * eps - s * x0),
                               atol=1e-5)


def test_guide_rescale_matches_reference_formula():
    key = jax.random.PRNGKey(4)
    y = jax.random.normal(key, (2, 64)) * 2.0 + 0.3
    u = jax.random.normal(jax.random.PRNGKey(5), (2, 64))
    gs, gr = 7.5, 0.2
    out = guide_rescale_combine(y, u, gs, gr)
    # reference math (diffusion_sdedit.py:89-97), torch std = ddof 1
    ref = np.asarray(u) + gs * (np.asarray(y) - np.asarray(u))
    ratio = (np.asarray(y).std(axis=1, ddof=1) /
             (ref.std(axis=1, ddof=1) + 1e-12))
    ref = ref * (gr * ratio + (1 - gr))[:, None]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5)


def test_guide_scale_one_is_conditional(tables):
    y = jnp.ones((1, 4))
    xt = jnp.zeros((1, 4))
    x0 = denoise_to_x0(tables, xt, jnp.array([10]), y, v_uncond=jnp.zeros_like(y),
                       guide_scale=1.0, guide_rescale=0.2)
    x0_plain = denoise_to_x0(tables, xt, jnp.array([10]), y)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x0_plain))


def _perfect_model(x0_true, tables):
    """Model that returns the exact v for the true x0 at any (xt, t)."""
    def fn(xt, t):
        a = tables.alphas[t]
        s = tables.sigmas[t]
        # v = (alpha*xt - x0)/sigma; at t=999 (alpha 0, sigma 1): v = -x0
        v = (a * xt - x0_true) / jnp.maximum(s, 1e-8)
        return denoise_to_x0(tables, xt, t[None] if t.ndim == 0 else t, v)
    return fn


def test_dpmpp_sde_recovers_x0_with_perfect_model(sched, tables):
    """With a model that always predicts the true x0, the sampler must return
    (approximately) that x0 regardless of the noise path."""
    key = jax.random.PRNGKey(7)
    x0_true = jax.random.normal(key, (1, 4, 6, 6)) * 0.5
    sigmas = build_sigma_ladder(sched, steps=15, solver_mode='fast')

    def model_fn(x, t):
        return jnp.broadcast_to(x0_true, x.shape)

    out = sample_dpmpp_2m_sde(model_fn, jax.random.normal(
        jax.random.PRNGKey(8), x0_true.shape), sched, sigmas,
        jax.random.PRNGKey(9))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_true), atol=1e-3)


def test_heun_recovers_x0_with_perfect_model(sched):
    key = jax.random.PRNGKey(10)
    x0_true = jax.random.normal(key, (1, 16)) * 0.3
    sigmas = build_sigma_ladder(sched, steps=10, solver_mode='normal',
                                discard_penultimate_step=False)

    def model_fn(x, t):
        return jnp.broadcast_to(x0_true, x.shape)

    out = sample_heun(model_fn, jax.random.normal(jax.random.PRNGKey(11),
                                                  x0_true.shape),
                      sched, sigmas, jax.random.PRNGKey(12))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_true), atol=1e-3)


def test_dpmpp_sde_is_deterministic_given_key(sched):
    x0_true = jnp.ones((1, 8))
    sigmas = build_sigma_ladder(sched, steps=15, solver_mode='fast')
    calls = []

    def model_fn(x, t):
        calls.append(1)
        return x * 0.9

    init = jnp.full((1, 8), 0.5)
    a = sample_dpmpp_2m_sde(model_fn, init, sched, sigmas, jax.random.PRNGKey(0))
    b = sample_dpmpp_2m_sde(model_fn, init, sched, sigmas, jax.random.PRNGKey(0))
    c = sample_dpmpp_2m_sde(model_fn, init, sched, sigmas, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_dpmpp_model_call_count(sched):
    """15-sigma fast ladder = 14 steps = 14 model calls (CFG batching is the
    caller's concern), but the scan traces the model only for the middle."""
    sigmas = build_sigma_ladder(sched, steps=15, solver_mode='fast')
    n_calls = 0

    def model_fn(x, t):
        nonlocal n_calls
        n_calls += 1
        return x

    sample_dpmpp_2m_sde(model_fn, jnp.zeros((1, 4)), sched, sigmas,
                        jax.random.PRNGKey(0))
    # traced calls: init(inf) + first finite + scan body (once) + terminal
    assert n_calls == 4

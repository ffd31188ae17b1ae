"""Diffusion ODE/SDE solvers as jittable scans.

Behavioral reference: /root/reference/video_to_video/diffusion/solvers_sdedit.py
(sample_heun, sample_dpmpp_2m_sde with BrownianTree noise). The sigma ladder is
a static host-side numpy array (possibly +inf at [0] for zero-terminal-SNR
schedules, 0 at [-1]); all special cases (the inf init step, the first 2M step
without history, the terminal denoise) resolve at trace time, so the hot middle
steps compile to a single lax.scan over one model evaluation.

SDE noise: torchsde's BrownianTree increments over disjoint [sigma_i, sigma_i+1]
intervals, normalized by 1/sqrt(dt), are iid N(0,1); we draw them from a
counter-based threefry stream instead (documented deviation — statistics match,
bits don't; SURVEY.md §7 hard part 4).

The solver state x stays float32 end-to-end (the model may compute in bf16
internally); matches the reference's fp32 sampler state.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import Schedule, sigma_to_t

# model_fn(x_scaled, t_int32_scalar) -> x0 prediction (same shape as x)
ModelFn = Callable[[jax.Array, jax.Array], jax.Array]


def _c_in(sigma: float) -> float:
    """EDM input preconditioning 1/sqrt(sigma^2+1) (solvers_sdedit.py:27-30)."""
    return 1.0 / float(np.sqrt(sigma * sigma + 1.0))


def _ladder_ts(schedule: Schedule, sigmas: np.ndarray) -> np.ndarray:
    """Rounded integer timesteps for each ladder sigma (model conditioning)."""
    ts = []
    for s in sigmas:
        if s == 0.0:
            ts.append(0)
        else:
            ts.append(int(round(sigma_to_t(schedule, float(s)))))
    return np.asarray(ts, dtype=np.int32)


def sample_dpmpp_2m_sde(model_fn: ModelFn, x_init: jax.Array,
                        schedule: Schedule, sigmas: np.ndarray,
                        key: jax.Array, eta: float = 1.0,
                        s_noise: float = 1.0,
                        solver_type: str = 'midpoint') -> jax.Array:
    """DPM-Solver++(2M) SDE over a static sigma ladder.

    x_init plays the role of the reference's `noise` argument: for STAR's SR
    sampling it is the t=899-noised LQ latent (video_to_video_model.py:100-111).

    Structure (all branch points static): the +inf init step and the first
    finite step (no 2M history) are unrolled; the uniform middle steps run as
    ONE lax.scan (single model trace); the terminal sigma=0 step is unrolled.
    """
    assert solver_type in ('midpoint', 'heun')
    sigmas = np.asarray(sigmas, dtype=np.float64)
    n = len(sigmas) - 1
    assert n >= 1 and sigmas[-1] == 0.0
    ts = _ladder_ts(schedule, sigmas)
    keys = jax.random.split(key, n)

    # x = noise * sigmas[0] (solvers_sdedit.py:157); with a +inf head the
    # product is never used — the inf branch reads x_init directly.
    start = 0
    if np.isinf(sigmas[0]):
        # Euler init from the terminal timestep (solvers_sdedit.py:166-169).
        denoised = model_fn(x_init.astype(jnp.float32), jnp.int32(ts[0]))
        x = denoised.astype(jnp.float32) + float(sigmas[1]) * x_init.astype(jnp.float32)
        start = 1
    else:
        x = x_init.astype(jnp.float32) * float(sigmas[0])

    def sde_update(x, denoised, old_denoised, h_last, sig, sig_next, step_key):
        """x_{i+1} from x_i; works with python floats or traced scalars."""
        h = jnp.log(sig) - jnp.log(sig_next)  # = (-log sig_next) - (-log sig)
        eta_h = eta * h
        decay = jnp.exp(-eta_h)
        phi = -jnp.expm1(-h - eta_h)
        x = (sig_next / sig) * decay * x + phi * denoised
        if old_denoised is not None:
            r = h_last / h
            if solver_type == 'heun':
                coef = phi / (-h - eta_h) + 1.0
            else:  # midpoint
                coef = 0.5 * phi
            x = x + coef * (1.0 / r) * (denoised - old_denoised)
        if eta > 0:
            noise = jax.random.normal(step_key, x.shape, jnp.float32)
            x = x + noise * (sig_next * jnp.sqrt(-jnp.expm1(-2.0 * eta_h)) * s_noise)
        return x, h

    old_denoised = None
    h_last = None
    if start < n - 1:
        # first finite step (no 2M history), unrolled
        i = start
        sig, sig_next = float(sigmas[i]), float(sigmas[i + 1])
        denoised = model_fn(x * _c_in(sig), jnp.int32(ts[i])).astype(jnp.float32)
        x, h_last = sde_update(x, denoised, None, None,
                               jnp.float32(sig), jnp.float32(sig_next), keys[i])
        old_denoised = denoised

        # uniform middle steps: i in [start+1, n-2], scanned
        mid = np.arange(start + 1, n - 1)
        if len(mid):
            xs = (jnp.asarray(sigmas[mid], jnp.float32),
                  jnp.asarray(sigmas[mid + 1], jnp.float32),
                  jnp.asarray(ts[mid]),
                  keys[mid])

            def body(carry, inp):
                x, old_d, h_last = carry
                sig, sig_next, t, k = inp
                denoised = model_fn(x * (1.0 / jnp.sqrt(sig * sig + 1.0)),
                                    t).astype(jnp.float32)
                x, h = sde_update(x, denoised, old_d, h_last, sig, sig_next, k)
                return (x, denoised, h), None

            (x, old_denoised, h_last), _ = jax.lax.scan(
                body, (x, old_denoised, h_last), xs)

    # terminal step: sigma_next == 0 -> x = denoised (solvers_sdedit.py:173-175)
    i = n - 1
    sig = float(sigmas[i])
    x = model_fn(x * _c_in(sig), jnp.int32(ts[i])).astype(jnp.float32)
    return x


def sample_heun(model_fn: ModelFn, x_init: jax.Array, schedule: Schedule,
                sigmas: np.ndarray, key: jax.Array, s_churn: float = 0.0,
                s_tmin: float = 0.0, s_tmax: float = float('inf'),
                s_noise: float = 1.0) -> jax.Array:
    """Karras Algorithm 2 (Heun) over a static sigma ladder
    (solvers_sdedit.py:33-74)."""
    sigmas = np.asarray(sigmas, dtype=np.float64)
    n = len(sigmas) - 1
    ts = _ladder_ts(schedule, sigmas)
    keys = jax.random.split(key, n)

    if np.isinf(sigmas[0]):
        x = x_init.astype(jnp.float32)
    else:
        x = x_init.astype(jnp.float32) * float(sigmas[0])

    for i in range(n):
        sig, sig_next = float(sigmas[i]), float(sigmas[i + 1])
        gamma = 0.0
        if s_tmin <= sig <= s_tmax and np.isfinite(sig):
            gamma = min(s_churn / n, 2**0.5 - 1.0)
        sigma_hat = sig * (gamma + 1.0)
        if gamma > 0:
            eps = jax.random.normal(keys[i], x.shape, jnp.float32) * s_noise
            x = x + eps * float(np.sqrt(sigma_hat**2 - sig**2))
        if np.isinf(sig):
            denoised = model_fn(x_init.astype(jnp.float32), jnp.int32(ts[i]))
            x = denoised.astype(jnp.float32) + sig_next * (gamma + 1.0) * x_init.astype(jnp.float32)
        else:
            denoised = model_fn(x * _c_in(sigma_hat), jnp.int32(ts[i])).astype(jnp.float32)
            d = (x - denoised) / sigma_hat
            dt = sig_next - sigma_hat
            if sig_next == 0.0:
                x = x + d * dt
            else:
                x_2 = x + d * dt
                denoised_2 = model_fn(x_2 * _c_in(sig_next), jnp.int32(ts[i + 1])).astype(jnp.float32)
                d_2 = (x_2 - denoised_2) / sig_next
                x = x + (d + d_2) / 2.0 * dt
    return x


SOLVERS = {
    'dpmpp_2m_sde': sample_dpmpp_2m_sde,
    'heun': sample_heun,
}

"""VPSDE-DPM++(2M) sampler in sqrt(alpha-bar) parameterization (CogVideoX
path), as a jittable scan.

Behavioral reference: sampling.py:574-685 (VPSDEDPMPP2MSampler over
VideoDDIMSampler) with DynamicCFG (guiders.py:61-79). Faithful quirks:
  * the ladder appends sqrt(alpha)=1 (clean) and iterates 50 steps; the final
    step (idx==1) returns the denoised estimate directly;
  * DynamicCFG's step_index is num_steps - t_int (the raw integer timestep,
    e.g. 50-999) — reproduced bit-for-bit via host float64 math, since the
    reference computes it in python;
  * fresh SDE noise mult_noise * N(0,1) every step (threefry keys here,
    BrownianTree-free; statistics match).

denoise_fn contract: denoise_fn(x, t_int32, sqrt_alpha_f32, cfg_scale_f32)
-> guided denoised x0, float32, same shape as x. The caller owns CFG pair
batching + the channel-concat LQ conditioning (engine semantics,
diffusion_video.py:277-289).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .zero_snr import ZeroSNRDDPMDiscretization, dynamic_cfg_scale

DenoiseFn = Callable[[jax.Array, jax.Array, jax.Array, jax.Array], jax.Array]


def _lamb(s):  # log(sqrt(a)/sqrt(1-a)) with a = s^2; -inf at s=0 is valid
    with np.errstate(divide='ignore'):
        return np.log(s / np.sqrt(1.0 - s * s))


def vpsde_dpmpp_2m_ladder(disc: ZeroSNRDDPMDiscretization, num_steps: int):
    """-> (sqrt_alpha ladder incl. terminal 1.0 [n+1], int timesteps [n],
    DynamicCFG scales [n] placeholder-free). timesteps[i] conditions step i."""
    s, idx = disc.get_sqrt_alphas(num_steps, flip=True, return_idx=True)
    ladder = np.concatenate([s, [1.0]])
    ts_asc = np.asarray(idx)                      # ascending ints
    # step i uses timesteps[-(i+1)] of [-1] + ts_asc  (sampling.py:492,563)
    t_for_step = np.concatenate([[-1], ts_asc])[::-1][:num_steps]
    return ladder, t_for_step.astype(np.int64)


def _sample_vp_dpmpp_2m(denoise_fn: DenoiseFn, x_init: jax.Array,
                        disc: ZeroSNRDDPMDiscretization, num_steps: int,
                        key: jax.Array, guider_scale: float,
                        guider_exp: float, sde: bool) -> jax.Array:
    ladder, t_for_step = vpsde_dpmpp_2m_ladder(disc, num_steps)
    n = num_steps
    # host-precomputed per-step constants (float64 python math == reference)
    cfg_scales = np.array([
        dynamic_cfg_scale(guider_scale, guider_exp, n, float(n - int(t)))
        for t in t_for_step], dtype=np.float64)

    def step_consts(i):
        # inf-safe: at step 0 the ladder starts at sqrt_alpha = 0 -> h = +inf,
        # exp(-h) = 0, expm1(-2h) = -1 (sampling.py:594-599 relies on the
        # same torch inf semantics)
        with np.errstate(divide='ignore', over='ignore'):
            a, a_next = np.float64(ladder[i]), np.float64(ladder[i + 1])
            lam, lam_next = _lamb(a), _lamb(a_next)
            h = lam_next - lam
            if sde:    # sampling.py:600-610
                mult1 = float(np.sqrt((1 - a_next**2) / (1 - a**2))
                              * np.exp(-h))
                mult2 = float(np.expm1(-2.0 * h) * a_next)
                mult_noise = float(np.sqrt(1 - a_next**2)
                                   * np.sqrt(1 - np.exp(-2 * h)))
            else:      # VPODE variant, sampling.py:705-714: deterministic
                mult1 = float(np.sqrt((1 - a_next**2) / (1 - a**2)))
                mult2 = float(np.expm1(-h) * a_next)
                mult_noise = 0.0
            if i == 0:
                return mult1, mult2, mult_noise, 0.0, 0.0
            a_prev = np.float64(ladder[i - 1])
            h_last = lam - _lamb(a_prev)
            r = h_last / h
            return (mult1, mult2, mult_noise,
                    float(1.0 + 1.0 / (2 * r)), float(1.0 / (2 * r)))

    keys = jax.random.split(key, n)
    x = x_init.astype(jnp.float32)

    # ---- step 0: standard (no history) --------------------------------------
    d0 = denoise_fn(x, jnp.int32(t_for_step[0]), jnp.float32(ladder[0]),
                    jnp.float32(cfg_scales[0])).astype(jnp.float32)
    m1, m2, mn, _, _ = step_consts(0)
    x = m1 * x - m2 * d0 + mn * jax.random.normal(keys[0], x.shape, jnp.float32)
    old_denoised = d0

    # ---- steps 1..n-2: scanned advanced path ---------------------------------
    mids = np.arange(1, n - 1)
    if len(mids):
        consts = np.stack([step_consts(int(i)) for i in mids])  # [m, 5]
        xs = (jnp.asarray(consts, jnp.float32),
              jnp.asarray(t_for_step[mids].astype(np.int32)),
              jnp.asarray(ladder[mids], jnp.float32),
              jnp.asarray(cfg_scales[mids], jnp.float32),
              keys[mids])

        def body(carry, inp):
            x, old_d = carry
            c, t, a, sc, k = inp
            m1, m2, mn, m3, m4 = c[0], c[1], c[2], c[3], c[4]
            denoised = denoise_fn(x, t, a, sc).astype(jnp.float32)
            denoised_d = m3 * denoised - m4 * old_d
            noise = jax.random.normal(k, x.shape, jnp.float32)
            x = m1 * x - m2 * denoised_d + mn * noise
            return (x, denoised), None

        (x, old_denoised), _ = jax.lax.scan(body, (x, old_denoised), xs)

    # ---- final step (idx == 1): x = denoised (sampling.py:625-626) ----------
    x = denoise_fn(x, jnp.int32(t_for_step[n - 1]),
                   jnp.float32(ladder[n - 1]),
                   jnp.float32(cfg_scales[n - 1])).astype(jnp.float32)
    return x


def sample_vpsde_dpmpp_2m(denoise_fn: DenoiseFn, x_init: jax.Array,
                          disc: ZeroSNRDDPMDiscretization, num_steps: int,
                          key: jax.Array, guider_scale: float = 6.0,
                          guider_exp: float = 5.0) -> jax.Array:
    """Stochastic variant (sampling.py:574-685) — STAR's configured sampler."""
    return _sample_vp_dpmpp_2m(denoise_fn, x_init, disc, num_steps, key,
                               guider_scale, guider_exp, sde=True)


def sample_vpode_dpmpp_2m(denoise_fn: DenoiseFn, x_init: jax.Array,
                          disc: ZeroSNRDDPMDiscretization, num_steps: int,
                          key: jax.Array | None = None,
                          guider_scale: float = 6.0,
                          guider_exp: float = 5.0) -> jax.Array:
    """Deterministic VPODE-DPM++(2M) (sampling.py:688-773): same ladder /
    timestep indexing / DynamicCFG, but ODE mults (no exp(-h) damping in
    mult1, expm1(-h) in mult2) and zero injected noise. Config-reachable in
    the reference engine; ported for capability parity."""
    if key is None:
        key = jax.random.PRNGKey(0)   # unused: mult_noise is 0 on every step
    return _sample_vp_dpmpp_2m(denoise_fn, x_init, disc, num_steps, key,
                               guider_scale, guider_exp, sde=False)

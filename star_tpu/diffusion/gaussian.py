"""v-prediction Gaussian diffusion as pure jittable functions.

Behavioral reference: GaussianDiffusion in
/root/reference/video_to_video/diffusion/diffusion_sdedit.py (diffuse/get_x0/
get_velocity/denoise with CFG + guide-rescale). State (the sigma/alpha tables)
is passed explicitly; everything here is shape-polymorphic and jit-safe.

Device tables are float32; the mixing math runs in float32 regardless of the
model compute dtype (the reference keeps fp32 sampler state — SURVEY.md §7
hard part 6).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import Schedule


class DiffusionTables(NamedTuple):
    """Device-resident float32 schedule tables."""
    sigmas: jax.Array  # [T]
    alphas: jax.Array  # [T]

    @classmethod
    def from_schedule(cls, schedule: Schedule) -> 'DiffusionTables':
        return cls(sigmas=jnp.asarray(schedule.sigmas, jnp.float32),
                   alphas=jnp.asarray(schedule.alphas, jnp.float32))

    @property
    def num_timesteps(self) -> int:
        return self.sigmas.shape[0]


def _bcast(table: jax.Array, t: jax.Array, x: jax.Array) -> jax.Array:
    """Gather table[t] and broadcast to x's rank with leading batch dim."""
    vals = table[t]
    return vals.reshape(vals.shape + (1,) * (x.ndim - vals.ndim))


def diffuse(tables: DiffusionTables, x0: jax.Array, t: jax.Array,
            noise: jax.Array) -> jax.Array:
    """xt = alpha_t * x0 + sigma_t * noise."""
    a = _bcast(tables.alphas, t, x0).astype(x0.dtype)
    s = _bcast(tables.sigmas, t, x0).astype(x0.dtype)
    return a * x0 + s * noise


def get_velocity(tables: DiffusionTables, x0: jax.Array, xt: jax.Array,
                 t: jax.Array) -> jax.Array:
    a = _bcast(tables.alphas, t, xt).astype(xt.dtype)
    s = _bcast(tables.sigmas, t, xt).astype(xt.dtype)
    return (a * xt - x0) / s


def get_x0(tables: DiffusionTables, v: jax.Array, xt: jax.Array,
           t: jax.Array) -> jax.Array:
    a = _bcast(tables.alphas, t, xt).astype(xt.dtype)
    s = _bcast(tables.sigmas, t, xt).astype(xt.dtype)
    return a * xt - s * v


def guide_rescale_combine(y_out: jax.Array, u_out: jax.Array,
                          guide_scale: float,
                          guide_rescale: float | None) -> jax.Array:
    """Classifier-free guidance with the sigma-ratio rescale trick.

    Mirrors diffusion_sdedit.py:89-97: out = u + gs*(y-u), then scale by
    rescale*std(y)/std(out) + (1-rescale). Stats are per-batch-element over
    all non-batch dims, computed in float32.
    """
    out = u_out + guide_scale * (y_out - u_out)
    if guide_rescale is not None and guide_rescale > 0:
        b = y_out.shape[0]
        y32 = y_out.astype(jnp.float32).reshape(b, -1)
        o32 = out.astype(jnp.float32).reshape(b, -1)
        ratio = jnp.std(y32, axis=1, ddof=1) / (jnp.std(o32, axis=1, ddof=1) + 1e-12)
        scale = guide_rescale * ratio + (1.0 - guide_rescale)
        out = out * scale.reshape((b,) + (1,) * (out.ndim - 1)).astype(out.dtype)
    return out


def denoise_to_x0(tables: DiffusionTables, xt: jax.Array, t: jax.Array,
                  v_cond: jax.Array, v_uncond: jax.Array | None = None,
                  guide_scale: float | None = None,
                  guide_rescale: float | None = None,
                  clamp: float | None = None) -> jax.Array:
    """Combine (guided) v predictions into x0 at timestep t.

    The caller runs the network (batched CFG pair or single); this applies
    guidance and the v->x0 conversion in float32.
    """
    if v_uncond is None or guide_scale is None or guide_scale == 1.0:
        out = v_cond
    else:
        out = guide_rescale_combine(v_cond, v_uncond, guide_scale, guide_rescale)
    a = _bcast(tables.alphas, t, xt).astype(jnp.float32)
    s = _bcast(tables.sigmas, t, xt).astype(jnp.float32)
    x0 = a * xt.astype(jnp.float32) - s * out.astype(jnp.float32)
    if clamp is not None:
        x0 = jnp.clip(x0, -clamp, clamp)
    return x0

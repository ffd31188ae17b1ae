"""CogVideoX SR training step (LoRA + final_layer + proj_sr + LIEM).

Behavioral reference: SRDiffusionLoss (loss.py:196-278) +
SATVideoDiffusionEngine.disable_untrainable_params (diffusion_video.py:94-117):
  * uniform DiscreteSampling of sqrt(alpha-bar) indices;
  * noised = a*x + sqrt(1-a^2)*eps, channel-concat LQ latent (loss.py:234);
  * denoiser with VideoScaling and the c_skip-on-noise-half rule;
  * loss = w * MSE(x0_hat, x0), w = 1/(1-a^2) (v-pred weighting), plus the
    timestep-aware Fourier term when pixel supervision is provided;
  * trainable set: LoRA A/B, final layer, proj_sr, LIEM 'local' params.

The reference broadcasts noise/idx over the MP group; with pjit sharding the
replicas share one program, so that collective does not exist here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.zero_snr import ZeroSNRDDPMDiscretization
from .losses import star_sr_loss


def cog_is_trainable(path: str) -> bool:
    """diffusion_video.py:94-117: lora, final_layer, proj_sr, LIEM."""
    return any(s in path for s in ('lora_a', 'lora_b', 'final_linear',
                                   'final_adaln', 'final_ln', 'proj_sr',
                                   'spa_local', 'temp_local'))


def cog_trainable_mask(params: Any) -> Any:
    def _m(p, leaf):
        name = '/'.join(str(getattr(k, 'key', k)) for k in p)
        return cog_is_trainable(name)
    return jax.tree_util.tree_map_with_path(_m, params)


@dataclasses.dataclass(frozen=True)
class CogTrainConfig:
    learning_rate: float = 1e-4
    max_grad_norm: float = 1.0
    num_idx: int = 1000
    shift_scale: float = 1.0
    freq_loss: bool = True
    freq_grad: bool = False
    ema_decay: float = 0.0        # 0 disables; reference SAT carries EMA
    #                               (diffusion_video.py use_ema hooks)


def make_cog_optimizer(cfg: CogTrainConfig, params: Any):
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                     optax.adamw(cfg.learning_rate))
    labels = jax.tree.map(lambda m: 'train' if m else 'freeze',
                          cog_trainable_mask(params))
    return optax.multi_transform({'train': tx, 'freeze': optax.set_to_zero()},
                                 labels)


def make_cog_train_state(cfg: CogTrainConfig, params: Any):
    """(TrainState, tx) — mirrors trainer.make_train_state for the Cog side
    (EMA shadow params when ema_decay > 0, frozen leaves stateless)."""
    from .trainer import TrainState
    tx = make_cog_optimizer(cfg, params)
    ema = None
    if cfg.ema_decay > 0:
        from .ema import init_ema
        ema = init_ema(params)
    return TrainState(jnp.zeros((), jnp.int32), params, tx.init(params),
                      ema), tx


def make_cog_train_step(cfg: CogTrainConfig, dit_apply: Callable[..., Any],
                        tx, vae_decode: Optional[Callable] = None):
    disc = ZeroSNRDDPMDiscretization(shift_scale=cfg.shift_scale)
    # full 1000-entry sqrt(alpha) table (flip=False: index == timestep)
    sqrt_alphas = jnp.asarray(
        disc.get_sqrt_alphas(cfg.num_idx, flip=False), jnp.float32)

    def loss_fn(params, batch, idx, noise):
        from .trainer import stop_frozen_grads
        params = stop_frozen_grads(params, cog_trainable_mask(params))
        gt = batch['gt_latent'].astype(jnp.float32)     # [B,T,h,w,16]
        a = sqrt_alphas[idx].reshape((-1,) + (1,) * (gt.ndim - 1))
        noised = a * gt + jnp.sqrt(1.0 - a * a) * noise
        xin = jnp.concatenate([noised, batch['lq_latent'].astype(jnp.float32)],
                              axis=-1)
        v = dit_apply(params, xin, idx, batch['y']).astype(jnp.float32)
        # denoiser output (x0_hat) with c_skip on the noise half
        x0_hat = v * (-jnp.sqrt(1.0 - a * a)) + noised * a
        w = 1.0 / (1.0 - a * a)                        # v-pred weighting
        loss_l2 = jnp.mean(w * (x0_hat - gt) ** 2)
        metrics = {'loss_v': loss_l2}
        loss = loss_l2
        if cfg.freq_loss and vae_decode is not None and 'gt_pixels' in batch:
            pred = x0_hat if cfg.freq_grad else jax.lax.stop_gradient(x0_hat)
            pred_pixels = vae_decode(pred)
            _, m2 = star_sr_loss(v, v, idx, pred_pixels, batch['gt_pixels'],
                                 freq_grad=cfg.freq_grad)
            tn = idx.astype(jnp.float32) / 999.0
            ct = jnp.mean(tn ** 2)
            weight_t = jnp.mean(1.0 - tn)
            loss_t = 0.01 * (ct * m2['loss_low'] + (1 - ct) * m2['loss_high'])
            loss = loss_l2 + weight_t * loss_t
            metrics.update(loss_low=m2['loss_low'], loss_high=m2['loss_high'])
        metrics['total_loss'] = loss
        return loss, metrics

    def train_step(state, batch, key):
        k_idx, k_noise = jax.random.split(key)
        b = batch['gt_latent'].shape[0]
        # uniform_sampling=True DiscreteSampling (sigma_sampling.py:19)
        idx = jax.random.randint(k_idx, (b,), 0, cfg.num_idx)
        noise = jax.random.normal(k_noise, batch['gt_latent'].shape,
                                  jnp.float32)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, idx, noise)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if cfg.ema_decay > 0 and ema is not None:
            from .ema import update_ema
            ema = update_ema(ema, params, cfg.ema_decay)
        from .trainer import TrainState
        metrics = dict(metrics)
        metrics['grad_norm'] = optax.global_norm(grads)
        return TrainState(state.step + 1, params, opt_state, ema), metrics

    return train_step

"""optax trainer for the I2VGen-XL SR ControlNet (+ LIEM) fine-tune.

Behavioral reference: train_sr.py (torchrun x8 + Accelerate DDP, AdamW lr
5e-5, grad-clip on ControlNet params, trainable set = VideoControlNet + any
param named 'local', ckpt every N steps with save_state).

TPU-first deltas:
  * one jitted train_step; DP via batch sharding over the mesh 'data' axis +
    TP via param sharding rules (parallel/sharding.py) — XLA emits the
    gradient all-reduce that DDP does by hand.
  * frozen params carry no optimizer state (optax.masked) — the ZeRO-ish
    saving the reference gets from only passing trainable params to AdamW.
  * checkpoint/resume via orbax with step tracking — the reference parses
    --resume_from_checkpoint but never consumes it (train_sr.py:122-130,
    SURVEY.md §5); here resume actually works.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..diffusion import DiffusionTables, diffuse, get_velocity, get_x0
from .losses import star_sr_loss


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 5e-5
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_eps: float = 1e-8
    weight_decay: float = 1e-2
    max_grad_norm: float = 1.0
    num_timesteps: int = 1000
    freq_loss: bool = True        # compute the frequency metric/loss
    freq_grad: bool = False       # reference parity: metric only
    warmup_steps: int = 0
    ema_decay: float = 0.0        # 0 disables; reference uses 0.9999
                                  # (opensora train_utils.py:7 update_ema)


def is_trainable(path: str) -> bool:
    """ControlNet params + LIEM ('local*') params of the main UNet
    (train_sr.py:481-495)."""
    return ('controlnet' in path) or ('local1' in path) or ('local2' in path)


def trainable_mask(params: Any) -> Any:
    def _m(path, leaf):
        name = '/'.join(str(getattr(k, 'key', k)) for k in path)
        return is_trainable(name)
    return jax.tree_util.tree_map_with_path(_m, params)


def stop_frozen_grads(params: Any, mask: Any = None) -> Any:
    """Reference parity: frozen params carry requires_grad=False
    (train_sr.py:481-495). stop_gradient on the frozen leaves lets XLA
    DCE their cotangent computation entirely — ~P_frozen fp32 grad
    buffers plus the param-grad matmuls vanish from the backward."""
    if mask is None:
        mask = trainable_mask(params)
    return jax.tree.map(
        lambda m, p: p if m else jax.lax.stop_gradient(p), mask, params)


def cast_frozen(params: Any, dtype=jnp.bfloat16, mask: Any = None) -> Any:
    """Hold frozen leaves in `dtype` (model compute is bf16 regardless);
    trainable masters stay fp32. Halves the frozen tree's HBM footprint —
    the single-chip equivalent of the reference keeping the frozen base
    in half precision under Accelerate mixed precision."""
    if mask is None:
        mask = trainable_mask(params)
    return jax.tree.map(
        lambda m, p: p if m else p.astype(dtype), mask, params)


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any = None        # populated when TrainConfig.ema_decay > 0


def make_optimizer(cfg: TrainConfig, params: Any) -> optax.GradientTransformation:
    mask = trainable_mask(params)
    sched: Any = cfg.learning_rate
    if cfg.warmup_steps:
        sched = optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(sched, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                    eps=cfg.adam_eps, weight_decay=cfg.weight_decay),
    )
    labels = jax.tree.map(lambda m: 'train' if m else 'freeze', mask)
    # frozen leaves carry NO optimizer state and get zero updates
    return optax.multi_transform({'train': tx, 'freeze': optax.set_to_zero()},
                                 labels)


def make_train_state(cfg: TrainConfig, params: Any) -> tuple[TrainState,
                                                             optax.GradientTransformation]:
    tx = make_optimizer(cfg, params)
    ema = None
    if cfg.ema_decay > 0:
        from .ema import init_ema
        ema = init_ema(params)
    return TrainState(jnp.zeros((), jnp.int32), params, tx.init(params),
                      ema), tx


def make_train_step(cfg: TrainConfig,
                    unet_apply: Callable[..., jax.Array],
                    tables: DiffusionTables,
                    tx: optax.GradientTransformation,
                    vae_decode: Optional[Callable[[jax.Array], jax.Array]] = None):
    """Build the jitted train step.

    batch: dict with
      gt_latent [B,F,h,w,4], lq_latent [B,F,h,w,4], y [B,L,C],
      optional gt_pixels [B,F,H,W,3] (needed for the frequency loss).
    unet_apply(params, x, t, y, hint) -> v.
    """

    def loss_fn(params, batch, t, noise):
        params = stop_frozen_grads(params)
        gt = batch['gt_latent'].astype(jnp.float32)
        noised = diffuse(tables, gt, t, noise)
        v_pred = unet_apply(params, noised, t, batch['y'],
                            batch['lq_latent'])
        v_target = get_velocity(tables, gt, noised, t)
        pred_pixels = gt_pixels = None
        if cfg.freq_loss and vae_decode is not None and 'gt_pixels' in batch:
            pred_x0 = get_x0(tables, v_pred.astype(jnp.float32), noised, t)
            if not cfg.freq_grad:
                pred_x0 = jax.lax.stop_gradient(pred_x0)
            pred_pixels = vae_decode(pred_x0)
            gt_pixels = batch['gt_pixels']
        return star_sr_loss(v_pred, v_target, t, pred_pixels, gt_pixels,
                            freq_grad=cfg.freq_grad)

    def preview_x0(params, batch, key, t_fixed: int = 499):
        """One-shot denoise of the batch at a fixed t -> predicted pixels
        (training preview; counterpart of the reference engine's log_video,
        diffusion_video.py:293-380). Requires vae_decode."""
        b = batch['gt_latent'].shape[0]
        t = jnp.full((b,), t_fixed, jnp.int32)
        gt = batch['gt_latent'].astype(jnp.float32)
        noise = jax.random.normal(key, gt.shape, jnp.float32)
        noised = diffuse(tables, gt, t, noise)
        v = unet_apply(params, noised, t, batch['y'], batch['lq_latent'])
        x0 = get_x0(tables, v.astype(jnp.float32), noised, t)
        return vae_decode(x0) if vae_decode is not None else x0

    def train_step(state: TrainState, batch, key):
        kt, kn = jax.random.split(key)
        b = batch['gt_latent'].shape[0]
        t = jax.random.randint(kt, (b,), 0, cfg.num_timesteps)
        noise = jax.random.normal(kn, batch['gt_latent'].shape, jnp.float32)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, t, noise)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if cfg.ema_decay > 0 and ema is not None:
            from .ema import update_ema
            ema = update_ema(ema, params, cfg.ema_decay)
        new_state = TrainState(state.step + 1, params, opt_state, ema)
        metrics = dict(metrics)
        metrics['grad_norm'] = optax.global_norm(grads)
        return new_state, metrics

    def loss_and_grads(params, batch, key):
        """fwd + bwd + grad-norm only, scalars out — no optimizer state,
        no materialized full grad tree (XLA frees each leaf after its
        square-sum). Benchmarks the step's compute on memory-tight
        single-chip configs (tools/bench_train.py --grads_only)."""
        kt, kn = jax.random.split(key)
        b = batch['gt_latent'].shape[0]
        t = jax.random.randint(kt, (b,), 0, cfg.num_timesteps)
        noise = jax.random.normal(kn, batch['gt_latent'].shape, jnp.float32)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, t, noise)
        metrics = dict(metrics)
        metrics['grad_norm'] = optax.global_norm(grads)
        return metrics

    train_step.preview_x0 = preview_x0
    train_step.loss_and_grads = loss_and_grads
    return train_step

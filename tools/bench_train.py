"""Bench ONE real train step on the chip: the train_sr.sh recipe shape
(reference: video_super_resolution/scripts/train_sr.sh:1-14 — bs=1 per
device, 32 frames, lr 5e-5; trainable set = ControlNet + LIEM 'local*'
params, train_sr.py:481-495) at 720p-grid latents [1, F, 90, 160, 4].

Measures the jitted fwd+bwd+AdamW step (remat'd UNet blocks, fp32 params,
bf16 compute — the cli/train_sr.py configuration) and, separately, the
frequency-loss overhead (rfft2 metric on VAE-decoded pred pixels,
train_sr.py:566-704 — stop-gradient metric, reference parity).

Run on the real chip (background; compile is slow through the tunnel):
    python tools/bench_train.py [--frames 32] [--iters 3] [--freq]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames', type=int, default=32)
    ap.add_argument('--lat_h', type=int, default=90)
    ap.add_argument('--lat_w', type=int, default=160)
    ap.add_argument('--iters', type=int, default=3)
    ap.add_argument('--freq', action='store_true',
                    help='ALSO bench the step with the frequency loss '
                         '(adds a full VAE decode of pred_x0 per step)')
    ap.add_argument('--no_remat', action='store_true')
    ap.add_argument('--grads_only', action='store_true',
                    help='bench fwd+bwd+clip WITHOUT AdamW moment state '
                         '(m/v fp32 for the 0.63B trainable set = 5.0G; '
                         'the full f=8 step needs 18.79G > 15.75G HBM). '
                         'The moment update is param-elementwise and '
                         'frame-independent — measure it as '
                         '(full - grads_only) at a fitting frame count.')
    ap.add_argument('--fp32_frozen', action='store_true',
                    help='keep frozen params fp32 (default: bf16 — the '
                         'frozen 1.41B tree halves to 2.8G; compute is '
                         'bf16 regardless)')
    ap.add_argument('--cpu', action='store_true',
                    help='smoke-test the script on CPU (tiny shapes)')
    ap.add_argument('--tiny', action='store_true',
                    help='scaled-down model pair (smoke only)')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    from star_tpu.diffusion import DiffusionTables, default_star_schedule
    from star_tpu.models.unet.unet import ControlledV2VUNet
    from star_tpu.train import TrainConfig, make_train_state, make_train_step
    from star_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    b, f, h, w = 1, args.frames, args.lat_h, args.lat_w
    print(f'[t] build b={b} f={f} latents {h}x{w} remat={not args.no_remat}',
          flush=True)
    mkw = dict(dtype=jnp.bfloat16, remat=not args.no_remat)
    ctx_dim = 1024
    if args.tiny:
        ctx_dim = 32
        mkw.update(dim=32, dim_mult=(1, 2), attn_scales=(1.0, 0.5),
                   head_dim=16, num_heads_init_temporal=2,
                   context_dim=ctx_dim)
    model = ControlledV2VUNet(**mkw)
    x = jnp.zeros((b, f, h, w, 4), jnp.bfloat16)
    t = jnp.zeros((b,), jnp.int32)
    y = jnp.zeros((b, 77, ctx_dim), jnp.bfloat16)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t, y, x)
    # fp32 masters for the trainable set (flax default; the CLI
    # loads/creates the same); frozen leaves bf16 unless --fp32_frozen
    from star_tpu.train import cast_frozen, trainable_mask
    if not args.fp32_frozen:
        shapes = jax.eval_shape(cast_frozen, shapes)
    params = jax.device_put(jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes))
    n_par = sum(p.size for p in jax.tree.leaves(params))
    mask = trainable_mask(params)
    n_tr = sum(p.size for p, m in zip(jax.tree.leaves(params),
                                      jax.tree.leaves(mask)) if m)
    print(f'[t] params {n_par / 1e9:.2f}B ({n_tr / 1e9:.2f}B trainable fp32, '
          f'frozen {"fp32" if args.fp32_frozen else "bf16"})', flush=True)

    def run_config(freq: bool):
        cfg = TrainConfig(freq_loss=freq)
        if args.grads_only:
            import optax
            tx = optax.identity()          # unused by loss_and_grads
            state = None
        else:
            state, tx = make_train_state(cfg, params)
        vae_decode = None
        batch = {'gt_latent': jnp.zeros((b, f, h, w, 4), jnp.float32),
                 'lq_latent': jnp.zeros((b, f, h, w, 4), jnp.bfloat16),
                 'y': y}
        if freq:
            from star_tpu.pipeline.build import init_random_models
            models = init_random_models(jax.random.PRNGKey(1))
            vae_decode = lambda z: models.vae.apply(
                models.vae_params, z, method=type(models.vae).decode)
            batch['gt_pixels'] = jnp.zeros((b, f, h * 8, w * 8, 3),
                                           jnp.bfloat16)
        tables = DiffusionTables.from_schedule(default_star_schedule())
        raw = make_train_step(
            cfg,
            lambda p, xx, tt, yy, hint: model.apply(p, xx, tt, yy, hint,
                                                    deterministic=True),
            tables, tx, vae_decode=vae_decode)
        if args.grads_only:
            # scalars-only fwd+bwd+grad-norm: no optimizer state, no
            # materialized grad tree (each leaf freed after its square-sum)
            gstep = jax.jit(raw.loss_and_grads)
            run = lambda st: (st, gstep(params, batch, key))
        else:
            step = jax.jit(raw, donate_argnums=(0,))
            run = lambda st: step(st, batch, key)

        key = jax.random.PRNGKey(2)
        print(f'[t] compile freq={freq} grads_only={args.grads_only}',
              flush=True)
        t0 = time.time()
        state, m = run(state)
        jax.device_get(m['loss_v'])
        print(f'[t] compile+first step {time.time() - t0:.1f}s', flush=True)
        times = []
        for i in range(args.iters):
            t0 = time.time()
            state, m = run(state)
            jax.device_get(m['loss_v'])      # host readback sync (tunnel)
            times.append(time.time() - t0)
            print(f'[t] iter {i}: {times[-1] * 1e3:.0f} ms', flush=True)
        times.sort()
        return times[len(times) // 2]

    base = run_config(False)
    key_base = ('train_fwd_bwd_clip_ms' if args.grads_only
                else 'train_step_ms')
    out = {key_base: round(base * 1e3, 1), 'frames': f,
           'latents': [h, w], 'params_B': round(n_par / 1e9, 3)}
    print('[t] base: ' + json.dumps(out), flush=True)
    if args.freq:
        with_freq = run_config(True)
        out['train_step_freq_ms'] = round(with_freq * 1e3, 1)
        out['freq_overhead_ms'] = round((with_freq - base) * 1e3, 1)
    print(json.dumps(out))


if __name__ == '__main__':
    main()

"""ControlNet+LIEM fine-tuning driver.

Behavioral reference: video_super_resolution/scripts/train_sr.py +
train_sr.sh (8xGPU DDP, bs 1/device, lr 5e-5, 15k steps, ckpt every 500,
tensorboard scalars loss_v/loss_low/loss_high/lr) — rebuilt as one jitted
sharded train step over the mesh 'data' axis.

Improvements over the reference (documented):
  * --resume actually works (the reference parses --resume_from_checkpoint
    but never consumes it, train_sr.py:122-130);
  * frozen params carry no optimizer state;
  * metrics go to a JSONL file (host-light observability) per process 0.

    python -m star_tpu.cli.train_sr --data_root paired/ --output_dir runs/x \
        --max_train_steps 15000 --checkpointing_steps 500
"""

from __future__ import annotations

import json
import os
import time
from argparse import ArgumentParser


def parse_args():
    p = ArgumentParser()
    p.add_argument('--data_root', required=True,
                   help='dir with gt/ lq/ text/ triplets')
    p.add_argument('--image_data', action='store_true',
                   help='data_root holds gt/ + sr_bicubic/ PNG image pairs '
                        '(PairedCaptionImageDataset, ref dataset.py:63) — '
                        'trains on single-frame clips')
    p.add_argument('--output_dir', required=True)
    p.add_argument('--pretrained', default=None,
                   help='converted UNet weights (orbax) to start from')
    p.add_argument('--vae_weights', default=None)
    p.add_argument('--clip_weights', default=None)
    p.add_argument('--learning_rate', type=float, default=5e-5)
    p.add_argument('--max_grad_norm', type=float, default=1.0)
    p.add_argument('--max_train_steps', type=int, default=15000)
    p.add_argument('--checkpointing_steps', type=int, default=500)
    p.add_argument('--num_frames', type=int, default=32)
    p.add_argument('--batch_size', type=int, default=1)
    p.add_argument('--seed', type=int, default=666)
    p.add_argument('--resume', action='store_true')
    p.add_argument('--freq_loss', action='store_true', default=True)
    p.add_argument('--allow_random_weights', action='store_true')
    p.add_argument('--data_parallel', type=int, default=1,
                   help='mesh data axis; global batch = batch_size * this '
                        '(reference: torchrun x8, bs 1/device)')
    p.add_argument('--tensor_parallel', type=int, default=1,
                   help='mesh tensor axis (Megatron-style head/MLP sharding)')
    p.add_argument('--frozen_bf16', action='store_true',
                   help='hold the frozen (non-trainable) param tree in '
                        'bf16 — halves its HBM footprint; compute is bf16 '
                        'regardless, trainable masters stay fp32')
    p.add_argument('--ema_decay', type=float, default=0.0,
                   help='EMA of params; reference default 0.9999, 0 = off')
    p.add_argument('--sample_every', type=int, default=0,
                   help='decode a denoise preview of the current batch every '
                        'N steps into output_dir/samples (engine log_video '
                        'counterpart); 0 = off')
    p.add_argument('--coordinator', default=None,
                   help='host:port for multi-host jax.distributed init '
                        '(replaces the reference torchrun/NCCL bootstrap; '
                        'also honors JAX_COORDINATOR_ADDRESS)')
    return p.parse_args()


def collect_samples(it, reset, n):
    """Pull n samples from the (cycling) dataset iterator.

    Fixes the round-1 defect where the loop always built a batch of 1 and
    could not shard it over data_parallel>1. `reset` re-creates the iterator
    at epoch end. Returns (samples, it)."""
    out = []
    while len(out) < n:
        try:
            out.append(next(it))
        except StopIteration:
            it = reset()
    return out, it


def stack_batch(samples):
    """Stack per-sample dicts into batched arrays (host-side numpy)."""
    import numpy as np
    gt = np.stack([s['gt'] for s in samples])
    lq = np.stack([s['lq'] for s in samples])
    texts = [s['text'] for s in samples]
    return gt, lq, texts


def main():
    args = parse_args()
    import jax
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..data.dataset import PairedCaptionVideoDataset
    from ..diffusion import DiffusionTables, default_star_schedule
    from ..parallel import AXIS_DATA, init_distributed, make_hybrid_mesh, \
        make_mesh, shard_params
    from ..pipeline.build import init_random_models, make_bundle
    from ..train import TrainConfig, TrainState, make_train_state, \
        make_train_step
    from ..utils.logger import get_logger
    from ..utils.seed import setup_seed

    logger = get_logger()
    proc_idx, proc_cnt = init_distributed(args.coordinator)
    if proc_cnt > 1:
        logger.info('multi-host: process %d/%d, %d local / %d global devices',
                    proc_idx, proc_cnt, jax.local_device_count(),
                    jax.device_count())
    key = setup_seed(args.seed)
    os.makedirs(args.output_dir, exist_ok=True)

    # ---- models -------------------------------------------------------------
    if args.pretrained and os.path.exists(args.pretrained):
        from ..convert.load import load_star_models
        models = load_star_models(args.pretrained, dtype=jnp.bfloat16)
    elif args.allow_random_weights:
        logger.warning('training from RANDOM weights (smoke run)')
        models = init_random_models(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    else:
        raise FileNotFoundError('--pretrained not found; pass '
                                '--allow_random_weights for a smoke run')
    bundle = make_bundle(models,
                         allow_hash_tokenizer=args.allow_random_weights)

    # multi-host: 'data' strides across hosts (DCN), TP stays on ICI
    mesh = (make_hybrid_mesh(data=args.data_parallel,
                             tensor=args.tensor_parallel) if proc_cnt > 1
            else make_mesh(data=args.data_parallel,
                           tensor=args.tensor_parallel))
    cfg = TrainConfig(learning_rate=args.learning_rate,
                      max_grad_norm=args.max_grad_norm,
                      freq_loss=args.freq_loss,
                      ema_decay=args.ema_decay)
    with mesh:
        params = shard_params(models.unet_params, mesh)
        if args.frozen_bf16:
            from ..train import cast_frozen
            params = cast_frozen(params)
        state, tx = make_train_state(cfg, params)
        if args.data_parallel > 1:
            # ZeRO-1: shard AdamW moments over the data axis
            from ..parallel.zero import shard_opt_state
            state = state._replace(
                opt_state=shard_opt_state(state.opt_state, mesh))
        tables = DiffusionTables.from_schedule(default_star_schedule())
        raw_step = make_train_step(
            cfg,
            lambda p, x, t, y, hint: models.unet.apply(p, x, t, y, hint,
                                                       deterministic=True),
            tables, tx,
            vae_decode=(lambda z: bundle.vae_decode(
                bundle.params['vae'], z)) if args.freq_loss else None)
        step_fn = jax.jit(raw_step)
        preview_fn = jax.jit(raw_step.preview_x0)

        ckpt_dir = os.path.abspath(os.path.join(args.output_dir, 'ckpt'))
        mngr = ocp.CheckpointManager(ckpt_dir, options=ocp.CheckpointManagerOptions(
            max_to_keep=3, save_interval_steps=args.checkpointing_steps))
        start_step = 0
        if args.resume and mngr.latest_step() is not None:
            start_step = mngr.latest_step()
            restored = mngr.restore(start_step, args=ocp.args.StandardRestore(
                state))
            state = restored
            logger.info('resumed from step %d', start_step)

        from ..data.prefetch import PrefetchIterator
        if args.image_data:
            from ..data.dataset import PairedCaptionImageDataset
            ds = PairedCaptionImageDataset(args.data_root)
        else:
            ds = PairedCaptionVideoDataset(args.data_root, args.num_frames,
                                           seed=args.seed)
        global_batch = args.batch_size * args.data_parallel
        # background-thread decode overlaps the device step (the reference's
        # DataLoader(num_workers) counterpart; cv2 releases the GIL)
        make_it = lambda: PrefetchIterator(ds, depth=2 * global_batch)
        batch_sh = NamedSharding(mesh, P(AXIS_DATA))
        metrics_path = os.path.join(args.output_dir, 'metrics.jsonl')

        it = make_it()
        t_last = time.time()
        for step in range(start_step, args.max_train_steps):
            # every process iterates the SAME seeded dataset, so the global
            # batch is identical host-side and device_put to the host-spanning
            # 'data' sharding is well-defined (each host keeps its shard)
            samples, it = collect_samples(it, make_it, global_batch)
            gt_np, lq_np, texts = stack_batch(samples)
            gt = jax.device_put(jnp.asarray(gt_np), batch_sh)
            lq = jax.device_put(jnp.asarray(lq_np), batch_sh)
            k_enc, k_step, key = jax.random.split(key, 3)
            gt_lat = bundle.vae_encode(bundle.params['vae'], gt, k_enc)
            lq_lat = bundle.vae_encode(bundle.params['vae'], lq, None)
            tokens = jnp.asarray(bundle.tokenizer(texts))
            y = bundle.text_encode(bundle.params['text'], tokens)
            batch = {'gt_latent': jax.device_put(gt_lat, batch_sh),
                     'lq_latent': jax.device_put(lq_lat, batch_sh),
                     'y': jax.device_put(y, batch_sh)}
            if args.freq_loss:
                batch['gt_pixels'] = jax.device_put(gt, batch_sh)
            state, metrics = step_fn(state, batch, k_step)
            if args.sample_every and (step + 1) % args.sample_every == 0 \
                    and args.freq_loss:
                # split on ALL processes so `key` stays host-identical
                # (splitting only on rank 0 would desync the SPMD step keys)
                k_prev, key = jax.random.split(key)
            if args.sample_every and (step + 1) % args.sample_every == 0 \
                    and args.freq_loss and jax.process_index() == 0:
                from ..data.io import save_video
                pix = preview_fn(state.params, batch, k_prev)
                frames = np.asarray(jax.device_get(
                    jnp.clip(pix[0].astype(jnp.float32) * 0.5 + 0.5, 0, 1)
                    * 255)).astype(np.uint8)
                save_video(frames, os.path.join(args.output_dir, 'samples'),
                           f'step{step + 1:06d}.mp4', fps=8)
            mngr.save(step + 1, args=ocp.args.StandardSave(state))
            if jax.process_index() == 0:
                row = {k: float(v) for k, v in metrics.items()}
                row.update(step=step + 1, lr=args.learning_rate,
                           sec_per_step=time.time() - t_last)
                t_last = time.time()
                with open(metrics_path, 'a') as f:
                    f.write(json.dumps(row) + '\n')
                if (step + 1) % 10 == 0:
                    logger.info('step %d loss %.4f', step + 1,
                                row['total_loss'])
        mngr.wait_until_finished()


if __name__ == '__main__':
    main()

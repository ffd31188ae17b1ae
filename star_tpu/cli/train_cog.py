"""CogVideoX SR fine-tuning driver (LoRA + final layer + proj_sr + LIEM).

Behavioral reference: the SAT training plumbing the reference carries even
without a launcher script — arguments.py:179-253 (distributed init +
deepspeed args), diffusion_video.py:94-164 (disable_untrainable_params,
shared_step) and loss.py:196-278 (SRDiffusionLoss). Rebuilt as one jitted
sharded train step over a DP x TP mesh, with the conveniences the I2VGen-XL
CLI already has: working orbax resume, EMA, JSONL metrics, frozen params
carrying no optimizer state.

    python -m star_tpu.cli.train_cog --data_root paired/ --output_dir runs/c \
        --allow_random_weights --max_train_steps 100
"""

from __future__ import annotations

import json
import os
import time
from argparse import ArgumentParser


def parse_args():
    p = ArgumentParser()
    p.add_argument('--data_root', required=True,
                   help='dir with gt/ lq/ text/ triplets (720x480 clips)')
    p.add_argument('--output_dir', required=True)
    p.add_argument('--model_path', default=None,
                   help='converted weights dir ({dit,causal_vae,t5} orbax)')
    p.add_argument('--learning_rate', type=float, default=1e-4)
    p.add_argument('--max_grad_norm', type=float, default=1.0)
    p.add_argument('--max_train_steps', type=int, default=10000)
    p.add_argument('--checkpointing_steps', type=int, default=500)
    p.add_argument('--num_frames', type=int, default=25,
                   help='pixel frames, 4k+1 (data_video.py:458-527)')
    p.add_argument('--batch_size', type=int, default=1)
    p.add_argument('--lora_rank', type=int, default=512)
    p.add_argument('--seed', type=int, default=666)
    p.add_argument('--resume', action='store_true')
    p.add_argument('--freq_loss', action='store_true',
                   help='timestep-aware Fourier loss (decodes pred-x0 '
                        'through the VAE, loss.py:247-278); costs a decode '
                        'per step')
    p.add_argument('--clean_captions', action='store_true')
    p.add_argument('--allow_random_weights', action='store_true')
    p.add_argument('--data_parallel', type=int, default=1)
    p.add_argument('--tensor_parallel', type=int, default=1,
                   help='Megatron-style TP over the mesh tensor axis '
                        '(replaces SAT Column/RowParallelLinear)')
    p.add_argument('--ema_decay', type=float, default=0.0)
    p.add_argument('--coordinator', default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..data.dataset import CogPairedCaptionDataset
    from ..data.prefetch import PrefetchIterator
    from ..models.dit.dit import CogVideoDiT
    from ..models.t5.encoder import T5Encoder
    from ..models.t5.tokenizer import default_t5_tokenizer
    from ..parallel import AXIS_DATA, init_distributed, make_hybrid_mesh, \
        make_mesh, shard_params
    from ..train.cog_trainer import (CogTrainConfig, make_cog_train_state,
                                     make_cog_train_step)
    from ..utils.logger import get_logger
    from ..utils.seed import setup_seed
    from ..vae.causal_vae import CogVideoVAE
    from .train_sr import collect_samples, stack_batch

    logger = get_logger()
    proc_idx, proc_cnt = init_distributed(args.coordinator)
    key = setup_seed(args.seed)
    os.makedirs(args.output_dir, exist_ok=True)

    dtype = jnp.bfloat16
    dit = CogVideoDiT(lora_rank=args.lora_rank, dtype=dtype)
    vae = CogVideoVAE(dtype=dtype)
    t5 = T5Encoder(dtype=dtype)
    t_lat = (args.num_frames - 1) // 4 + 1

    if args.model_path and os.path.exists(args.model_path):
        from ..convert.convert import load_params
        dit_params = {'params': load_params(os.path.join(args.model_path,
                                                         'dit'))}
        vae_params = {'params': load_params(os.path.join(args.model_path,
                                                         'causal_vae'))}
        t5_params = {'params': load_params(os.path.join(args.model_path,
                                                        't5'))}
    elif args.allow_random_weights:
        logger.warning('training from RANDOM weights (smoke run)')
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        dit_params = jax.jit(dit.init)(
            ks[0], jnp.zeros((1, t_lat, 60, 90, 32), dtype),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 226, 4096), dtype))
        vae_params = jax.jit(vae.init)(
            ks[1], jnp.zeros((1, 5, 64, 64, 3), dtype))
        t5_params = jax.jit(t5.init)(ks[2], jnp.zeros((1, 226), jnp.int32))
    else:
        raise FileNotFoundError('--model_path not found; pass '
                                '--allow_random_weights for a smoke run')
    tokenizer = default_t5_tokenizer(
        allow_fallback=args.allow_random_weights)

    mesh = (make_hybrid_mesh(data=args.data_parallel,
                             tensor=args.tensor_parallel) if proc_cnt > 1
            else make_mesh(data=args.data_parallel,
                           tensor=args.tensor_parallel))
    cfg = CogTrainConfig(learning_rate=args.learning_rate,
                         max_grad_norm=args.max_grad_norm,
                         freq_loss=args.freq_loss,
                         ema_decay=args.ema_decay)

    def vae_encode(v, k):
        return vae.apply(vae_params, v, k, method=CogVideoVAE.encode)

    def vae_decode_full(z):
        # single-window decode with a cleared cache (training-loss decode;
        # the inference path keeps the serial windowing)
        out, _ = vae.apply({'params': vae_params['params']}, z, True, True,
                           method=CogVideoVAE.decode, mutable=['cache'])
        return out

    with mesh:
        params = shard_params(dit_params, mesh)
        state, tx = make_cog_train_state(cfg, params)
        if args.data_parallel > 1:
            from ..parallel.zero import shard_opt_state
            state = state._replace(
                opt_state=shard_opt_state(state.opt_state, mesh))
        raw_step = make_cog_train_step(
            cfg, lambda p, x, i, y: dit.apply(p, x, i, y), tx,
            vae_decode=vae_decode_full if args.freq_loss else None)
        step_fn = jax.jit(raw_step)

        ckpt_dir = os.path.abspath(os.path.join(args.output_dir, 'ckpt'))
        mngr = ocp.CheckpointManager(
            ckpt_dir, options=ocp.CheckpointManagerOptions(
                max_to_keep=3,
                save_interval_steps=args.checkpointing_steps))
        start_step = 0
        if args.resume and mngr.latest_step() is not None:
            start_step = mngr.latest_step()
            state = mngr.restore(start_step,
                                 args=ocp.args.StandardRestore(state))
            logger.info('resumed from step %d', start_step)

        ds = CogPairedCaptionDataset(args.data_root, args.num_frames,
                                     seed=args.seed,
                                     clean_captions=args.clean_captions)
        global_batch = args.batch_size * args.data_parallel
        make_it = lambda: PrefetchIterator(ds, depth=2 * global_batch)
        batch_sh = NamedSharding(mesh, P(AXIS_DATA))
        metrics_path = os.path.join(args.output_dir, 'metrics.jsonl')
        encode_fn = jax.jit(vae_encode)

        it = make_it()
        t_last = time.time()
        for step in range(start_step, args.max_train_steps):
            samples, it = collect_samples(it, make_it, global_batch)
            gt_np, lq_np, texts = stack_batch(samples)
            k_enc, k_step, key = jax.random.split(key, 3)
            gt = jnp.asarray(gt_np)
            gt_lat = encode_fn(gt, k_enc)
            lq_lat = encode_fn(jnp.asarray(lq_np), None)
            tokens = jnp.asarray(tokenizer(texts))
            y = t5.apply(t5_params, tokens)
            batch = {'gt_latent': jax.device_put(gt_lat, batch_sh),
                     'lq_latent': jax.device_put(lq_lat, batch_sh),
                     'y': jax.device_put(y, batch_sh)}
            if args.freq_loss:
                batch['gt_pixels'] = jax.device_put(gt, batch_sh)
            state, metrics = step_fn(state, batch, k_step)
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

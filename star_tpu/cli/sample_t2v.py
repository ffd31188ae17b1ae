"""CogVideoX stock text-to-video demo CLI (non-SR).

Behavioral reference: cogvideox-based/inference/cli_demo.py — prompt in,
49-frame 720x480 clip out, 50 steps, guidance 6.

    python -m star_tpu.cli.sample_t2v --prompt "a cat surfing" \
        --model_path weights_cog_t2v/ --save_dir out/
"""

from __future__ import annotations

import os
from argparse import ArgumentParser


def parse_args():
    p = ArgumentParser()
    p.add_argument('--prompt', required=True)
    p.add_argument('--negative_prompt', type=str, default='')
    p.add_argument('--save_dir', type=str, default='results')
    p.add_argument('--file_name', type=str, default='t2v.mp4')
    p.add_argument('--model_path', type=str, default='./weights_cog_t2v')
    p.add_argument('--num_frames', type=int, default=49,
                   help='4k+1 with odd latent count (49 -> 13 latents)')
    p.add_argument('--num_steps', type=int, default=50)
    p.add_argument('--guider_scale', type=float, default=6.0)
    p.add_argument('--fps', type=int, default=8)
    p.add_argument('--seed', type=int, default=42)
    p.add_argument('--allow_random_weights', action='store_true')
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from ..data.io import save_video
    from ..models.dit.dit import CogVideoDiT
    from ..models.t5.encoder import T5Encoder
    from ..models.t5.tokenizer import default_t5_tokenizer
    from ..pipeline.cogvideo_sr import CogSamplerConfig
    from ..pipeline.cogvideo_t2v import CogT2VBundle, CogVideoT2VPipeline
    from ..utils.logger import get_logger
    from ..vae.causal_vae import CogVideoVAE

    logger = get_logger()
    dtype = jnp.bfloat16
    # stock CogVideoX-5B: no LIEM, 16-channel input (no LQ concat)
    dit = CogVideoDiT(dtype=dtype, liem=False)
    vae = CogVideoVAE(dtype=dtype)
    t5 = T5Encoder(dtype=dtype)

    if os.path.exists(args.model_path):
        from ..convert.convert import load_params
        dit_params = {'params': load_params(os.path.join(args.model_path,
                                                         'dit'))}
        vae_params = {'params': load_params(os.path.join(args.model_path,
                                                         'causal_vae'))}
        t5_params = {'params': load_params(os.path.join(args.model_path,
                                                        't5'))}
    elif args.allow_random_weights:
        logger.warning('using RANDOM weights (smoke/perf run)')
        k = jax.random.split(jax.random.PRNGKey(0), 3)
        t_lat = (args.num_frames - 1) // 4 + 1
        dit_params = jax.jit(dit.init)(
            k[0], jnp.zeros((2, t_lat, 60, 90, 16), dtype),
            jnp.zeros((2,), jnp.int32), jnp.zeros((2, 226, 4096), dtype))
        vae_params = jax.jit(vae.init)(
            k[1], jnp.zeros((1, 5, 64, 64, 3), dtype))
        t5_params = jax.jit(t5.init)(k[2], jnp.zeros((1, 226), jnp.int32))
    else:
        raise FileNotFoundError(args.model_path)

    def vae_decode_window(vp, latents, cache, first):
        variables = {'params': vp['params']}
        if cache:
            variables['cache'] = cache
        out, mut = vae.apply(variables, latents, True, first,
                             method=CogVideoVAE.decode, mutable=['cache'])
        return out, mut['cache']

    bundle = CogT2VBundle(
        dit_apply=lambda p, x, t, c: dit.apply(p, x, t, c),
        vae_decode_window=vae_decode_window,
        text_encode=lambda p, tok: t5.apply(p, tok),
        tokenizer=default_t5_tokenizer(
            allow_fallback=args.allow_random_weights),
        params={'dit': dit_params, 'vae': vae_params, 'text': t5_params})
    pipe = CogVideoT2VPipeline(bundle, CogSamplerConfig(
        num_steps=args.num_steps, guider_scale=args.guider_scale))

    out = pipe.sample(args.prompt, args.num_frames, args.negative_prompt,
                      args.seed)
    path = save_video(out, args.save_dir, args.file_name, fps=args.fps)
    logger.info('saved %s', path)


if __name__ == '__main__':
    main()

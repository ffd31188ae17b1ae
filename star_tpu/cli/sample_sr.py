"""CogVideoX-based SR inference CLI.

Behavioral reference: cogvideox-based/sat/sample_sr.py + inference_sr.sh —
iterates (lq video, prompt) pairs, 720x480 inputs, 4k+1 frames, 50-step
VPSDE-DPM++2M with DynamicCFG, serial windowed decode, AdaIN.

    python -m star_tpu.cli.sample_sr --input_path lq.mp4 --prompt "..." \
        --model_path weights_cog/ --save_dir out/
"""

from __future__ import annotations

import os
from argparse import ArgumentParser


def parse_args():
    p = ArgumentParser()
    p.add_argument('--input_path', required=True)
    p.add_argument('--prompt', type=str, default='a good video')
    p.add_argument('--save_dir', type=str, default='results')
    p.add_argument('--file_name', type=str, default=None)
    p.add_argument('--model_path', type=str, default='./weights_cog')
    p.add_argument('--sampling_num_frames', type=int, default=7,
                   help='latent frames; must be odd (yaml: 13, 11 or 9)')
    p.add_argument('--num_steps', type=int, default=50)
    p.add_argument('--guider_scale', type=float, default=6.0)
    p.add_argument('--seed', type=int, default=42)
    p.add_argument('--allow_random_weights', action='store_true')
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from ..data.io import load_video, save_video
    from ..models.dit.dit import CogVideoDiT
    from ..models.t5.encoder import T5Encoder
    from ..models.t5.tokenizer import default_t5_tokenizer
    from ..pipeline.cogvideo_sr import (CogModelBundle, CogSamplerConfig,
                                        CogVideoSRPipeline)
    from ..utils.logger import get_logger
    from ..vae.causal_vae import CogVideoVAE

    logger = get_logger()
    dtype = jnp.bfloat16
    dit = CogVideoDiT(dtype=dtype)
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
        f_lat = args.sampling_num_frames
        dit_params = jax.jit(dit.init)(
            k[0], jnp.zeros((2, f_lat, 60, 90, 32), dtype),
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

    bundle = CogModelBundle(
        dit_apply=lambda p, x, t, c: dit.apply(p, x, t, c),
        vae_encode=lambda p, v, key: vae.apply(p, v, key,
                                               method=CogVideoVAE.encode),
        vae_decode_window=vae_decode_window,
        text_encode=lambda p, tok: t5.apply(p, tok),
        tokenizer=default_t5_tokenizer(
            allow_fallback=args.allow_random_weights),
        params={'dit': dit_params, 'vae': vae_params, 'text': t5_params})
    pipe = CogVideoSRPipeline(bundle, CogSamplerConfig(
        num_steps=args.num_steps, guider_scale=args.guider_scale))

    frames, fps = load_video(args.input_path)
    want = (args.sampling_num_frames - 1) * 4 + 1
    frames = frames[:want]
    assert frames.shape[0] == want, (
        f'need {want} frames (4k+1 for {args.sampling_num_frames} latents), '
        f'got {frames.shape[0]}')
    logger.info('input %s frames @ %.2f fps %sx%s', *frames.shape[:1], fps,
                frames.shape[1], frames.shape[2])
    out = pipe.enhance_a_video(frames, args.prompt, seed=args.seed)
    name = args.file_name or os.path.basename(args.input_path)
    path = save_video(out, args.save_dir, name, fps=fps)
    logger.info('saved %s', path)


if __name__ == '__main__':
    main()

"""CLI entry: flag-parity with the reference's inference_sr.py
(video_super_resolution/scripts/inference_sr.py:87-102).

    python -m star_tpu.cli.inference_sr --input_path in.mp4 \
        --model_path weights/ --prompt "a good video" --upscale 4

model_path points at converted checkpoints (convert/ tools); when absent,
--allow_random_weights runs the full pipeline with random params (useful for
smoke/perf runs; output is noise).
"""

from __future__ import annotations

import os
from argparse import ArgumentParser


def parse_args():
    p = ArgumentParser()
    p.add_argument('--input_path', type=str, default=None,
                   help='input video path (single-video mode)')
    p.add_argument('--input_dir', type=str, default=None,
                   help='directory of *.mp4 (batch mode, like '
                        'inference_sr.sh pairing videos with prompt lines)')
    p.add_argument('--prompt_file', type=str, default=None,
                   help='one prompt per line, paired with sorted videos '
                        '(batch mode; count must match)')
    p.add_argument('--save_dir', type=str, default='results')
    p.add_argument('--file_name', type=str, default=None)
    p.add_argument('--model_path', type=str,
                   default='./pretrained_weight/model.orbax')
    p.add_argument('--prompt', type=str, default='a good video')
    p.add_argument('--upscale', type=int, default=4)
    p.add_argument('--max_chunk_len', type=int, default=32)
    p.add_argument('--cfg', type=float, default=7.5)
    p.add_argument('--solver_mode', type=str, default='fast',
                   choices=('fast', 'normal'))
    p.add_argument('--steps', type=int, default=15)
    p.add_argument('--seed', type=int, default=666)
    p.add_argument('--color_fix', type=str, default='adain',
                   choices=('adain', 'wavelet', 'none'))
    p.add_argument('--dtype', type=str, default='bfloat16',
                   choices=('bfloat16', 'float32'))
    p.add_argument('--allow_random_weights', action='store_true')
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from ..config import PipelineConfig, SamplerConfig
    from ..data.io import load_video, save_video
    from ..pipeline.build import build_pipeline, init_random_models
    from ..utils.logger import get_logger

    logger = get_logger()
    steps = 15 if args.solver_mode == 'fast' else args.steps

    # build + validate the work list BEFORE the (slow) model build
    # (inference_sr.sh:27-30 asserts video/prompt counts agree up front)
    if args.input_dir:
        import glob
        videos = sorted(glob.glob(os.path.join(args.input_dir, '*.mp4')))
        assert videos, f'no *.mp4 under {args.input_dir}'
        if args.prompt_file:
            with open(args.prompt_file) as f:
                prompts = [ln.strip() for ln in f if ln.strip()]
            assert len(prompts) == len(videos), (
                f'{len(videos)} videos but {len(prompts)} prompts')
        else:
            prompts = [args.prompt] * len(videos)
        jobs = list(zip(videos, prompts))
    else:
        assert args.input_path, 'pass --input_path or --input_dir'
        jobs = [(args.input_path, args.prompt)]
    for video_path, _ in jobs:
        assert os.path.exists(video_path), video_path

    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    if os.path.exists(args.model_path):
        from ..convert.load import load_star_models
        models = load_star_models(args.model_path, dtype=dtype)
    elif args.allow_random_weights:
        logger.warning('model_path %s not found; using RANDOM weights '
                       '(--allow_random_weights)', args.model_path)
        models = init_random_models(jax.random.PRNGKey(0), dtype=dtype)
    else:
        raise FileNotFoundError(
            f'{args.model_path} not found; pass --allow_random_weights for a '
            'smoke run or convert checkpoints with star_tpu.convert')

    cfg = PipelineConfig(
        sampler=SamplerConfig(steps=steps, solver_mode=args.solver_mode,
                              guide_scale=args.cfg),
        upscale=args.upscale, max_chunk_len=args.max_chunk_len,
        color_fix=args.color_fix)
    pipe = build_pipeline(models, cfg, param_dtype=dtype,
                          allow_hash_tokenizer=args.allow_random_weights)

    # 3-stage host/device pipeline: a prefetch thread decodes clip N+1 while
    # the device runs clip N; clip N-1's readback + encode/save happens only
    # AFTER clip N is dispatched, so the tunnel transfer and cv2 writing
    # overlap device compute (the reference serializes one process per
    # video, inference_sr.sh:43-53)
    import numpy as np

    from ..data.prefetch import PrefetchIterator

    def _load(job):
        video_path, prompt = job
        frames, fps = load_video(video_path)
        return video_path, prompt, frames, fps

    def _flush(pending):
        out_dev, name, fps = pending
        path = save_video(np.asarray(jax.device_get(out_dev)),
                          args.save_dir, name, fps=fps)
        logger.info('saved %s', path)

    pending = None
    loaded = PrefetchIterator((_load(j) for j in jobs), depth=2)
    for video_path, prompt, frames, fps in loaded:
        logger.info('input %s: %s frames @ %.2f fps, %sx%s', video_path,
                    frames.shape[0], fps, frames.shape[1], frames.shape[2])
        out_dev = pipe.enhance_a_video_async(frames, prompt, seed=args.seed)
        if pending is not None:
            _flush(pending)
        name = (args.file_name if len(jobs) == 1 and args.file_name
                else os.path.basename(video_path))
        pending = (out_dev, name, fps)
    if pending is not None:
        _flush(pending)


if __name__ == '__main__':
    main()

"""Paired-data generation driver.

Behavioral reference: utils_data/make_paired_data.py:20-103 — CSV of
(path, text) rows; per clip: two-stage degradation -> 4x bicubic upsample of
LQ -> save {gt,lq,text} triplets. Work shards across processes by rank
striding (replaces the colossalai launch + StatefulDistributedSampler).

    python -m star_tpu.cli.make_paired_data --csv data.csv --save_dir out/ \
        --num_frames 32 --frame_interval 2 --height 720 --width 1280
"""

from __future__ import annotations

import csv
import os
from argparse import ArgumentParser

import numpy as np


def parse_args():
    p = ArgumentParser()
    p.add_argument('--csv', required=True, help='csv with path,text rows')
    p.add_argument('--save_dir', required=True)
    p.add_argument('--num_frames', type=int, default=32)
    p.add_argument('--frame_interval', type=int, default=2)
    p.add_argument('--height', type=int, default=720)
    p.add_argument('--width', type=int, default=1280)
    p.add_argument('--scale', type=int, default=4)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--no_codec', action='store_true',
                   help='skip the H.264/mpeg4 re-encode stage')
    p.add_argument('--recipe', default='default',
                   choices=('default', 'mid'),
                   help="degradation recipe: 'default' = degrade_video.py, "
                        "'mid' = degrade_video_mid.py (stage-1 resize "
                        "toward final LR size)")
    # rank striding defaults from the standard launcher env (so one command
    # line works under SLURM/GKE array jobs and jax multi-host alike)
    p.add_argument('--process_index', type=int,
                   default=int(os.environ.get('JAX_PROCESS_ID',
                                              os.environ.get('RANK', 0))))
    p.add_argument('--process_count', type=int,
                   default=int(os.environ.get('JAX_NUM_PROCESSES',
                                              os.environ.get('WORLD_SIZE',
                                                             1))))
    return p.parse_args()


def center_crop_resize(frames: np.ndarray, h: int, w: int) -> np.ndarray:
    import cv2
    f, fh, fw, _ = frames.shape
    scale = max(h / fh, w / fw)
    nh, nw = int(round(fh * scale)), int(round(fw * scale))
    out = np.stack([cv2.resize(fr, (nw, nh), interpolation=cv2.INTER_AREA)
                    for fr in frames])
    top, left = (nh - h) // 2, (nw - w) // 2
    return out[:, top:top + h, left:left + w]


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from ..data.degradation import degrade_video
    from ..data.io import load_video, save_video
    from ..data.dataset import shard_for_process
    from ..ops.resize import resize_bilinear
    from ..utils.logger import get_logger

    logger = get_logger()
    with open(args.csv) as f:
        rows = [r for r in csv.reader(f) if r]
    rows = shard_for_process(rows, args.process_index, args.process_count)
    for sub in ('gt', 'lq', 'text'):
        os.makedirs(os.path.join(args.save_dir, sub), exist_ok=True)

    for i, row in enumerate(rows):
        path, text = row[0], (row[1] if len(row) > 1 else '')
        name = os.path.splitext(os.path.basename(path))[0]
        frames, fps = load_video(path)
        frames = frames[::args.frame_interval][:args.num_frames]
        frames = center_crop_resize(frames, args.height, args.width)
        gt01 = frames.astype(np.float32) / 255.0
        lq01, _ = degrade_video(gt01, scale=args.scale,
                                seed=args.seed + i * 7919,
                                use_codec=not args.no_codec,
                                recipe=args.recipe)
        # x(scale) bicubic upsample of LQ (make_paired_data.py:86-96)
        lq_up = jax.image.resize(
            jnp.asarray(lq01),
            (lq01.shape[0], args.height, args.width, 3), 'cubic')
        lq_up = np.clip(np.asarray(lq_up), 0, 1)

        save_video((gt01 * 255).astype(np.uint8), os.path.join(
            args.save_dir, 'gt'), name + '.mp4', fps=fps)
        save_video((lq_up * 255).astype(np.uint8), os.path.join(
            args.save_dir, 'lq'), name + '.mp4', fps=fps)
        with open(os.path.join(args.save_dir, 'text', name + '.txt'),
                  'w') as f:
            f.write(text)
        logger.info('[%d/%d] %s done', i + 1, len(rows), name)


if __name__ == '__main__':
    main()

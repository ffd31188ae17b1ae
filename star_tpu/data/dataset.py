"""Training datasets (host-side; feeds numpy batches to the jitted steps).

Behavioral reference: video_super_resolution/dataset.py
(PairedCaptionVideoDataset: {gt,lq,text} triplet dirs, null_text_ratio
caption dropout, first num_frames frames, [-1,1] normalize) and
cogvideox-based/sat/data_video.py (PairedCaptionDataset:458 with the 720p
resize/crop rules, frames=4k+1).
"""

from __future__ import annotations

import os
import random
from typing import Iterator, List, Optional

import numpy as np

from .io import load_video


class PairedCaptionVideoDataset:
    """Iterates {root}/gt/*.mp4 + {root}/lq/*.mp4 + {root}/text/*.txt.

    Yields dicts of gt/lq float32 [-1,1] [F,H,W,3] + text. Mirrors
    dataset.py:11-61 (null_text_ratio=0.5 default caption dropout).
    """

    def __init__(self, root: str, num_frames: int = 32,
                 null_text_ratio: float = 0.5, seed: int = 0):
        self.root = root
        self.num_frames = num_frames
        self.null_text_ratio = null_text_ratio
        self.rng = random.Random(seed)
        lq_dir = os.path.join(root, 'lq')
        self.names = sorted(
            os.path.splitext(f)[0] for f in os.listdir(lq_dir)
            if f.endswith('.mp4'))

    def __len__(self):
        return len(self.names)

    def __getitem__(self, idx: int) -> dict:
        name = self.names[idx]
        gt, _ = load_video(os.path.join(self.root, 'gt', name + '.mp4'))
        lq, _ = load_video(os.path.join(self.root, 'lq', name + '.mp4'))
        gt = gt[:self.num_frames]
        lq = lq[:self.num_frames]
        if self.rng.random() < self.null_text_ratio:
            text = ''
        else:
            with open(os.path.join(self.root, 'text', name + '.txt')) as f:
                text = f.read().strip()
        to11 = lambda x: (x.astype(np.float32) / 255.0 - 0.5) / 0.5
        return {'gt': to11(gt), 'lq': to11(lq), 'text': text}

    def __iter__(self) -> Iterator[dict]:
        order = list(range(len(self)))
        self.rng.shuffle(order)
        for i in order:
            yield self[i]


def shard_for_process(items: List, process_index: int,
                      process_count: int) -> List:
    """Rank-strided work split (the reference's prompt-list DP sharding,
    sample_sr.py:38-45)."""
    return items[process_index::process_count]

"""Minimal webdataset-style tar-shard reader (host-side).

Behavioral reference: SAT/sgm webdataset VideoDataset / SFTDataset
(cogvideox-based/sat/data_video.py:320-457; sgm/webds.py) — training streams
{key.mp4, key.txt, key.json} samples from tar shards. The webdataset package
isn't in this image, so this is a dependency-free tarfile implementation of
the same sample-grouping convention, with rank-strided shard assignment.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from typing import Dict, Iterator, List, Sequence

import numpy as np


def _group_members(tf: tarfile.TarFile):
    """Yield dicts of {ext: bytes} grouped by sample key (webdataset
    convention: files sharing the basename before the first dot)."""
    current_key = None
    sample: Dict[str, bytes] = {}
    for member in tf:
        if not member.isfile():
            continue
        base = os.path.basename(member.name)
        key, _, ext = base.partition('.')
        if current_key is not None and key != current_key and sample:
            yield current_key, sample
            sample = {}
        current_key = key
        data = tf.extractfile(member)
        if data is not None:
            sample[ext] = data.read()
    if sample:
        yield current_key, sample


def _decode(ext: str, raw: bytes):
    if ext in ('txt', 'text'):
        return raw.decode('utf-8')
    if ext == 'json':
        return json.loads(raw)
    if ext in ('mp4', 'avi', 'mkv', 'webm'):
        import cv2
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=f'.{ext}') as f:
            f.write(raw)
            f.flush()
            cap = cv2.VideoCapture(f.name)
            frames = []
            while True:
                ret, fr = cap.read()
                if not ret:
                    break
                frames.append(fr[:, :, ::-1])
            cap.release()
        return np.stack(frames) if frames else None
    if ext in ('npy',):
        return np.load(io.BytesIO(raw))
    return raw


class TarVideoDataset:
    """Streams decoded samples from .tar shards.

    shards: list of tar paths; assigned rank-strided across processes like
    the reference's webdataset url splitting.
    """

    def __init__(self, shards: Sequence[str], process_index: int = 0,
                 process_count: int = 1, decode: bool = True):
        self.shards: List[str] = sorted(shards)[process_index::process_count]
        self.decode = decode

    def __iter__(self) -> Iterator[Dict]:
        for shard in self.shards:
            with tarfile.open(shard) as tf:
                for key, sample in _group_members(tf):
                    out = {'__key__': key}
                    for ext, raw in sample.items():
                        out[ext] = _decode(ext, raw) if self.decode else raw
                    yield out

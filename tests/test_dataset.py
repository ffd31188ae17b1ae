"""Dataset tests against real mp4 triplets written with the cv2 fallback."""

import os

import numpy as np
import pytest


@pytest.fixture(scope='module')
def triplet_root(tmp_path_factory):
    from star_tpu.data.io import save_video
    root = tmp_path_factory.mktemp('paired')
    rng = np.random.RandomState(0)
    for sub in ('gt', 'lq', 'text'):
        os.makedirs(root / sub, exist_ok=True)
    for name in ('a', 'b'):
        frames = rng.randint(0, 255, (6, 32, 48, 3), dtype=np.uint8)
        save_video(frames, str(root / 'gt'), name + '.mp4', fps=8)
        save_video(frames // 2, str(root / 'lq'), name + '.mp4', fps=8)
        (root / 'text' / (name + '.txt')).write_text(f'clip {name}')
    return str(root)


def test_paired_dataset(triplet_root):
    from star_tpu.data.dataset import PairedCaptionVideoDataset
    ds = PairedCaptionVideoDataset(triplet_root, num_frames=4,
                                   null_text_ratio=0.0)
    assert len(ds) == 2
    item = ds[0]
    assert item['gt'].shape == (4, 32, 48, 3)
    assert item['lq'].shape == (4, 32, 48, 3)
    assert -1.0 <= item['gt'].min() and item['gt'].max() <= 1.0
    assert item['text'] == 'clip a'


def test_null_text_dropout(triplet_root):
    from star_tpu.data.dataset import PairedCaptionVideoDataset
    ds = PairedCaptionVideoDataset(triplet_root, num_frames=2,
                                   null_text_ratio=1.0)
    assert ds[0]['text'] == ''


def test_cog_dataset_upsample_rule(triplet_root):
    """LQ narrower than 720 gets bicubic x4 (data_video.py:503-505)."""
    from star_tpu.data.dataset import CogPairedCaptionDataset
    ds = CogPairedCaptionDataset(triplet_root, num_frames=5,
                                 null_text_ratio=0.0)
    item = ds[0]
    assert item['gt'].shape == (5, 32, 48, 3)       # gt untouched (<720)
    assert item['lq'].shape == (5, 128, 192, 3)     # lq x4


def test_shard_for_process():
    from star_tpu.data.dataset import shard_for_process
    items = list(range(10))
    a = shard_for_process(items, 0, 3)
    b = shard_for_process(items, 1, 3)
    c = shard_for_process(items, 2, 3)
    assert sorted(a + b + c) == items


def test_prefetch_iterator_yields_all_and_propagates_errors():
    from star_tpu.data.prefetch import PrefetchIterator, prefetched
    import time

    out = list(PrefetchIterator(range(10), depth=3))
    assert out == list(range(10))

    # exhausted iterator keeps raising StopIteration (doesn't hang on the
    # consumed sentinel)
    ex = PrefetchIterator(range(2), depth=2)
    assert list(ex) == [0, 1]
    for _ in range(3):
        try:
            next(ex)
            raise AssertionError('expected StopIteration')
        except StopIteration:
            pass

    # error in the producer surfaces at the consumer
    def bad():
        yield 1
        raise RuntimeError('decode failed')
    it = PrefetchIterator(bad(), depth=2)
    assert next(it) == 1
    try:
        next(it)
        raise AssertionError('expected RuntimeError')
    except RuntimeError as e:
        assert 'decode failed' in str(e)

    # close() stops a producer stuck on a full queue
    slow = PrefetchIterator(iter(range(1000)), depth=1)
    assert next(slow) == 0
    slow.close()
    time.sleep(0.3)
    assert not slow._thread.is_alive()

    # factory version returns fresh iterators (epoch reset contract)
    f = prefetched(lambda: range(3), depth=2)
    assert list(f()) == [0, 1, 2] and list(f()) == [0, 1, 2]


def test_paired_image_dataset(tmp_path):
    """PairedCaptionImageDataset: crop-or-pad to crop_size, 1-frame clips,
    empty caption (ref dataset.py:63-111)."""
    import cv2
    from star_tpu.data.dataset import PairedCaptionImageDataset
    rng = np.random.RandomState(0)
    for sub in ('gt', 'sr_bicubic'):
        os.makedirs(tmp_path / sub, exist_ok=True)
    # one image larger than crop (center-cropped), one smaller (zero-padded)
    cv2.imwrite(str(tmp_path / 'gt' / 'a.png'),
                rng.randint(0, 255, (40, 60, 3), dtype=np.uint8))
    cv2.imwrite(str(tmp_path / 'sr_bicubic' / 'a.png'),
                rng.randint(0, 255, (40, 60, 3), dtype=np.uint8))
    cv2.imwrite(str(tmp_path / 'gt' / 'b.png'),
                rng.randint(0, 255, (16, 20, 3), dtype=np.uint8))
    cv2.imwrite(str(tmp_path / 'sr_bicubic' / 'b.png'),
                rng.randint(0, 255, (16, 20, 3), dtype=np.uint8))
    ds = PairedCaptionImageDataset(str(tmp_path), crop_size=(32, 48))
    assert len(ds) == 2
    for item in ds:
        assert item['gt'].shape == (1, 32, 48, 3)
        assert item['lq'].shape == (1, 32, 48, 3)
        assert item['text'] == ''
        assert -1.0 <= item['gt'].min() and item['gt'].max() <= 1.0
    # the padded small image has exact -1.0 (zero-pixel) borders
    assert (ds[1]['gt'][0, 0] == -1.0).all()

"""Temporal sliding-window chunking of the denoiser.

Behavioral reference: make_chunks/sliding_windows_1d
(video_to_video_model.py:190-210) and the per-chunk x0 stitch in
diffusion_sdedit.py:330-353: 50%-overlap windows of max_chunk_len frames, each
denoised independently per solver step, stitched by cutting half the overlap
from each side. Window boundaries are static per (frame_count, chunk_len), so
the whole stitch resolves at trace time; equal-length windows are folded into
the batch dimension (one UNet call for all of them) instead of the reference's
python loop — the windows are independent within a step, which also makes them
shardable over the mesh 'data' axis.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp


def sliding_windows_1d(length: int, window_size: int,
                       overlap_size: int) -> List[Tuple[int, int]]:
    """(video_to_video_model.py:199-210); the tail window absorbs up to
    1.25x window_size frames."""
    stride = window_size - overlap_size
    ind = 0
    coords = []
    while ind < length:
        if ind + window_size * 1.25 >= length:
            coords.append((ind, length))
            break
        coords.append((ind, ind + window_size))
        ind += stride
    return coords


def make_chunks(f_num: int, max_chunk_len: int, interp_f_num: int = 0,
                chunk_overlap_ratio: float = 0.5) -> List[Tuple[int, int]]:
    max_o_len = max_chunk_len * chunk_overlap_ratio
    chunk_len = int((max_chunk_len - 1) // (1 + interp_f_num)
                    * (interp_f_num + 1) + 1)
    o_len = int((max_o_len - 1) // (1 + interp_f_num) * (interp_f_num + 1) + 1)
    return sliding_windows_1d(f_num, chunk_len, o_len)


def stitch_slices(chunk_inds: Sequence[Tuple[int, int]]):
    """Per-chunk (start, stop) of the region each chunk contributes to the
    stitched output, mirroring diffusion_sdedit.py:333-351."""
    if len(chunk_inds) == 1:
        s, e = chunk_inds[0]
        return [(0, e - s)]
    o_len = chunk_inds[0][1] - chunk_inds[1][0]
    cut = o_len // 2
    spans = []
    for i, (s, e) in enumerate(chunk_inds):
        cur = e - s
        if i == 0:
            spans.append((0, cur + cut - o_len))
        elif i == len(chunk_inds) - 1:
            spans.append((cut, cur))
        else:
            spans.append((cut, cur + cut - o_len))
    return spans


def chunked_x0_fn(denoise_chunk: Callable[[jax.Array, jax.Array, jax.Array],
                                          jax.Array],
                  hint: jax.Array,
                  chunk_inds: Sequence[Tuple[int, int]],
                  mesh=None):
    """Build a whole-video x0 function from a per-chunk denoiser.

    denoise_chunk(xt_chunk, hint_chunk, t) -> x0_chunk, where the leading dim
    may batch several equal-length windows.
    xt/hint are [B, F, H, W, C]; chunking is over F.

    mesh: optional jax.sharding.Mesh — the folded window batch is sharded
    over its 'data' axis when divisible (the windows are independent within
    a solver step, so a long video scales across chips with zero collectives
    inside the UNet; the reference runs them as a serial python loop,
    diffusion_sdedit.py:330-353).
    """
    chunk_inds = list(chunk_inds)
    spans = stitch_slices(chunk_inds)

    def maybe_shard(a: jax.Array) -> jax.Array:
        if mesh is None:
            return a
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import AXIS_DATA
        n = mesh.shape.get(AXIS_DATA, 1)
        if n > 1 and a.shape[0] % n == 0:
            return jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, P(AXIS_DATA)))
        return a

    def x0_fn(xt: jax.Array, t: jax.Array) -> jax.Array:
        if len(chunk_inds) == 1:
            return denoise_chunk(xt, hint, t)

        # group equal-length windows -> fold into batch, one call per length
        lengths = [e - s for s, e in chunk_inds]
        results: List[jax.Array | None] = [None] * len(chunk_inds)
        b = xt.shape[0]
        for ln in sorted(set(lengths)):
            idxs = [i for i, l in enumerate(lengths) if l == ln]
            xs = jnp.concatenate(
                [xt[:, s:e] for (s, e) in (chunk_inds[i] for i in idxs)], axis=0)
            hs = jnp.concatenate(
                [hint[:, s:e] for (s, e) in (chunk_inds[i] for i in idxs)], axis=0)
            x0s = denoise_chunk(maybe_shard(xs), maybe_shard(hs), t)
            for k, i in enumerate(idxs):
                results[i] = x0s[k * b:(k + 1) * b]
        pieces = [results[i][:, s0:s1] for i, (s0, s1) in enumerate(spans)]
        return jnp.concatenate(pieces, axis=1)

    return x0_fn

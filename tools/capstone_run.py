"""Full-size end-to-end capstone on one chip: 8 frames 180x320 -> 720x1280
through STARPipeline.enhance_a_video — TWO jitted graphs since r4 (solve,
then batched decode+color-fix) handing latents off on device (bf16 zero
weights: real shapes/graph, meaningless pixels). Prints warm wall time +
output fps;
--profile additionally prints a per-STAGE device-time budget (denoise /
vae-decode / vae-encode / text / other) binned from the op_name module paths
in the xplane trace.

    python tools/capstone_run.py [--frames 8] [--profile /tmp/cap_trace]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage_budget(trace_dir: str):
    """Bin device-op time into encode-prep / denoise / decode-post stages.

    The capstone graph executes its stages sequentially on device and the
    xplane events carry only HLO names + device offsets (no module-path
    metadata), so the robust split is temporal: the solver scan is the
    longest `while` event; everything before its span is upsample+pad+VAE
    encode, inside is denoising, after is VAE decode+unpad+AdaIN."""
    import collections
    import glob

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(trace_dir, '**', '*.xplane.pb'),
                      recursive=True)
    assert paths, f'no xplane.pb under {trace_dir}'
    events = []
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, 'rb') as fh:
            xs.ParseFromString(fh.read())
        for plane in xs.planes:
            if 'TPU' not in plane.name and 'device' not in plane.name.lower():
                continue
            ev_meta = plane.event_metadata
            stat_names = {m.id: m.name for m in plane.stat_metadata.values()}
            for line in plane.lines:
                if line.name != 'XLA Ops':
                    continue
                for ev in line.events:
                    off, dur = ev.offset_ps, ev.duration_ps
                    for st in ev.stats:
                        n = stat_names.get(st.metadata_id, '')
                        if n == 'device_offset_ps':
                            off = st.uint64_value or st.int64_value
                        elif n == 'device_duration_ps':
                            dur = st.uint64_value or st.int64_value
                    events.append((ev_meta[ev.metadata_id].name, off, dur))
    whiles = [(n, o, d) for n, o, d in events if n.startswith('%while')]
    assert whiles, 'no while (solver scan) found'
    _, w_start, w_dur = max(whiles, key=lambda t: t[2])
    w_end = w_start + w_dur
    budget = collections.Counter()
    for name, off, dur in events:
        if name.startswith('%while'):
            continue
        if off + dur <= w_start:
            budget['encode_prep'] += dur
        elif off >= w_end:
            budget['decode_post'] += dur
        else:
            budget['denoise'] += dur
    budget['denoise_scan_span'] = w_dur
    return {k: round(v / 1e12, 3) for k, v in budget.items()}  # ps -> seconds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames', type=int, default=8)
    ap.add_argument('--profile', default=None,
                    help='trace dir: also print the per-stage budget')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from star_tpu.models.clip.text import CLIPTextEncoder
    from star_tpu.models.unet.unet import ControlledV2VUNet
    from star_tpu.pipeline.build import StarModels, build_pipeline
    from star_tpu.utils.cache import enable_compile_cache
    from star_tpu.vae.svd_vae import SVDTemporalVAE
    enable_compile_cache()

    print('[t] shapes', flush=True)
    dtype = jnp.bfloat16
    unet = ControlledV2VUNet(dtype=dtype)
    vae = SVDTemporalVAE(dtype=dtype)
    text = CLIPTextEncoder(dtype=dtype)
    key = jax.random.PRNGKey(0)
    zeros = lambda tree: jax.tree.map(
        lambda s: jnp.zeros(s.shape, dtype
                            if s.dtype == jnp.float32 else s.dtype), tree)
    up = zeros(jax.eval_shape(unet.init, key, jnp.zeros((1, 2, 18, 16, 4),
                                                        dtype),
                              jnp.zeros((1,), jnp.int32),
                              jnp.zeros((1, 77, 1024), dtype),
                              jnp.zeros((1, 2, 18, 16, 4), dtype)))
    vp = zeros(jax.eval_shape(vae.init, key,
                              jnp.zeros((1, 2, 32, 32, 3), dtype)))
    tp = zeros(jax.eval_shape(text.init, key,
                              jnp.zeros((1, 77), jnp.int32)))
    models = StarModels(unet, up, vae, vp, text, tp)
    pipe = build_pipeline(models, allow_hash_tokenizer=True)

    frames = (np.random.RandomState(0)
              .uniform(0, 255, (args.frames, 180, 320, 3)).astype(np.uint8))
    print('[t] compile+first run', flush=True)
    t0 = time.time()
    out = pipe.enhance_a_video(frames, 'capstone', seed=666)
    print(f'[t] first (incl compile): {time.time() - t0:.1f} s, '
          f'out {out.shape}', flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        out = pipe.enhance_a_video(frames, 'capstone', seed=666)
        times.append(time.time() - t0)
    warm = sorted(times)[1]
    print(f'[t] warm: {warm:.2f} s = {args.frames / warm:.3f} output fps/chip'
          f' ({out.shape})', flush=True)

    if args.profile:
        from star_tpu.utils.profiling import trace
        print('[t] trace', flush=True)
        with trace(args.profile):
            pipe.enhance_a_video(frames, 'capstone', seed=666)
        print('[t] stage budget (device s):', stage_budget(args.profile),
              flush=True)


if __name__ == '__main__':
    main()

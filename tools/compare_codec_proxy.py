"""Quantify the DCT-DPCM codec proxy against real H.264/mpeg4 (PyAV).

SURVEY.md §7 hard part 7: the training-data codec stage
(degrade_video.py:48-76) is host codec work; in codec-less images we
substitute data/degradation.py::codec_proxy. This script measures how close
the proxy's artifact distribution is to the real thing, on any host where
PyAV IS importable:

  * per-quality PSNR/SSIM of (proxy vs GT) and (codec vs GT) — matched
    degradation strength;
  * PSNR(proxy, codec) — direct output agreement;
  * radial log-power spectra of the artifact residuals (codec artifacts are
    characterized by their spectral shape: 8x8 blocking harmonics + HF
    attenuation) and their L1 distance;
  * blockiness score (mean absolute second difference across 8-pixel
    boundaries minus within-block) for both.

Without PyAV it still reports the proxy-side numbers (vs GT) so the
statistics travel with CI, and marks the comparison SKIPPED.

    python tools/compare_codec_proxy.py [--clip path.mp4] [--frames 8]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def radial_spectrum(residual: np.ndarray, bins: int = 48) -> np.ndarray:
    """Mean radial log-power spectrum over frames/channels of [F,H,W,C]."""
    f = np.fft.fftshift(np.abs(np.fft.fft2(residual, axes=(1, 2))) ** 2,
                        axes=(1, 2))
    h, w = residual.shape[1:3]
    yy, xx = np.mgrid[:h, :w]
    r = np.hypot(yy - h / 2, xx - w / 2)
    r = (r / r.max() * (bins - 1)).astype(int)
    out = np.zeros(bins)
    for b in range(bins):
        m = r == b
        out[b] = np.log10(f[:, m].mean() + 1e-12)
    return out


def blockiness(img: np.ndarray) -> float:
    """8-aligned boundary gradient excess (classic JPEG blockiness cue)."""
    d = np.abs(np.diff(img, axis=2))
    at = d[:, :, 7::8].mean()
    within = d.mean()
    return float(at - within)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--clip', default=None, help='mp4 to use as GT; default '
                    'synthesizes a moving-texture clip')
    ap.add_argument('--frames', type=int, default=8)
    ap.add_argument('--size', type=int, default=192)
    ap.add_argument('--seeds', type=int, default=4)
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from star_tpu.data.degradation import codec_proxy, codec_roundtrip
    from star_tpu.utils.metrics import psnr, ssim

    if args.clip:
        from star_tpu.data.io import load_video
        frames, _ = load_video(args.clip)
        gt = frames[:args.frames].astype(np.float32) / 255.0
    else:
        # moving textured content: codec artifacts need structure + motion
        rs = np.random.RandomState(0)
        base = rs.uniform(0, 1, (args.size * 2, args.size * 2, 3))
        from scipy.ndimage import gaussian_filter
        base = gaussian_filter(base, (3, 3, 0))
        base = (base - base.min()) / (np.ptp(base) + 1e-9)
        gt = np.stack([base[i * 2:i * 2 + args.size,
                            i * 3:i * 3 + args.size]
                       for i in range(args.frames)]).astype(np.float32)

    try:
        import av  # noqa: F401
        have_codec = True
    except ImportError:
        have_codec = False

    rows = []
    for seed in range(args.seeds):
        prox = np.asarray(codec_proxy(jnp.asarray(gt), seed))
        row = {
            'seed': seed,
            'proxy_psnr_gt': float(psnr(prox * 255, gt * 255)),
            'proxy_ssim_gt': float(ssim(prox * 255, gt * 255)),
            'proxy_blockiness': blockiness(prox) - blockiness(gt),
        }
        if have_codec:
            real = codec_roundtrip(gt, seed)
            n = min(len(real), len(prox))
            row.update(
                codec_psnr_gt=float(psnr(real[:n] * 255, gt[:n] * 255)),
                codec_ssim_gt=float(ssim(real[:n] * 255, gt[:n] * 255)),
                codec_blockiness=blockiness(real[:n]) - blockiness(gt[:n]),
                proxy_vs_codec_psnr=float(psnr(prox[:n] * 255,
                                               real[:n] * 255)),
                spectrum_l1=float(np.abs(
                    radial_spectrum(prox[:n] - gt[:n])
                    - radial_spectrum(real[:n] - gt[:n])).mean()),
            )
        rows.append(row)
        print(row, flush=True)

    keys = rows[0].keys()
    mean = {k: float(np.mean([r[k] for r in rows])) for k in keys
            if k != 'seed'}
    print('MEAN:', mean)
    if not have_codec:
        print('PyAV not importable: codec-side comparison SKIPPED — rerun '
              'on a codec-capable host to quantify the proxy deviation '
              '(SURVEY.md §7 hard part 7).')


if __name__ == '__main__':
    main()

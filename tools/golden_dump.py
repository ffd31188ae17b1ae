"""Dump golden tensors from the PyTorch reference for numerical parity tests.

Runs IN THIS IMAGE: torch (cpu) is installed, and the reference's CUDA-only
imports (xformers / fairscale / timm / open_clip / torchvision) are satisfied
by the minimal stubs in tools/ref_stubs (xformers.ops.memory_efficient_attention
== plain softmax attention; checkpoint_wrapper == identity; the rest are
import-time placeholders for code paths the dumps never execute).

    python tools/golden_dump.py --which schedule unet_small ...

Produces npz files consumed by tests/test_golden_parity.py. Each dump fixes
seeds and records inputs + outputs (+ the full torch state dict) of one
reference module on CPU float32, so the JAX side converts the SAME weights
and must reproduce the output.

Models are built at scaled-down dims (structurally identical graphs — same
block wiring, same state-dict naming) because the full-size state dicts are
multi-GB and the parity property being tested is wiring + math, not scale.
Zero-initialized weights (zero_convs, input_hint_block, transformer proj_out,
LIEM convs, head conv — unet_v2v.py:507,638,1555,2128,2132) are perturbed
with seeded noise so the golden actually exercises the ControlNet/LIEM/skip
paths instead of multiplying them by zero.
"""

from __future__ import annotations

import argparse
import os
import sys

STUBS = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'ref_stubs')


def _setup_paths(ref_root: str):
    if STUBS not in sys.path:
        sys.path.append(STUBS)  # append: real packages (if any) win
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)


def _perturb_(module, std: float = 0.05, seed: int = 1):
    """Add seeded noise to every parameter in state-dict order."""
    import torch
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for _, p in sorted(module.named_parameters(), key=lambda kv: kv[0]):
            p.add_(torch.randn(p.shape, generator=g) * std)


def _save(out_dir, name, arrays, state_dict=None, config=None):
    import numpy as np
    payload = dict(arrays)
    if state_dict is not None:
        payload.update({f'sd::{k}': v.numpy() for k, v in state_dict.items()})
    if config is not None:
        import json
        payload['config_json'] = np.array(json.dumps(config))
    np.savez(os.path.join(out_dir, f'{name}.npz'), **payload)
    print(f'{name}.npz done '
          f'({sum(v.size for v in payload.values() if hasattr(v, "size"))} '
          'values)')


def dump_schedule(ref_root: str, out_dir: str):
    import numpy as np
    _setup_paths(ref_root)
    from video_to_video.diffusion.schedules_sdedit import noise_schedule
    sig = noise_schedule('logsnr_cosine_interp', n=1000,
                         zero_terminal_snr=True, scale_min=2.0, scale_max=4.0)
    np.savez(os.path.join(out_dir, 'schedule.npz'), sigmas=sig.numpy())
    print('schedule.npz done')


# dim_mult[-1] MUST be 4: the reference's ControlNet middle_block_out is
# make_zero_conv(embed_dim) with embed_dim = dim*4 (unet_v2v.py:2120), which
# only matches the middle channel count dim*dim_mult[-1] when mult[-1] == 4.
# context_dim stays 1024: the reference decoder hardcodes context_dim=1024
# in its SpatialTransformer (unet_v2v.py:1512) regardless of the ctor arg.
TINY_UNET = dict(dim=32, dim_mult=[1, 4], num_res_blocks=1,
                 attn_scales=[1.0, 0.5], head_dim=8, num_heads=4,
                 context_dim=1024, y_dim=1024, dropout=0.0,
                 use_checkpoint=False)


def dump_unet_small(ref_root: str, out_dir: str):
    """Scaled-down ControlledV2VUNet forward on tiny latents.

    ControlledV2VUNet's ctor is hardcoded full-size (unet_v2v.py:1712-1715),
    but its forward is attribute-driven, so we assemble the controlled pair
    from a tiny Vid2VidSDUNet + tiny VideoControlNet and bind the class
    forward. input_hint_block is rebuilt at the tiny dim (add_dim is a
    hardcoded 320 at unet_v2v.py:2125-2128)."""
    import torch
    _setup_paths(ref_root)
    torch.manual_seed(0)
    from video_to_video.modules.unet_v2v import (ControlledV2VUNet,
                                                 Vid2VidSDUNet,
                                                 VideoControlNet)
    net = Vid2VidSDUNet(**TINY_UNET).float().eval()
    cn = VideoControlNet(**TINY_UNET).float().eval()
    cn.add_dim = TINY_UNET['dim']
    cn.input_hint_block = torch.nn.Conv2d(4, TINY_UNET['dim'], 3, padding=1)
    _perturb_(net, seed=1)
    _perturb_(cn, seed=2)
    net.VideoControlNet = cn
    # adopt the controlled forward + its _forward_single without re-running
    # the (full-size-hardcoded) ctor; every attribute is already in place
    net.__class__ = ControlledV2VUNet

    b, c, f, h, w = 1, 4, 2, 18, 16
    g = torch.Generator().manual_seed(3)
    x = torch.randn(b, c, f, h, w, generator=g)
    t = torch.tensor([899])
    y = torch.randn(b, 7, TINY_UNET['y_dim'], generator=g)
    hint = torch.randn(b, c, f, h, w, generator=g)
    with torch.no_grad():
        out = net(x, t, y, hint=hint)
    _save(out_dir, 'unet_small',
          dict(x=x.numpy(), t=t.numpy(), y=y.numpy(), hint=hint.numpy(),
               out=out.numpy()),
          state_dict=net.state_dict(),
          config=dict(dim=TINY_UNET['dim'], dim_mult=TINY_UNET['dim_mult'],
                      num_res_blocks=TINY_UNET['num_res_blocks'],
                      attn_scales=TINY_UNET['attn_scales'],
                      head_dim=TINY_UNET['head_dim'],
                      num_heads_init_temporal=TINY_UNET['num_heads'],
                      context_dim=TINY_UNET['context_dim']))


DUMPS = {
    'schedule': dump_schedule,
    'unet_small': dump_unet_small,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--reference', default='/root/reference')
    p.add_argument('--out', default='goldens')
    p.add_argument('--which', nargs='*', default=list(DUMPS))
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name in args.which:
        DUMPS[name](args.reference, args.out)


if __name__ == '__main__':
    main()

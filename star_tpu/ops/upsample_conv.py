"""2x nearest-upsample + 3x3 conv, phase-decomposed (TPU MXU form).

Reference semantics: diffusers Upsample2D(use_conv=True) inside the SVD
temporal decoder (video_to_video_model.py:57-63) — F.interpolate(scale=2,
nearest) followed by a SAME 3x3 conv. On the upsampled grid every output
pixel at phase (r, s) = (u%2, v%2) reads a FIXED 2x2 window of the
original grid, so the 3x3-conv-on-2x-input is exactly four 2x2 convs on
the small grid whose kernels are tap-sums of the 3x3 weights:

    z[2i+r, 2j+s] = sum_pq K_rs[p, q] . x[i+p-(1-r), j+q-(1-s)]
    K_rs = einsum('ap,bq,abio->pqio', M_r, M_s, w)
    M_0 = [[1,0],[0,1],[0,1]]   (tap a -> row offset p for even outputs)
    M_1 = [[1,0],[1,0],[0,1]]   (odd outputs)

16 MAC taps per 4 output pixels instead of 36 (2.25x fewer FLOPs), no
GB-scale nearest-repeated intermediate, and the tap-sums happen once in
fp32 on the weights. The four phase outputs interleave back with one
stack+reshape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv_acc import conv_f32acc

_M = (
    ((1.0, 0.0), (0.0, 1.0), (0.0, 1.0)),   # even outputs: a=0 -> p=0; a=1,2 -> p=1
    ((1.0, 0.0), (1.0, 0.0), (0.0, 1.0)),   # odd outputs:  a=0,1 -> p=0; a=2 -> p=1
)


def upsample_conv2x(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                    want_stats: bool = False):
    """x [N, H, W, Cin], kernel [3, 3, Cin, Cout] (fp32 param), bias [Cout]
    -> [N, 2H, 2W, Cout] in x.dtype; == conv3x3(nearest_2x(x), SAME).

    The four phase outputs recombine through the one-pass Pallas interleave
    (ops/conv3x3.interleave2x2) — XLA's stack+reshape spelling spent ~4
    extra full passes on pad/maximum fusions + a T(8,128)->T(2,128) layout
    copy at the 720p decode scale (r3 trace). With want_stats, also returns
    the per-(n, channel) fp32 (sum, sumsq) of the output, reduced inside the
    interleave kernel (per-phase jnp reductions blocked the phase convs'
    fp32->bf16 output fusion and OOM'd the 720p decode graph).
    """
    from .attention import _on_tpu
    from .conv3x3 import (_DISABLE, _pick_hb_upsample, interleave2x2,
                          upsample_conv2x_fused)
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    k32 = kernel.astype(jnp.float32)
    ms = [jnp.asarray(m, jnp.float32) for m in _M]
    k_rs = jnp.stack([jnp.einsum('ap,bq,abio->pqio', ms[r], ms[s], k32)
                      for r in (0, 1) for s in (0, 1)])  # [4, 2, 2, C, Cout]

    if (not _DISABLE and _on_tpu() and cin % 128 == 0 and cout % 128 == 0
            and w % 8 == 0 and _pick_hb_upsample(h, w, cin, cout)):
        out, stats = upsample_conv2x_fused(x, k_rs, bias,
                                           want_stats=want_stats)
        return (out, stats) if want_stats else out

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    b32 = bias.astype(jnp.float32)
    phases = []
    for r in (0, 1):
        for s in (0, 1):
            z = conv_f32acc(
                xp[:, r:r + h + 1, s:s + w + 1],
                k_rs[2 * r + s].astype(x.dtype), (1, 1), 'VALID',
                ('NHWC', 'HWIO', 'NHWC'))
            # bias-add + downcast BEFORE the interleave: a fp32 stack of all
            # four phases is a pixel-scale 14 GB temp at 720p decode
            phases.append((z + b32).astype(x.dtype))
    return interleave2x2(*phases, want_stats=want_stats)


def upsample_conv2x_cropped(x: jax.Array, kernel: jax.Array,
                            bias: jax.Array) -> jax.Array:
    """== conv3x3(nearest_2x(x)[:, 1:-1], SAME): the I2VGen-XL UNet Upsample
    (unet_v2v.py:532-567) crops one row top+bottom BEFORE the conv, so both
    row phases read the window [x[i], x[i+1]] (matrices swap vs the uncropped
    case) and the first/last output rows need a one-tap correction where the
    SAME padding of the cropped grid zeroes a tap the decomposition filled.
    x [N, H, W, Cin] -> [N, 2H-2, 2W, Cout]."""
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    k32 = kernel.astype(jnp.float32)
    ms_row = [jnp.asarray(_M[1], jnp.float32),   # even rows: a=0,1 -> x[i]
              jnp.asarray(_M[0], jnp.float32)]   # odd rows: a=1,2 -> x[i+1]
    ms_col = [jnp.asarray(m, jnp.float32) for m in _M]
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))   # pad W only
    b32 = bias.astype(jnp.float32)

    def col_conv1d(row, k_ab):
        """row [N, W, Cin] x k_ab [3, Cin, Cout] -> two col-phase outputs
        interleaved to [N, 2W, Cout] (fp32, no bias)."""
        rp = jnp.pad(row, ((0, 0), (1, 1), (0, 0)))
        outs = []
        for s_ in (0, 1):
            k_s = jnp.einsum('bq,bio->qio', ms_col[s_], k_ab).astype(x.dtype)
            z_ = conv_f32acc(
                rp[:, s_:s_ + w + 1, None, :], k_s[:, None], (1, 1), 'VALID',
                ('NWHC', 'WHIO', 'NWHC'))[:, :, 0]
            outs.append(z_)
        t_ = jnp.stack(outs, axis=2)                    # [N, W, 2, Cout]
        return t_.reshape(n, 2 * w, cout)

    phases = []
    for r in (0, 1):
        row = []
        for s in (0, 1):
            k_rs = jnp.einsum('ap,bq,abio->pqio', ms_row[r], ms_col[s],
                              k32).astype(x.dtype)
            z = conv_f32acc(
                xp[:, :, s:s + w + 1], k_rs, (1, 1), 'VALID',
                ('NHWC', 'HWIO', 'NHWC'))                 # [N, H-1, W, Cout]
            row.append(z)
        phases.append(jnp.stack(row, axis=3))           # [N, H-1, W, 2, Cout]
    even, odd = phases
    # boundary fixes: top even row zeroes the a=0 tap; bottom odd row zeroes
    # the a=2 tap (each lands on a real x row in the bulk decomposition)
    top = even[:, 0].reshape(n, 2 * w, cout) - col_conv1d(x[:, 0], k32[0])
    bot = odd[:, -1].reshape(n, 2 * w, cout) - col_conv1d(x[:, -1], k32[2])
    even = jnp.concatenate([top.reshape(n, 1, w, 2, cout), even[:, 1:]], 1)
    odd = jnp.concatenate([odd[:, :-1], bot.reshape(n, 1, w, 2, cout)], 1)
    t = jnp.stack([even, odd], axis=2)                  # [N, H-1, 2, W, 2, C]
    t = (t + b32).astype(x.dtype)
    return t.reshape(n, 2 * h - 2, 2 * w, cout)


class UpsampleConv2x(nn.Module):
    """Flax wrapper with nn.Conv((3,3))'s param tree ('kernel' [3,3,Cin,Cout]
    + 'bias'), so converters/checkpoints are interchangeable with the
    nearest-upsample + nn.Conv spelling it replaces. crop_h selects the
    UNet variant (crop 1 row top/bottom before the conv)."""
    features: int
    dtype: jnp.dtype = jnp.float32
    crop_h: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, want_stats: bool = False):
        cin = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (self.features,),
                          jnp.float32)
        if self.crop_h:
            assert not want_stats
            return upsample_conv2x_cropped(x.astype(self.dtype), kernel, bias)
        return upsample_conv2x(x.astype(self.dtype), kernel, bias,
                               want_stats=want_stats)

"""Stock CogVideoX text-to-video sampling (non-SR), TPU-first.

Behavioral reference: cogvideox-based/inference/cli_demo.py (the T2V demo the
reference ships next to the SR pipeline): prompt -> T5 encode -> 50-step
guided sampling from pure noise -> causal 3D VAE decode. Frame count 8k+1
(49 default), 720x480, guidance 6.

Reuses the SR stack with the stock-model deltas: CogVideoDiT(liem=False)
consuming 16 latent channels (no LQ concat), the same ZeroSNR discretization
+ VPSDE-DPM++(2M) solver with DynamicCFG, and the same windowed causal
decode.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.vpsde_sampler import sample_vpsde_dpmpp_2m
from ..diffusion.zero_snr import ZeroSNRDDPMDiscretization
from .cogvideo_sr import CogSamplerConfig


@dataclasses.dataclass
class CogT2VBundle:
    """dit_apply(params, x16ch, t_idx, context) -> v  [B,T,h,w,16];
    vae_decode_window(params, latents, cache, first) -> (video, cache);
    text_encode(params, tokens) -> [B, 226, 4096]; tokenizer; params."""
    dit_apply: Callable[..., jax.Array]
    vae_decode_window: Callable[..., tuple]
    text_encode: Callable[..., jax.Array]
    tokenizer: Any
    params: Any


class CogVideoT2VPipeline:
    """Text -> video with the stock (liem-free) DiT."""

    def __init__(self, models: CogT2VBundle,
                 sampler: CogSamplerConfig = CogSamplerConfig(),
                 latent_hw: tuple[int, int] = (60, 90),
                 latent_channels: int = 16):
        self.models = models
        self.cfg = sampler
        self.disc = ZeroSNRDDPMDiscretization(shift_scale=sampler.shift_scale)
        self.latent_hw = latent_hw
        self.latent_channels = latent_channels
        self._text_cache = {}
        self._run_cache = {}

    def encode_prompt(self, prompt: str) -> jax.Array:
        if prompt not in self._text_cache:
            tokens = jnp.asarray(self.models.tokenizer([prompt]))
            self._text_cache[prompt] = jax.jit(self.models.text_encode)(
                self.models.params['text'], tokens)
        return self._text_cache[prompt]

    def _build_run(self, t_lat: int):
        cfg = self.cfg
        models = self.models
        disc = self.disc
        h, w = self.latent_hw
        cz = self.latent_channels

        def run(params, ctx_c, ctx_u, key):
            k_noise, k_solve = jax.random.split(key)
            ctx_pair = jnp.concatenate([ctx_u, ctx_c], axis=0)  # uncond first

            def denoise_fn(x, t, a, scale):
                xp = jnp.concatenate([x, x], axis=0)
                v = models.dit_apply(params['dit'], xp,
                                     jnp.full((2,), t, jnp.int32),
                                     ctx_pair).astype(jnp.float32)
                # stock VideoScaling: c_skip = alpha on the whole latent,
                # c_out = -sqrt(1-a^2), c_in = 1 (denoiser.py:38-44 without
                # the SR noise-half rule)
                c_out = -jnp.sqrt(1.0 - a * a)
                den = v * c_out + xp.astype(jnp.float32) * a
                d_u, d_c = jnp.split(den, 2, axis=0)
                return d_u + scale * (d_c - d_u)

            noise = jax.random.normal(k_noise, (1, t_lat, h, w, cz),
                                      jnp.float32)
            return sample_vpsde_dpmpp_2m(
                denoise_fn, noise, disc, cfg.num_steps, k_solve,
                guider_scale=cfg.guider_scale, guider_exp=cfg.guider_exp)

        return jax.jit(run)

    def _decode(self, out_z: jax.Array) -> jax.Array:
        t_lat = out_z.shape[1]
        vae_params = self.models.params['vae']
        cache = {}
        if t_lat <= 3:
            video, _ = self.models.vae_decode_window(vae_params, out_z,
                                                     cache, True)
            return video
        recons = []
        for i in range((t_lat - 1) // 2):
            s, e = (0, 3) if i == 0 else (i * 2 + 1, i * 2 + 3)
            video, cache = self.models.vae_decode_window(
                vae_params, out_z[:, s:e], cache, i == 0)
            recons.append(video)
        return jnp.concatenate(recons, axis=1)

    def sample(self, prompt: str, num_frames: int = 49,
               negative_prompt: str = '', seed: int = 42) -> np.ndarray:
        """prompt -> [num_frames, H, W, 3] uint8 (cli_demo.py defaults)."""
        assert (num_frames - 1) % 4 == 0, 'frame count must be 4k+1'
        t_lat = (num_frames - 1) // 4 + 1
        assert t_lat == 1 or t_lat % 2 == 1, \
            'latent frame count must be odd for the decode windowing'
        ctx_c = self.encode_prompt(prompt)
        ctx_u = self.encode_prompt(negative_prompt)
        if t_lat not in self._run_cache:
            self._run_cache[t_lat] = self._build_run(t_lat)
        out_z = self._run_cache[t_lat](self.models.params, ctx_c, ctx_u,
                                       jax.random.PRNGKey(seed))
        out = self._decode(out_z)[0]
        out255 = jnp.clip(out.astype(jnp.float32) * 0.5 + 0.5, 0, 1) * 255.0
        return np.asarray(jax.device_get(out255)).round().astype(np.uint8)

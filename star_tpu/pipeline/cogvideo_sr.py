"""CogVideoX-5B-based STAR super-resolution pipeline, TPU-first.

Behavioral reference: cogvideox-based/sat/sample_sr.py:118-249 +
SATVideoDiffusionEngine.sample_sr (diffusion_video.py:244-291):
  per clip: T5 (un)conditioning -> encode LQ through the causal 3D VAE ->
  CFG-duplicated channel-concat conditioning -> 50-step VPSDE-DPM++(2M) with
  DynamicCFG (scale 6, exp 5) -> chunked causal decode (windows [0:3],
  [2i+1:2i+3] with carried conv caches) -> AdaIN color fix.

720x480 input only (README.md:113), frames = 4k+1; latents [T/4+1, 60, 90, 16].
The whole denoise loop is one jitted scan; decode threads the 'cache'
collection between window calls (per-window norm stats, like the reference).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.vpsde_sampler import sample_vpsde_dpmpp_2m
from ..diffusion.zero_snr import ZeroSNRDDPMDiscretization
from ..models.conditioner import GeneralConditioner, TextEmbedder
from .color_fix import adain_color_fix


@dataclasses.dataclass
class CogModelBundle:
    """Params travel as a pytree; apply callables take them explicitly
    (closure-captured weights bake into jitted graphs as constants — see
    ModelBundle). Contracts:
      dit_apply(params, x32ch, t_idx, context) -> v   [B,T,h,w,16]
      vae_encode(params, video, key) -> scaled latents
      vae_decode_window(params, latents, cache, first) -> (video, new_cache)
      text_encode(params, tokens) -> [B, 226, 4096]
      tokenizer(texts) -> [B, 226] int32
      params: {'dit': .., 'vae': .., 'text': ..}
    """
    dit_apply: Callable[..., jax.Array]
    vae_encode: Callable[..., jax.Array]
    vae_decode_window: Callable[..., tuple]
    text_encode: Callable[..., jax.Array]
    tokenizer: Any
    params: Any


@dataclasses.dataclass(frozen=True)
class CogSamplerConfig:
    num_steps: int = 50
    guider_scale: float = 6.0
    guider_exp: float = 5.0
    shift_scale: float = 1.0


class CogVideoSRPipeline:

    def __init__(self, models: CogModelBundle,
                 sampler: CogSamplerConfig = CogSamplerConfig(),
                 color_fix: str = 'adain'):
        self.models = models
        self.cfg = sampler
        self.disc = ZeroSNRDDPMDiscretization(shift_scale=sampler.shift_scale)
        self.color_fix = color_fix
        self._text_cache = {}
        self._run_cache = {}
        # conditioning goes through the embedder registry, matching sgm's
        # GeneralConditioner (encoders/modules.py:73-233): one T5 crossattn
        # embedder at inference; trainers add ucg_rate for text dropout
        self.conditioner = GeneralConditioner([
            TextEmbedder(input_key='txt', tokenizer=models.tokenizer,
                         encode=self._encode_tokens)])

    def _encode_tokens(self, tokens: jax.Array) -> jax.Array:
        return jax.jit(self.models.text_encode)(
            self.models.params['text'], tokens)

    def encode_prompt(self, prompt: str) -> jax.Array:
        if prompt not in self._text_cache:
            self._text_cache[prompt] = self.conditioner(
                {'txt': [prompt]})['crossattn']
        return self._text_cache[prompt]

    def _build_run(self, f: int, h: int, w: int):
        cfg = self.cfg
        models = self.models
        disc = self.disc
        t_lat = (f - 1) // 4 + 1

        def run(params, video: jax.Array, ctx_c: jax.Array,
                ctx_u: jax.Array, key: jax.Array) -> jax.Array:
            k_enc, k_noise, k_solve = jax.random.split(key, 3)
            lq_z = models.vae_encode(params['vae'], video[None], k_enc)
            lq_pair = jnp.concatenate([lq_z, lq_z], axis=0)
            # uncond FIRST in the CFG pair (guiders.py:44-48)
            ctx_pair = jnp.concatenate([ctx_u, ctx_c], axis=0)

            def denoise_fn(x, t, a, scale):
                xp = jnp.concatenate([x, x], axis=0)
                xin = jnp.concatenate([xp.astype(lq_pair.dtype), lq_pair],
                                      axis=-1)       # channel-concat LQ
                v = models.dit_apply(params['dit'], xin,
                                     jnp.full((2,), t, jnp.int32),
                                     ctx_pair).astype(jnp.float32)
                # VideoScaling + SR rule: c_skip applies to the noise half
                # only (denoiser.py:38-44); c_in = 1
                c_out = -jnp.sqrt(1.0 - a * a)
                den = v * c_out + xp.astype(jnp.float32) * a
                d_u, d_c = jnp.split(den, 2, axis=0)
                return d_u + scale * (d_c - d_u)

            noise = jax.random.normal(k_noise, lq_z.shape, jnp.float32)
            out_z = sample_vpsde_dpmpp_2m(
                denoise_fn, noise, disc, cfg.num_steps, k_solve,
                guider_scale=cfg.guider_scale, guider_exp=cfg.guider_exp)
            return out_z

        return jax.jit(run)

    def _decode(self, out_z: jax.Array) -> jax.Array:
        """Serial chunked decode, reference windows (sample_sr.py:213-228)."""
        t_lat = out_z.shape[1]
        vae_params = self.models.params['vae']
        recons = []
        cache = {}
        if t_lat <= 3:
            video, _ = self.models.vae_decode_window(vae_params, out_z,
                                                     cache, True)
            return video
        loop_num = (t_lat - 1) // 2
        for i in range(loop_num):
            if i == 0:
                s, e = 0, 3
            else:
                s, e = i * 2 + 1, i * 2 + 3
            video, cache = self.models.vae_decode_window(
                vae_params, out_z[:, s:e], cache, i == 0)
            recons.append(video)
        return jnp.concatenate(recons, axis=1)

    def enhance_a_video(self, lq_frames: np.ndarray, prompt: str,
                        negative_prompt: str = '',
                        seed: int = 42) -> np.ndarray:
        """lq_frames: [F, H, W, 3] uint8 RGB (already at target 720x480
        resolution, like the reference's pre-upsampled LQ input) -> uint8."""
        f, h, w, _ = lq_frames.shape
        assert (f - 1) % 4 == 0, 'frame count must be 4k+1 (data_video.py)'
        t_lat = (f - 1) // 4 + 1
        assert t_lat == 1 or t_lat % 2 == 1, (
            'latent frame count must be odd (the reference decode windowing '
            'drops the tail otherwise — yaml comment "must be 13, 11 or 9")')
        video = (lq_frames.astype(np.float32) / 255.0 - 0.5) / 0.5

        ctx_c = self.encode_prompt(prompt)
        ctx_u = self.encode_prompt(negative_prompt)

        bucket = (f, h, w)
        if bucket not in self._run_cache:
            self._run_cache[bucket] = self._build_run(*bucket)
        out_z = self._run_cache[bucket](
            self.models.params, jnp.asarray(video), ctx_c, ctx_u,
            jax.random.PRNGKey(seed))

        out = self._decode(out_z)[0]                     # [F, H, W, 3]
        out255 = jnp.clip(out.astype(jnp.float32) * 0.5 + 0.5, 0, 1) * 255.0
        if self.color_fix == 'adain':
            out255 = adain_color_fix(out255, jnp.asarray(video))
        return np.asarray(jax.device_get(out255)).round().astype(np.uint8)

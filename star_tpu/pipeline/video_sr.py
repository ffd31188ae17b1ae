"""End-to-end I2VGen-XL video super-resolution pipeline, TPU-first.

Behavioral reference: VideoToVideo_sr.test (video_to_video_model.py:75-139)
and the STAR driver class (inference_sr.py:21-84).

Everything between host video I/O and the returned frames runs as ONE jitted
XLA graph per shape bucket — bilinear 4x upsample, pad-to-grid, VAE encode,
SDEdit diffuse to t=total_noise_levels-1, chunked CFG denoising with the
DPM++(2M)-SDE scan, windowed temporal VAE decode, unpad, and AdaIN color fix
(the BASELINE.json north star: HBM-in -> HBM-out, no host round-trips).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..diffusion import (DiffusionTables, Schedule, build_sigma_ladder,
                         default_star_schedule, denoise_to_x0, diffuse,
                         sample_dpmpp_2m_sde, sample_heun)
from ..ops.resize import pad_to_fit, resize_bilinear
from .chunking import chunked_x0_fn, make_chunks
from .color_fix import adain_color_fix, wavelet_color_fix


@dataclasses.dataclass
class ModelBundle:
    """The three networks the pipeline drives. Params travel as a pytree and
    every apply callable takes them explicitly — closures over concrete
    weight arrays would bake them into the jitted graph as constants
    (measured: 8.5GB of captured constants -> HBM exhaustion at full size):
      unet_apply(params, x, t, y, hint) -> v   [B,F,h,w,4] latents
      vae_encode(params, video, key) -> latents
      vae_decode(params, latents) -> video
      text_encode(params, tokens) -> y         [B,77] -> [B,77,1024]
      params: {'unet': .., 'vae': .., 'text': ..}
    """
    unet_apply: Callable[..., jax.Array]
    vae_encode: Callable[..., jax.Array]
    vae_decode: Callable[..., jax.Array]
    text_encode: Callable[..., jax.Array]
    tokenizer: Any
    params: Any


class STARPipeline:
    """JAX counterpart of the reference STAR class (inference_sr.py:21)."""

    def __init__(self, models: ModelBundle,
                 config: PipelineConfig = PipelineConfig(),
                 schedule: Optional[Schedule] = None, mesh=None):
        """mesh: optional Mesh — the solver's independent chunk windows are
        sharded over its 'data' axis (multi-chip long-video scaling)."""
        self.models = models
        self.cfg = config
        self.schedule = schedule or default_star_schedule()
        self.tables = DiffusionTables.from_schedule(self.schedule)
        self.mesh = mesh
        self._run_cache = {}
        self._text_cache = {}

    # ------------------------------------------------------------------ text
    def encode_prompt(self, prompt: str) -> jax.Array:
        if prompt not in self._text_cache:
            tokens = jnp.asarray(self.models.tokenizer([prompt]))
            self._text_cache[prompt] = jax.jit(self.models.text_encode)(
                self.models.params['text'], tokens)
        return self._text_cache[prompt]

    # ------------------------------------------------------------------ core
    def _build_run(self, f: int, h: int, w: int, target_h: int, target_w: int):
        """Jitted whole-clip graph for one shape bucket."""
        cfg = self.cfg
        sc = cfg.sampler
        padding = pad_to_fit(target_h, target_w, cfg.pad_grid)
        w1, w2, h1, h2 = padding
        pad_h, pad_w = target_h + h1 + h2, target_w + w1 + w2
        chunk_inds = (make_chunks(f, cfg.max_chunk_len,
                                  chunk_overlap_ratio=cfg.chunk_overlap_ratio)
                      if f > cfg.max_chunk_len else [(0, f)])
        sigmas = build_sigma_ladder(
            self.schedule, steps=sc.steps, t_max=sc.total_noise_levels - 1,
            t_min=0, solver_mode=sc.solver_mode,
            discretization=sc.discretization)
        tables = self.tables
        models = self.models

        # The clip runs as TWO jitted graphs — upsample/encode/solve, then
        # decode/unpad/color-fix. Latents hand off ON DEVICE (a few MB; no
        # host round-trip), and each graph gets its own HBM peak: the
        # grouped-window decode (decode_batch=3, ~30% faster at 720p) fits
        # again, where the fused single graph hit the 15.75G ceiling (r3).
        def run_solve(params, video: jax.Array, y_cond: jax.Array,
                      y_uncond: jax.Array, key: jax.Array) -> jax.Array:
            # video: [F, H, W, 3] in [-1, 1]
            k_enc, k_diff, k_solve = jax.random.split(key, 3)
            up = resize_bilinear(video, target_h, target_w)
            padded = jnp.pad(up[None], ((0, 0), (0, 0), (h1, h2), (w1, w2),
                                        (0, 0)),
                             constant_values=cfg.pad_value)
            z_lq = models.vae_encode(params['vae'], padded, k_enc)

            t_init = jnp.full((1,), sc.total_noise_levels - 1, jnp.int32)
            noise = jax.random.normal(k_diff, z_lq.shape, jnp.float32)
            noised = diffuse(tables, z_lq.astype(jnp.float32), t_init, noise)

            def denoise_chunk(xt, hint, t):
                bb = xt.shape[0]
                # cfg_pair: the UNet runs the y-independent prefix once at
                # batch bb and splits at the first cross-attn (unet.py)
                yp = jnp.concatenate([jnp.tile(y_cond, (bb, 1, 1)),
                                      jnp.tile(y_uncond, (bb, 1, 1))], axis=0)
                tp = jnp.full((bb,), t, jnp.int32)
                v = models.unet_apply(params['unet'], xt, tp, yp, hint,
                                      cfg_pair=True)
                v_c, v_u = jnp.split(v, 2, axis=0)
                return denoise_to_x0(tables, xt, jnp.full((bb,), t), v_c, v_u,
                                     guide_scale=sc.guide_scale,
                                     guide_rescale=sc.guide_rescale)

            x0_fn = chunked_x0_fn(denoise_chunk, z_lq, chunk_inds,
                                  mesh=self.mesh)
            solver = (sample_dpmpp_2m_sde if sc.solver == 'dpmpp_2m_sde'
                      else sample_heun)
            return solver(x0_fn, noised, self.schedule, sigmas, k_solve)

        def run_decode(params, gen: jax.Array,
                       video: jax.Array) -> jax.Array:
            out = models.vae_decode(params['vae'], gen)     # [1,F,ph,pw,3]
            out = out[0, :, h1:h1 + target_h, w1:w1 + target_w, :]
            out = jnp.clip(out.astype(jnp.float32) * 0.5 + 0.5,
                           0.0, 1.0) * 255.0
            if cfg.color_fix == 'adain':
                out = adain_color_fix(out, video)
            elif cfg.color_fix == 'wavelet':
                out = wavelet_color_fix(out, video)
            # round + uint8 ON DEVICE: the fp32 readback is 4x the bytes
            # through the tunnel (88 MB vs 22 MB at 8x720p — a visible slice
            # of the capstone's ~2.8 s host/tunnel exposure)
            return jnp.round(jnp.clip(out, 0.0, 255.0)).astype(jnp.uint8)

        return jax.jit(run_solve), jax.jit(run_decode)

    # ---------------------------------------------------------- cache warming
    def warm(self, f: int, h: int, w: int,
             target_res: Optional[tuple[int, int]] = None) -> float:
        """AOT-compile the whole-clip graph for one shape bucket WITHOUT
        running it (and without real weights — abstract params suffice).

        With the persistent compile cache enabled (utils/cache.py), a
        deployment can warm every production shape bucket ahead of traffic;
        the reference pays its first-clip compile... nothing, it's eager —
        this is the TPU-side counterpart of that cost, paid once offline.
        Returns the estimated FLOPs of the compiled graph (cost analysis).
        """
        if target_res is None:
            target_h, target_w = h * self.cfg.upscale, w * self.cfg.upscale
        else:
            target_h, target_w = target_res
        bucket = (f, h, w, target_h, target_w)
        run_solve, run_decode = self._build_run(*bucket)
        sds = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
        p_abs = jax.tree.map(sds, self.models.params)
        tok_abs = jax.ShapeDtypeStruct((1, 77), jnp.int32)
        y_abs = sds(jax.eval_shape(self.models.text_encode, p_abs['text'],
                                   tok_abs))
        vid_abs = jax.ShapeDtypeStruct((f, h, w, 3), jnp.float32)
        key_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)
        sol = run_solve.lower(p_abs, vid_abs, y_abs, y_abs,
                              key_abs).compile()
        gen_abs = sds(jax.eval_shape(run_solve, p_abs, vid_abs, y_abs,
                                     y_abs, key_abs))
        dec = run_decode.lower(p_abs, gen_abs, vid_abs).compile()
        flops = 0.0
        for compiled in (sol, dec):
            cost = compiled.cost_analysis() or {}
            flops += float(cost.get('flops', 0.0))
        return flops

    # ------------------------------------------------------------- interface
    def enhance_a_video_async(self, frames: np.ndarray, prompt: str,
                              seed: int = 666,
                              target_res: Optional[tuple[int, int]] = None
                              ) -> jax.Array:
        """Dispatch the whole clip WITHOUT blocking and return the on-device
        uint8 output (JAX dispatch is asynchronous). A batch driver can
        overlap clip N's device compute with clip N+1's host decode/dispatch
        and clip N-1's readback+save (cli/inference_sr.py does); the
        reference serializes one process per video (inference_sr.sh:43-53).
        Materialize with jax.device_get / np.asarray."""
        f, h, w, _ = frames.shape
        if target_res is None:
            target_h, target_w = h * self.cfg.upscale, w * self.cfg.upscale
        else:
            target_h, target_w = target_res

        video = frames.astype(np.float32) / 255.0
        video = (video - 0.5) / 0.5

        y_cond = self.encode_prompt(prompt + self.cfg.positive_prompt)
        y_uncond = self.encode_prompt(self.cfg.negative_prompt)

        bucket = (f, h, w, target_h, target_w)
        if bucket not in self._run_cache:
            self._run_cache[bucket] = self._build_run(*bucket)
        run_solve, run_decode = self._run_cache[bucket]
        video_dev = jnp.asarray(video)
        gen = run_solve(self.models.params, video_dev, y_cond, y_uncond,
                        jax.random.PRNGKey(seed))
        return run_decode(self.models.params, gen, video_dev)

    def enhance_a_video(self, frames: np.ndarray, prompt: str,
                        seed: int = 666,
                        target_res: Optional[tuple[int, int]] = None
                        ) -> np.ndarray:
        """frames: [F, H, W, 3] uint8 RGB -> [F, target_H, target_W, 3] uint8.

        Mirrors STAR.enhance_a_video (inference_sr.py:50-84): caption =
        prompt + positive_prompt, target = upscale*(h, w), seed 666 default.
        """
        out = self.enhance_a_video_async(frames, prompt, seed, target_res)
        return np.asarray(jax.device_get(out))

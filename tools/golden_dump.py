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


# ch must be a multiple of 32 (GroupNorm(32) everywhere)
TINY_VAE = dict(ch=32, ch_mult=[1, 2], num_res_blocks=1,
                attn_resolutions=[], in_channels=3, out_ch=3, resolution=32,
                z_channels=4, double_z=True, dropout=0.0,
                temporal_compress_times=2)


def dump_causal_vae(ref_root: str, out_dir: str):
    """Scaled-down ContextParallelEncoder3D / Decoder3D round trip on a
    5-frame clip (odd t exercises the first-frame-special temporal
    down/upsampling). Encoder gather_norm=True / decoder False, matching
    cogvideox_5b_infer_sr.yaml:113-141. CP is uninitialized, so the reference
    runs its single-device fake-cp path — the semantics our single-device
    CausalEncoder3D/CausalDecoder3D mirror."""
    import torch
    _setup_paths(ref_root)
    sat_root = os.path.join(ref_root, 'cogvideox-based', 'sat')
    if sat_root not in sys.path:
        sys.path.insert(0, sat_root)
    torch.manual_seed(0)
    # the reference's fake-cp path still queries the (gloo) process group +
    # CP bookkeeping even single-device (cp_enc_dec.py:246-252, sgm/util.py:51)
    import sgm.util as sgm_util
    if not torch.distributed.is_initialized():
        torch.distributed.init_process_group(
            'gloo', rank=0, world_size=1,
            init_method='tcp://127.0.0.1:29511')
    if not sgm_util.is_context_parallel_initialized():
        sgm_util.initialize_context_parallel(1)
    from vae_modules.cp_enc_dec import (ContextParallelDecoder3D,
                                        ContextParallelEncoder3D)
    enc = ContextParallelEncoder3D(**TINY_VAE, gather_norm=True).float().eval()
    dec = ContextParallelDecoder3D(**TINY_VAE, gather_norm=False).float().eval()
    _perturb_(enc, seed=4)
    _perturb_(dec, seed=5)

    g = torch.Generator().manual_seed(6)
    x = torch.randn(1, 3, 5, 32, 32, generator=g)  # [B, C, T, H, W]
    with torch.no_grad():
        moments = enc(x)
        z = moments[:, :TINY_VAE['z_channels']]  # mean half
        rec = dec(z)
    _save(out_dir, 'causal_vae',
          dict(x=x.numpy(), moments=moments.numpy(), z=z.numpy(),
               rec=rec.numpy()),
          state_dict={**{f'encoder.{k}': v for k, v in
                         enc.state_dict().items()},
                      **{f'decoder.{k}': v for k, v in
                         dec.state_dict().items()}},
          config=dict(ch=TINY_VAE['ch'], ch_mult=TINY_VAE['ch_mult'],
                      num_res_blocks=TINY_VAE['num_res_blocks'],
                      z_channels=TINY_VAE['z_channels'],
                      temporal_compress_level=1))


def dump_t5_small(ref_root: str, out_dir: str):
    """Tiny HF T5EncoderModel (the exact class both reference text paths
    wrap: video_to_video/modules/t5.py:29, sgm encoders modules.py:248) with
    random weights; no attention mask, matching the reference's no-mask call
    (SURVEY §2.2 quirk). d_kv = d_model/num_heads as in t5-v1_1-xxl."""
    import torch
    from transformers import T5Config, T5EncoderModel
    torch.manual_seed(0)
    cfg = T5Config(vocab_size=128, d_model=64, d_kv=16, d_ff=160,
                   num_layers=3, num_heads=4, relative_attention_num_buckets=8,
                   relative_attention_max_distance=20, dropout_rate=0.0,
                   feed_forward_proj='gated-gelu', is_encoder_decoder=False,
                   use_cache=False, tie_word_embeddings=False)
    model = T5EncoderModel(cfg).float().eval()
    g = torch.Generator().manual_seed(7)
    tokens = torch.randint(0, 128, (2, 11), generator=g)
    with torch.no_grad():
        out = model(input_ids=tokens).last_hidden_state
    _save(out_dir, 't5_small',
          dict(tokens=tokens.numpy(), out=out.numpy()),
          state_dict=model.state_dict(),
          config=dict(vocab_size=128, d_model=64, d_ff=160, num_heads=4,
                      num_layers=3, rel_buckets=8, rel_max_distance=20))


def dump_clip_text(ref_root: str, out_dir: str):
    """Tiny HF CLIPTextModel with random weights; penultimate hidden state +
    final LN, reproducing FrozenOpenCLIPEmbedder's 'penultimate' semantics
    (embedder.py:54-72). HF and open_clip share the architecture (laion ViT-H
    ships in both formats); the state dict is saved HF-style and the test
    routes it through hf_clip_text_to_open_clip_sd + clip_text_name_map."""
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel
    torch.manual_seed(0)
    layers = 3
    cfg = CLIPTextConfig(vocab_size=96, hidden_size=64,
                         intermediate_size=256, num_hidden_layers=layers,
                         num_attention_heads=4, max_position_embeddings=16,
                         hidden_act='gelu', attention_dropout=0.0)
    model = CLIPTextModel(cfg).float().eval()
    g = torch.Generator().manual_seed(8)
    tokens = torch.randint(0, 96, (2, 16), generator=g)
    with torch.no_grad():
        hs = model(input_ids=tokens, output_hidden_states=True).hidden_states
        pen = hs[-2]  # stop one block before the end
        out = model.text_model.final_layer_norm(pen)
    _save(out_dir, 'clip_text',
          dict(tokens=tokens.numpy(), out=out.numpy()),
          state_dict=model.state_dict(),
          config=dict(vocab_size=96, width=64, heads=4, layers=layers,
                      context_length=16))


def dump_vpsde(ref_root: str, out_dir: str):
    """Reference VPSDEDPMPP2MSampler (sampling.py:574-685) + ZeroSNR
    discretizer + DynamicCFG, run end-to-end with a closed-form mock denoiser
    and torch.randn_like patched to zeros — a deterministic 12-step
    trajectory golden covering the ladder, timestep indexing, DynamicCFG
    schedule and both multistep update branches."""
    import torch
    _setup_paths(ref_root)
    sat_root = os.path.join(ref_root, 'cogvideox-based', 'sat')
    if sat_root not in sys.path:
        sys.path.insert(0, sat_root)
    from sgm.modules.diffusionmodules.sampling import VPSDEDPMPP2MSampler

    n = 12
    sampler = VPSDEDPMPP2MSampler(
        discretization_config={
            'target':
                'sgm.modules.diffusionmodules.discretizer.'
                'ZeroSNRDDPMDiscretization',
            'params': {}},
        guider_config={
            'target': 'sgm.modules.diffusionmodules.guiders.DynamicCFG',
            'params': {'scale': 6.0, 'exp': 5.0, 'num_steps': n}},
        num_steps=n, device='cpu', verbose=False)

    def denoiser(x, sigma, cond, **kw):
        s = sigma.reshape(-1, 1, 1, 1, 1).float()
        return torch.tanh(x) * s + cond['crossattn'].reshape(-1, 1, 1, 1, 1)

    g = torch.Generator().manual_seed(9)
    x0 = torch.randn(1, 2, 4, 8, 8, generator=g)
    cond = {'crossattn': torch.tensor([0.3])}
    uc = {'crossattn': torch.tensor([-0.2])}

    real_randn_like = torch.randn_like
    torch.randn_like = lambda t, **kw: torch.zeros_like(t)
    try:
        with torch.no_grad():
            out = sampler(denoiser, x0.clone(), cond, uc=uc, scale=None)
    finally:
        torch.randn_like = real_randn_like

    acs, timesteps = sampler.discretization(
        n, device='cpu', return_idx=True, do_append_zero=False)
    _save(out_dir, 'vpsde_sampler',
          dict(x0=x0.numpy(), out=out.numpy(),
               ladder=torch.cat(
                   [acs, acs.new_ones([1])]).numpy(),
               timesteps=__import__('numpy').asarray(timesteps),
               num_steps=__import__('numpy').asarray(n)))


def dump_vpode(ref_root: str, out_dir: str):
    """Reference VPODEDPMPP2MSampler (sampling.py:688-773) deterministic
    12-step trajectory with the same mock denoiser as dump_vpsde, plus the
    EDM and Legacy discretizer ladders (discretizer.py:32-72) — goldens for
    the config-reachable-but-unselected sampler/discretizer variants."""
    import numpy as np
    import torch
    _setup_paths(ref_root)
    sat_root = os.path.join(ref_root, 'cogvideox-based', 'sat')
    if sat_root not in sys.path:
        sys.path.insert(0, sat_root)
    from sgm.modules.diffusionmodules.sampling import VPODEDPMPP2MSampler
    from sgm.modules.diffusionmodules.discretizer import (
        EDMDiscretization, LegacyDDPMDiscretization)

    n = 12
    sampler = VPODEDPMPP2MSampler(
        discretization_config={
            'target':
                'sgm.modules.diffusionmodules.discretizer.'
                'ZeroSNRDDPMDiscretization',
            'params': {}},
        guider_config={
            'target': 'sgm.modules.diffusionmodules.guiders.DynamicCFG',
            'params': {'scale': 6.0, 'exp': 5.0, 'num_steps': n}},
        num_steps=n, device='cpu', verbose=False)

    def denoiser(x, sigma, cond, **kw):
        s = sigma.reshape(-1, 1, 1, 1, 1).float()
        return torch.tanh(x) * s + cond['crossattn'].reshape(-1, 1, 1, 1, 1)

    g = torch.Generator().manual_seed(9)
    x0 = torch.randn(1, 2, 4, 8, 8, generator=g)
    cond = {'crossattn': torch.tensor([0.3])}
    uc = {'crossattn': torch.tensor([-0.2])}
    with torch.no_grad():
        out = sampler(denoiser, x0.clone(), cond, uc=uc, scale=None)

    # NB: the reference's Discretization.__call__ passes return_idx= into
    # get_sigmas, which EDM/Legacy don't accept (a latent reference bug) —
    # go through get_sigmas directly and append the terminal zero by hand
    edm = torch.cat([EDMDiscretization().get_sigmas(10, device='cpu'),
                     torch.zeros(1)])
    legacy = torch.cat([
        LegacyDDPMDiscretization().get_sigmas(25, device='cpu'),
        torch.zeros(1)])
    _save(out_dir, 'vpode_sampler',
          dict(x0=x0.numpy(), out=out.numpy(),
               edm_sigmas=edm.numpy(), legacy_sigmas=legacy.numpy(),
               num_steps=np.asarray(n)))


def dump_sample_sr(ref_root: str, out_dir: str):
    """Deterministic 15-step fast-mode GaussianDiffusion.sample_sr trajectory
    (diffusion_sdedit.py:264-412) with a closed-form mock denoiser: covers
    the trailing 4+11 ladder split, sigma->t rounding, CFG + guide_rescale,
    the dpmpp_2m_sde update chain (eta=1, stochastic term zeroed via the
    torchsde stub / s_noise=0), and model_chunk_fn's overlap-cut stitching
    (:330-353) incl. the per-chunk hint slicing."""
    import numpy as np
    import torch
    _setup_paths(ref_root)
    from video_to_video.diffusion.diffusion_sdedit import GaussianDiffusion
    from video_to_video.diffusion.schedules_sdedit import noise_schedule
    from video_to_video.video_to_video_model import make_chunks

    gd = GaussianDiffusion(sigmas=noise_schedule(
        'logsnr_cosine_interp', n=1000, zero_terminal_snr=True,
        scale_min=2.0, scale_max=4.0))

    g = torch.Generator().manual_seed(14)
    b, c, f, h, w = 1, 4, 10, 8, 8
    noised = torch.randn(b, c, f, h, w, generator=g)
    hint = torch.randn(b, c, f, h, w, generator=g)
    chunk_inds = make_chunks(f, interp_f_num=0, max_chunk_len=4)

    def model(xt, t=None, y=None, hint=None, hint_chunk=None,
              variant_info=None, **kw):
        hh = hint_chunk if hint_chunk is not None else hint
        tt = t.float().reshape(-1, 1, 1, 1, 1) / 1000.0
        return torch.tanh(xt) * tt + y + 0.05 * hh

    model_kwargs = [{'y': torch.tensor(0.3)}, {'y': torch.tensor(-0.2)},
                    {'hint': hint}]
    with torch.no_grad():
        out = gd.sample_sr(
            noise=noised.clone(), model=model, model_kwargs=model_kwargs,
            guide_scale=7.5, guide_rescale=0.2, solver='dpmpp_2m_sde',
            solver_mode='fast', steps=15, t_max=899, t_min=0,
            discretization='trailing', chunk_inds=chunk_inds,
            s_noise=0.0, show_progress=False)
        # unchunked variant on the first 4 frames (model_fn path)
        out_nochunk = gd.sample_sr(
            noise=noised[:, :, :4].clone(), model=model,
            model_kwargs=[{'y': torch.tensor(0.3)},
                          {'y': torch.tensor(-0.2)},
                          {'hint': hint[:, :, :4]}],
            guide_scale=7.5, guide_rescale=0.2, solver='dpmpp_2m_sde',
            solver_mode='fast', steps=15, t_max=899, t_min=0,
            discretization='trailing', chunk_inds=None,
            s_noise=0.0, show_progress=False)
    _save(out_dir, 'sample_sr',
          dict(noised=noised.numpy(), hint=hint.numpy(), out=out.numpy(),
               out_nochunk=out_nochunk.numpy(),
               chunk_inds=np.asarray(chunk_inds),
               y_cond=np.asarray(0.3, np.float32),
               y_uncond=np.asarray(-0.2, np.float32)))


def dump_svd_vae(ref_root: str, out_dir: str):
    """Scaled-down AutoencoderKLTemporalDecoder (the diffusers class the
    reference builds at video_to_video_model.py:57-63 and chunk-drives at
    :141-161) encode + temporal-decode round trip. diffusers is not
    installed; tools/ref_stubs/diffusers re-implements the module tree with
    the published state-dict naming (see its docstring). 5 frames exercises
    the temporal (3,1,1) convs, the learned alpha blend and time_conv_out;
    (32, 64) channels exercise the j==0 shortcut in both towers."""
    import torch
    _setup_paths(ref_root)
    torch.manual_seed(0)
    from diffusers import AutoencoderKLTemporalDecoder
    assert getattr(AutoencoderKLTemporalDecoder, '__module__', '') \
        .startswith('diffusers'), 'stub import failed'
    chs = (32, 64)
    vae = AutoencoderKLTemporalDecoder(
        block_out_channels=chs, layers_per_block=2).float().eval()
    _perturb_(vae, seed=12)

    g = torch.Generator().manual_seed(13)
    f = 5
    x = torch.randn(f, 3, 32, 32, generator=g)       # [(b f), 3, H, W]
    with torch.no_grad():
        moments = vae.quant_conv(vae.encoder(x))
        z = moments[:, :vae.config.latent_channels]  # mean half
        rec = vae.decode(z, num_frames=f).sample
    _save(out_dir, 'svd_vae',
          dict(x=x.numpy(), moments=moments.numpy(), z=z.numpy(),
               rec=rec.numpy()),
          state_dict=vae.state_dict(),
          config=dict(block_out_channels=list(chs), layers_per_block=2,
                      num_frames=f))


TINY_DIT = dict(num_frames=9, time_compressed_rate=4, latent_width=8,
                latent_height=8, patch_size=2, in_channels=8, out_channels=8,
                hidden_size=64, num_layers=2, num_attention_heads=4,
                time_embed_dim=32, text_length=5, text_hidden_size=12)


def dump_dit(ref_root: str, out_dir: str):
    """Scaled-down DiffusionTransformer (dit_video_concat.py:636-831) forward
    on the reference's own patched SAT transformer
    (cogvideox-based/transformer.py, incl. LIEM), using the single-GPU sat
    stub package. Covers patch embed, 3D RoPE, qk-LN -> rotary hook chain,
    adaLN-Zero with split text/img modulation, LIEM gates, the transformer
    final_layernorm and FinalLayerMixin unpatchify."""
    import torch
    _setup_paths(ref_root)
    sat_root = os.path.join(ref_root, 'cogvideox-based', 'sat')
    if sat_root not in sys.path:
        sys.path.insert(0, sat_root)
    torch.manual_seed(0)
    from types import SimpleNamespace

    from dit_video_concat import DiffusionTransformer

    c = TINY_DIT
    targs = SimpleNamespace(
        checkpoint_activations=False, vocab_size=1, max_sequence_length=64,
        layernorm_order='pre', skip_init=False, model_parallel_size=1,
        is_decoder=False, hidden_dropout=0.0, attention_dropout=0.0,
        parallel_output=True)
    model = DiffusionTransformer(
        targs, num_frames=c['num_frames'],
        time_compressed_rate=c['time_compressed_rate'],
        latent_width=c['latent_width'], latent_height=c['latent_height'],
        patch_size=c['patch_size'], in_channels=c['in_channels'],
        out_channels=c['out_channels'], hidden_size=c['hidden_size'],
        num_layers=c['num_layers'],
        num_attention_heads=c['num_attention_heads'],
        elementwise_affine=True, time_embed_dim=c['time_embed_dim'],
        modules={
            'pos_embed_config': {
                'target': 'dit_video_concat.Rotary3DPositionEmbeddingMixin',
                'params': {'hidden_size_head':
                           c['hidden_size'] // c['num_attention_heads'],
                           'text_length': c['text_length']}},
            'patch_embed_config': {
                'target': 'dit_video_concat.ImagePatchEmbeddingMixin',
                'params': {'text_hidden_size': c['text_hidden_size']}},
            'adaln_layer_config': {
                'target': 'dit_video_concat.AdaLNMixin',
                'params': {'qk_ln': True}},
            'final_layer_config': {
                'target': 'dit_video_concat.FinalLayerMixin'},
        }).float().eval()
    _perturb_(model, seed=10)

    g = torch.Generator().manual_seed(11)
    t_lat = (c['num_frames'] - 1) // c['time_compressed_rate'] + 1
    x = torch.randn(1, t_lat, 2 * c['in_channels'], c['latent_height'],
                    c['latent_width'], generator=g)  # [b, t, 2c, h, w]
    timesteps = torch.tensor([499.0])
    context = torch.randn(1, c['text_length'], c['text_hidden_size'],
                          generator=g)
    with torch.no_grad():
        out = model(x, timesteps=timesteps, context=context)
    _save(out_dir, 'dit_small',
          dict(x=x.numpy(), timesteps=timesteps.numpy(),
               context=context.numpy(), out=out.numpy()),
          state_dict=model.state_dict(), config=dict(c))


DUMPS = {
    'schedule': dump_schedule,
    'unet_small': dump_unet_small,
    'causal_vae': dump_causal_vae,
    't5_small': dump_t5_small,
    'clip_text': dump_clip_text,
    'vpsde_sampler': dump_vpsde,
    'vpode_sampler': dump_vpode,
    'dit_small': dump_dit,
    'svd_vae': dump_svd_vae,
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

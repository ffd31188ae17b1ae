"""star_tpu — a TPU-native (JAX/XLA/Pallas/pjit) real-world video super-resolution
framework with the capabilities of NJU-PCALab/STAR.

Subpackages:
  ops        — TPU kernels + numerics (attention, groupnorm, resize, temporal conv)
  diffusion  — pure-function diffusion math (schedules, v-prediction, solvers)
  models     — flax backbones (I2VGen-XL video UNet + ControlNet, CogVideoX DiT, CLIP/T5)
  vae        — SVD temporal VAE + CogVideoX causal 3D VAE (scan-carried temporal tiling)
  pipeline   — end-to-end video SR pipelines (pad/upsample/chunk/sample/decode/color-fix)
  parallel   — device mesh, sharding rules (data/tensor/context axes)
  data       — host-side video I/O + paired-data degradation engine
  train      — optax training loops (v-pred MSE + frequency loss)
  convert    — torch/SAT checkpoint -> JAX param tree converters
"""

__version__ = "0.1.0"

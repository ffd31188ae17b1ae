"""torchsde import stub: BrownianTree that returns ZERO increments.

solvers_sdedit.py's BrownianTreeNoiseSampler is only used by
sample_dpmpp_2m_sde's stochastic term; the golden dumps run with this stub
so the trajectory is deterministic (our JAX side zeroes the same term with
s_noise=0 — the noise STATISTICS deviation torchsde->threefry is documented
in star_tpu/diffusion/solvers.py)."""

import torch


class BrownianTree:
    def __init__(self, t0, w0, t1=None, entropy=None, **kwargs):
        self._w0 = w0

    def __call__(self, t0, t1=None):
        return torch.zeros_like(self._w0)

import torch
import torch.nn as nn


class LayerNorm(nn.LayerNorm):
    """SAT's LayerNorm (apex fused or torch fallback) computes standard LN;
    the pb_relax variant is off by default."""

    def __init__(self, normalized_shape, eps=1e-5, elementwise_affine=True,
                 pb_relax=False, **kwargs):
        assert not pb_relax, 'pb_relax LN not supported in the stub'
        super().__init__(normalized_shape, eps=eps,
                         elementwise_affine=elementwise_affine)


class RMSNorm(nn.Module):
    def __init__(self, normalized_shape, eps=1e-6, elementwise_affine=True,
                 **kwargs):
        super().__init__()
        self.eps = eps
        self.weight = (nn.Parameter(torch.ones(normalized_shape))
                       if elementwise_affine else None)

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        out = (x.float() * torch.rsqrt(var + self.eps)).type_as(x)
        return out * self.weight if self.weight is not None else out

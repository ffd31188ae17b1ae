import math

import torch
import torch.nn.functional as F


def divide(numerator, denominator):
    assert numerator % denominator == 0, (numerator, denominator)
    return numerator // denominator


def sqrt(x):
    return int(math.sqrt(x) + 1e-4)


def unscaled_init_method(sigma):
    def init_(tensor):
        return torch.nn.init.normal_(tensor, mean=0.0, std=sigma)
    return init_


def scaled_init_method(sigma, num_layers):
    std = sigma / math.sqrt(2.0 * num_layers)

    def init_(tensor):
        return torch.nn.init.normal_(tensor, mean=0.0, std=std)
    return init_


def gelu(x):
    # megatron-style tanh-approx gelu (SAT default; the DiT overrides
    # activation_func with nn.GELU(approximate='tanh') anyway)
    return F.gelu(x, approximate='tanh')

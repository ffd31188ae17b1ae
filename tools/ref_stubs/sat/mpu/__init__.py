"""Single-GPU mpu: model-parallel layers == plain layers at world size 1."""

import torch
import torch.nn as nn


def get_model_parallel_world_size():
    return 1


def copy_to_model_parallel_region(x):
    return x


def gather_from_model_parallel_region(x):
    return x


def checkpoint(fn, *args):
    # activation checkpointing is forward-value-neutral; dumps run no_grad
    return fn(*args)


def _maybe_init(weight, init_method):
    if init_method is not None:
        init_method(weight)


class ColumnParallelLinear(nn.Linear):
    def __init__(self, input_size, output_size, bias=True, gather_output=True,
                 init_method=None, stride=1, keep_master_weight_for_test=False,
                 params_dtype=torch.float, module=None, name=None,
                 skip_init=False, device=None, **kwargs):
        super().__init__(input_size, output_size, bias=bias)
        _maybe_init(self.weight, init_method)
        if bias:
            nn.init.zeros_(self.bias)


class RowParallelLinear(nn.Linear):
    def __init__(self, input_size, output_size, bias=True,
                 input_is_parallel=False, init_method=None,
                 keep_master_weight_for_test=False, params_dtype=torch.float,
                 module=None, name=None, skip_init=False, device=None,
                 final_bias=True, **kwargs):
        super().__init__(input_size, output_size, bias=bias and final_bias)
        _maybe_init(self.weight, init_method)
        if self.bias is not None:
            nn.init.zeros_(self.bias)


class VocabParallelEmbedding(nn.Embedding):
    def __init__(self, num_embeddings, embedding_dim,
                 params_dtype=torch.float, skip_init=False, device=None,
                 init_method=None, **kwargs):
        super().__init__(num_embeddings, embedding_dim)
        nn.init.normal_(self.weight, mean=0.0, std=0.02)

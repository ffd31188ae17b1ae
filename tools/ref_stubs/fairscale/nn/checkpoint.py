"""checkpoint_wrapper == identity: activation checkpointing changes only the
backward-pass memory profile, never forward values — golden dumps run under
torch.no_grad so the wrapper is semantically a no-op (unet_v2v.py:1639)."""


def checkpoint_wrapper(module, *args, **kwargs):
    return module

from . import layernorm  # noqa: F401

"""beartype stub: the reference uses @beartype as a runtime type checker
(cp_enc_dec.py:8-9); a no-op decorator preserves behavior exactly."""


def beartype(fn=None, **kwargs):
    if fn is None:
        return lambda f: f
    return fn

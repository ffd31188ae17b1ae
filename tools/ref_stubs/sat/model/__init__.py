from . import base_model, mixins  # noqa: F401

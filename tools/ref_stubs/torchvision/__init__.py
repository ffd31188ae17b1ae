"""torchvision stub: embedder.py imports `torchvision.transforms as T` at
module scope but only the CLIP *image* embedder path (unused by golden dumps)
touches it."""

from . import transforms  # noqa: F401

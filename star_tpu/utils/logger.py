"""Process-aware logger (reference: video_to_video/utils/logger.py).

JAX runs one process per host; 'rank' here is jax.process_index(). Non-zero
processes log at WARNING to keep multi-host output readable.
"""

from __future__ import annotations

import logging
import sys

_FORMAT = '%(asctime)s - %(name)s - %(levelname)s - %(message)s'
_initialized = set()


def _process_index() -> int:
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


def get_logger(name: str = 'star_tpu') -> logging.Logger:
    logger = logging.getLogger(name)
    if name in _initialized:
        return logger
    _initialized.add(name)
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter(_FORMAT))
    logger.addHandler(handler)
    logger.propagate = False
    logger.setLevel(logging.INFO if _process_index() == 0 else logging.WARNING)
    return logger

"""Seeding (reference: video_to_video/utils/seed.py).

JAX randomness is explicit (threefry keys), so there is no global device RNG
to pin; this seeds the host-side generators used by data loading /
degradation sampling and returns the root jax key.
"""

from __future__ import annotations

import random

import numpy as np


def setup_seed(seed: int = 666):
    random.seed(seed)
    np.random.seed(seed)
    import jax
    return jax.random.PRNGKey(seed)

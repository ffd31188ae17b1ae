"""EMA of parameters (reference: utils_data/opensora/utils/train_utils.py:7
update_ema, decay 0.9999; also cfg.ema_decay in video_to_video config)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def init_ema(params: Any) -> Any:
    return jax.tree.map(jnp.asarray, params)


def update_ema(ema_params: Any, params: Any, decay: float = 0.9999) -> Any:
    """ema <- decay * ema + (1-decay) * params (jittable)."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params)

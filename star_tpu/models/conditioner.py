"""Conditioner registry: multiple embedders with ucg-rate dropout and
cond/uncond pair generation.

Behavioral reference: sgm GeneralConditioner
(sgm/modules/encoders/modules.py:73-233): each embedder declares an
input_key, an output key (crossattn/vector/concat by output rank) and a
ucg_rate; get_unconditional_conditioning builds the CFG pair by re-encoding
with forced unconditional inputs (empty text).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

OUTPUT_KEY_BY_RANK = {2: 'vector', 3: 'crossattn', 5: 'concat'}


@dataclasses.dataclass
class TextEmbedder:
    """tokenize+encode text into conditioning arrays."""
    input_key: str                      # batch key, e.g. 'txt'
    tokenizer: Any
    encode: Callable[[jax.Array], jax.Array]
    ucg_rate: float = 0.0

    def __call__(self, texts: Sequence[str]) -> jax.Array:
        tokens = jnp.asarray(self.tokenizer(list(texts)))
        return self.encode(tokens)


class GeneralConditioner:
    def __init__(self, embedders: Sequence[TextEmbedder], seed: int = 0):
        self.embedders = list(embedders)
        self._rng = np.random.RandomState(seed)

    def __call__(self, batch: Dict[str, Any],
                 force_uncond: bool = False) -> Dict[str, jax.Array]:
        """batch -> {output_key: embedding}; training-time ucg dropout blanks
        each sample's text with prob ucg_rate (modules.py:146-156)."""
        out: Dict[str, jax.Array] = {}
        for emb in self.embedders:
            texts = list(batch[emb.input_key])
            if force_uncond:
                texts = [''] * len(texts)
            elif emb.ucg_rate > 0:
                texts = ['' if self._rng.rand() < emb.ucg_rate else t
                         for t in texts]
            enc = emb(texts)
            key = OUTPUT_KEY_BY_RANK.get(enc.ndim, 'crossattn')
            if key in out:
                out[key] = jnp.concatenate([out[key], enc], axis=-1)
            else:
                out[key] = enc
        return out

    def get_unconditional_conditioning(
            self, batch: Dict[str, Any],
            negative_batch: Optional[Dict[str, Any]] = None
    ) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
        """(cond, uncond) pair for CFG (modules.py:211-233); uncond uses the
        negative batch when given, empty strings otherwise."""
        c = self(batch)
        if negative_batch is not None:
            uc = self(negative_batch)
        else:
            uc = self(batch, force_uncond=True)
        return c, uc

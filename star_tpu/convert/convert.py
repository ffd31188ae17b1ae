"""Apply a name map to a torch state dict -> flax param tree; orbax save/load.

Usage (offline, with the reference checkpoints available):

    import torch
    sd = torch.load('light_deg.pt', map_location='cpu')
    sd = sd.get('state_dict', sd)
    params = convert_state_dict(sd, controlled_unet_name_map())
    save_params('weights/unet', {'params': params})

(video_to_video_model.py:37-40 loads the same dict with strict=False.)
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from .unet_map import NameMap


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (cpu); avoid importing torch at module level
    return t.detach().to('cpu').float().numpy()


def nest(flat: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, val in flat.items():
        parts = path.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def convert_state_dict(state_dict: Mapping[str, Any], name_map: NameMap,
                       dtype=None, strict: bool = True) -> Dict[str, Any]:
    """-> nested param dict (no 'params' wrapper)."""
    flat: Dict[str, np.ndarray] = {}
    missing = []
    for dst, (src, fn) in name_map.items():
        if src not in state_dict:
            missing.append(src)
            continue
        arr = _to_numpy(state_dict[src])
        if fn is not None:
            arr = fn(arr)
        if dtype is not None and 'norm' not in dst and 'scale' not in dst:
            arr = arr.astype(dtype)
        flat[dst] = arr
    if missing and strict:
        raise KeyError(f'{len(missing)} parameters missing from state dict, '
                       f'first few: {missing[:5]}')
    return nest(flat)


def verify_against_init(converted: Dict[str, Any], init_params: Any,
                        prefix: str = '') -> list[str]:
    """Shape-check a converted tree against a model.init tree; returns a list
    of mismatch descriptions (empty = ok)."""
    problems = []

    def walk(c, i, path):
        if isinstance(i, Mapping):
            for k, v in i.items():
                if not isinstance(c, Mapping) or k not in c:
                    problems.append(f'missing subtree {path}/{k}')
                    continue
                walk(c[k], v, f'{path}/{k}')
        else:
            cs = tuple(np.shape(c))
            is_ = tuple(np.shape(i))
            if cs != is_:
                problems.append(f'shape mismatch {path}: {cs} vs {is_}')

    params = init_params.get('params', init_params)
    walk(converted, params, prefix)
    return problems


def save_params(path: str, params: Any) -> None:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()


def load_params(path: str) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))

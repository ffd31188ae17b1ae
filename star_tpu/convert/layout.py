"""Tensor layout conversion: torch parameter -> flax/JAX parameter.

torch conventions                 ours (channels-last flax)
  Linear   [out, in]                Dense kernel [in, out]
  Conv2d   [out, in, kh, kw]        Conv kernel [kh, kw, in, out]
  Conv3d   [out, in, kt, 1, 1]      Conv kernel [kt, 1, in, out]
  Conv1d   [out, in, 1]             Dense kernel [in, out]
  Norm weight/bias                  scale/bias (fp32)
"""

from __future__ import annotations

import numpy as np


def linear_kernel(w: np.ndarray) -> np.ndarray:
    assert w.ndim == 2
    return np.ascontiguousarray(w.T)


def conv2d_kernel(w: np.ndarray) -> np.ndarray:
    assert w.ndim == 4
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def conv3d_t11_kernel(w: np.ndarray) -> np.ndarray:
    """Conv3d with kernel (kt, 1, 1) -> our (kt, 1) conv over [B,F,HW,C]."""
    assert w.ndim == 5 and w.shape[3] == 1 and w.shape[4] == 1
    return np.ascontiguousarray(w[:, :, :, 0, 0].transpose(2, 1, 0))[:, None]


def conv1d_as_dense(w: np.ndarray) -> np.ndarray:
    assert w.ndim == 3 and w.shape[2] == 1
    return np.ascontiguousarray(w[:, :, 0].T)

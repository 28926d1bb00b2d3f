"""Sliding-window index computation and speed-outlier filtering.

Replaces the reference's host-side materialization
(data/dataset.py:198-233, 299-309): windows are *indices only* - start frame
per window, respecting per-animal id boundaries - so raw frames stay
HBM-resident and the 25x window-materialization blowup never happens
(SURVEY.md section 5, long-context row).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import Array

__all__ = ["window_starts", "window_indices", "speed_outlier_mask"]


def window_starts(ids: np.ndarray, stride: int, window: int) -> np.ndarray:
    """Start index of every length-``window`` run with constant animal id,
    strided by ``stride``. Matches reference get_window_indices
    (dataset.py:198-233) which skips segments shorter than the window."""
    ids = np.asarray(ids)
    boundaries = np.concatenate(
        [[0], np.nonzero(np.diff(ids) != 0)[0] + 1, [len(ids)]]
    )
    starts = []
    for lo, hi in zip(boundaries[:-1], boundaries[1:]):
        if hi - lo >= window:
            starts.append(np.arange(lo, hi - window + 1, stride, dtype=np.int64))
    if not starts:
        return np.zeros((0,), dtype=np.int64)
    return np.concatenate(starts)


def window_indices(starts: Array, window: int) -> Array:
    """(N,) starts -> (N, window) absolute frame indices (device-side)."""
    return starts[:, None] + jnp.arange(window, dtype=starts.dtype)[None, :]


def speed_outlier_mask(
    pose: np.ndarray, starts: np.ndarray, window: int, threshold: float = 2.25
) -> np.ndarray:
    """True for windows whose mean keypoint speed is within threshold
    (reference get_speed_outliers, dataset.py:299-309). Computed from
    per-frame displacement prefix sums - O(T) instead of O(N*W)."""
    disp = np.sqrt(((np.diff(pose, axis=0) ** 2).sum(-1))).mean(-1)  # (T-1,)
    csum = np.concatenate([[0.0], np.cumsum(disp)])
    avg = (csum[starts + window - 1] - csum[starts]) / (window - 1)
    return avg <= threshold

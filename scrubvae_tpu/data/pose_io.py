"""Pose HDF5 IO - replaces the ``neuroposelib.read.pose_h5`` slice the
reference depends on (get/data.py:32-44, data/dataset.py:348).

File format: datasets ``pose`` (T, J, 3) float and ``ids`` (T,) int. Per-key
preprocessed files mirror the reference layout ``{key}.h5`` /
``{key}_{direction_process}.h5`` with the array under its key name.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Tuple

import h5py
import numpy as np

__all__ = ["read_pose_h5", "write_pose_h5", "read_key_h5", "write_key_h5"]


def read_pose_h5(path: str | Path) -> Tuple[np.ndarray, np.ndarray]:
    with h5py.File(path, "r") as hf:
        pose = np.asarray(hf["pose"])
        ids = np.asarray(hf["ids"])
    return pose, ids


def write_pose_h5(path: str | Path, pose: np.ndarray, ids: np.ndarray) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "w") as hf:
        hf.create_dataset("pose", data=np.asarray(pose, dtype=np.float32))
        hf.create_dataset("ids", data=np.asarray(ids, dtype=np.int64))


def read_key_h5(path: str | Path, key: str) -> np.ndarray:
    with h5py.File(path, "r") as hf:
        return np.asarray(hf[key])


def write_key_h5(path: str | Path, key: str, value: np.ndarray) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "w") as hf:
        hf.create_dataset(key, data=value)


def save_split(path: str | Path, data: Dict[str, np.ndarray], direction_process: str):
    """Persist a preprocessed split in the reference's per-key file layout
    (get/data.py:33-44): windowed pose-representation keys carry the
    direction_process suffix. ``fluorescence`` is squeezed to 1-D at rest -
    the reference keeps it ``(N,)`` (get/data.py:89); internally this
    framework carries it ``(N, 1)`` (PARITY.md documented deviations)."""
    plain = {
        "ids", "heading", "avg_speed_3d", "offsets", "raw_pose",
        # metadata-derived columns have no direction_process variant
        "pd_label", "fluorescence",
    }
    for key, value in data.items():
        value = np.asarray(value)
        if key == "fluorescence" and value.ndim == 2 and value.shape[1] == 1:
            value = value[:, 0]
        name = f"{key}.h5" if key in plain else f"{key}_{direction_process}.h5"
        write_key_h5(Path(path) / name, key, value)

"""Skeleton configuration loading.

Replaces the slice of ``neuroposelib.read.config`` +
``DataStruct.Connectivity`` that the reference depends on
(/root/reference/src/scrubvae/get/data.py:23-24,
 src/scrubvae/plot/plot.py usage of Connectivity).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import List, Optional

import numpy as np
import yaml

from scrubvae_tpu.ops.kinematics import KinematicTree

__all__ = ["Skeleton", "load_skeleton", "read_yaml"]


def read_yaml(path: str | Path) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


@dataclasses.dataclass(frozen=True)
class Skeleton:
    labels: List[str]
    tree: KinematicTree
    segments: Optional[np.ndarray] = None
    keypt_colors: Optional[np.ndarray] = None
    colors: Optional[np.ndarray] = None
    # True when the yaml OFFSET entries are integers. The reference's
    # get_segment_len (dataset.py:279-296) tiles np.array(OFFSET) KEEPING
    # that integer dtype, so its scaled-offset assignment truncates toward
    # zero — and the shipped mouse_skeleton.yaml IS integer-valued, so the
    # reference's real offsets/target_pose are integer-truncated. The
    # pipeline replicates that when this flag is set (see
    # data.pipeline.build_frame_store; deviation gate data.exact_offsets).
    int_offsets: bool = False

    @property
    def n_keypts(self) -> int:
        return len(self.labels)

    @property
    def kinematic_tree(self):
        return self.tree.chains

    @property
    def offsets(self) -> np.ndarray:
        return self.tree.offsets


def load_skeleton(path: str | Path) -> Skeleton:
    cfg = read_yaml(path)
    tree = KinematicTree.build(cfg["KINEMATIC_TREE"], cfg["OFFSET"])
    # dtype the reference would see: np.array of the raw yaml lists
    # (int64 for the shipped integer-valued mouse_skeleton.yaml)
    int_offsets = np.issubdtype(np.asarray(cfg["OFFSET"]).dtype, np.integer)
    return Skeleton(
        labels=list(cfg["LABELS"]),
        tree=tree,
        segments=np.asarray(cfg.get("SEGMENTS", []), dtype=np.int32),
        keypt_colors=np.asarray(cfg.get("KEYPT_COLORS", []), dtype=np.float32),
        colors=np.asarray(cfg.get("COLORS", []), dtype=np.float32),
        int_offsets=bool(int_offsets),
    )

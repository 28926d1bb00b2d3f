"""Dataset containers and batch iteration.

Two storage modes:

* ``WindowDataset`` - materialized dict-of-arrays (reference MouseDataset
  parity, dataset.py:456-505): every sample an independent window. Used for
  eval/offline paths and h5-loaded preprocessed splits.
* ``StreamDataset`` - wraps a FrameStore; samples are window start indices
  and the window tensors are assembled on device inside the jitted step
  (the TPU-native path; no host collation, no worker processes).

``epoch_batches`` yields index arrays; there is no torch-style DataLoader -
feeding is jnp gathers from HBM-resident arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from scrubvae_tpu.data.pipeline import FrameStore, assemble_windows
from scrubvae_tpu.data.skeleton import Skeleton

__all__ = ["WindowDataset", "StreamDataset", "epoch_batches"]


@dataclasses.dataclass
class WindowDataset:
    """Materialized dataset: dict of (N, ...) arrays plus metadata."""

    data: Dict[str, Array]
    arena_size: Optional[np.ndarray]
    skeleton: Skeleton
    label: str = "train"
    discrete_classes: Optional[Dict[str, np.ndarray]] = None
    norm_params: Optional[dict] = None

    def __len__(self) -> int:
        return len(next(iter(self.data.values())))

    def __getitem__(self, idx) -> Dict[str, Array]:
        return {k: v[idx] for k, v in self.data.items()}

    @property
    def n_keypts(self) -> int:
        return self.skeleton.n_keypts

    @property
    def kinematic_tree(self):
        return self.skeleton.tree

    def batch(self, idx: Array) -> Dict[str, Array]:
        return {k: jnp.take(v, idx, axis=0) for k, v in self.data.items()}


@dataclasses.dataclass
class StreamDataset:
    """FrameStore-backed dataset; batches assemble on device.

    ``extras``: per-window (N, ...) arrays that aren't frame gathers —
    e.g. the parkinsons ``pd_label``/``fluorescence`` columns derived from
    animal metadata (reference get/data.py:74-93) — merged into every batch
    with the same index gather as the assembled windows."""

    store: FrameStore
    skeleton: Skeleton
    data_keys: Sequence[str]
    direction_process: str
    arena_size: Optional[np.ndarray]
    label: str = "train"
    discrete_classes: Optional[Dict[str, np.ndarray]] = None
    extras: Optional[Dict[str, Array]] = None

    def __len__(self) -> int:
        return self.store.n_windows

    @property
    def n_keypts(self) -> int:
        return self.skeleton.n_keypts

    @property
    def kinematic_tree(self):
        return self.skeleton.tree

    @property
    def norm_params(self):
        return self.store.norm_params

    def batch(self, idx: Array) -> Dict[str, Array]:
        """Assemble the windows whose dataset indices are ``idx``. Traceable:
        call inside jit for full fusion with the train step."""
        starts = jnp.take(self.store.starts, idx, axis=0)
        out = assemble_windows(
            self.store,
            self.skeleton.tree,
            starts,
            tuple(k for k in self.data_keys if k not in (self.extras or {})),
            self.direction_process,
        )
        for k, v in (self.extras or {}).items():
            if k in self.data_keys:
                out[k] = jnp.take(v, idx, axis=0)
        return out


def epoch_batches(
    n: int,
    batch_size: int,
    rng: Optional[np.random.Generator] = None,
    drop_last: bool = True,
) -> Iterator[np.ndarray]:
    """Yield per-batch dataset indices; shuffled when rng given. Static batch
    shapes (drop_last) so every step hits the same compiled program."""
    order = rng.permutation(n) if rng is not None else np.arange(n)
    end = (n // batch_size) * batch_size if drop_last else n
    for lo in range(0, end, batch_size):
        yield order[lo : lo + batch_size]


def epoch_index_matrix(
    n: int, batch_size: int, rng: Optional[np.random.Generator] = None
) -> np.ndarray:
    """(num_batches, batch_size) index matrix for scan-based epochs."""
    order = rng.permutation(n) if rng is not None else np.arange(n)
    nb = n // batch_size
    return order[: nb * batch_size].reshape(nb, batch_size)

"""Device-mesh data parallelism.

The reference is strictly single-device (SURVEY.md 2.2); here the train step
is a single SPMD program over a 1-D ``data`` mesh: batches (or window index
vectors) are sharded along the mesh, train state is replicated, and XLA
inserts the gradient/metric/moment all-reduces over ICI automatically under
jit. Streaming-scrubber updates stay bitwise identical across replicas
because their batch moments (x^T x, class means/covs) are computed on the
globally-sharded batch (a psum under the hood).

Scaling beyond DP (TP/PP) is intentionally absent: the model is ~10-60M
params (SURVEY.md 2.2 rows TP/PP - "not needed").
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "data_sharding"]


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Shard every leaf's leading (batch) axis across the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (train state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

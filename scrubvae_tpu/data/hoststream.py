"""Host-resident frame store with double-buffered device streaming.

The default data path keeps the whole per-frame store in HBM
(``data/pipeline.py``) — the right call whenever it fits (a day-scale pose
recording is a few GB). For corpora larger than device memory, this module
streams instead: the frame store stays in host RAM, and for each training
batch a background thread gathers exactly the frames the batch's windows
touch (a *slab*), ships it to the device asynchronously, and the jitted
step runs the identical per-window assembly on the slab.

Design (TPU-native input pipeline, replacing the reference's 5-worker torch
DataLoader over materialized windows, reference train/trainer.py:102-129):

* The slab is laid out window-major — row ``i*W + w`` holds frame
  ``starts[i] + w`` — so ``assemble_windows`` runs UNCHANGED on a slab-backed
  ``FrameStore`` whose start indices are ``arange(B) * W``: same math,
  bit-identical outputs to the device-resident path (tested,
  tests/test_hoststream.py).
* ``prefetch_to_device`` overlaps the host gather + H2D copy of batch t+1
  with the device compute of batch t (queue depth 2 = double buffering);
  ``jax.device_put`` dispatches the copy asynchronously.
* Per-window ``extras`` (recoded ids, metadata columns) ride in the slab
  under ``extra_*`` keys, mirroring ``StreamDataset.batch``.

Enable with ``data.host_stream: true`` (train split; validation splits are
typically subsampled and stay device-resident). Under a mesh the slab is
replicated in this version — host streaming targets the capacity axis, not
the throughput axis.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Dict, Iterable, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from scrubvae_tpu.data.pipeline import FrameStore, assemble_windows
from scrubvae_tpu.data.skeleton import Skeleton

__all__ = ["HostStreamDataset", "host_store", "prefetch_to_device"]

# FrameStore fields gathered per frame into the slab (x6d/tpose only when
# the store carries the precomputes).
_FRAME_FIELDS = ("pose", "local_quat", "offsets", "yaw", "ids", "x6d", "tpose")


def host_store(store: FrameStore) -> FrameStore:
    """Move every array leaf of a FrameStore to host numpy (the streaming
    residency; ``build_frame_store`` computes on device for speed)."""

    def to_np(v):
        return None if v is None else np.asarray(jax.device_get(v))

    return dataclasses.replace(
        store,
        pose=to_np(store.pose),
        local_quat=to_np(store.local_quat),
        offsets=to_np(store.offsets),
        yaw=to_np(store.yaw),
        ids=to_np(store.ids),
        starts=to_np(store.starts),
        mid_ids=to_np(store.mid_ids),
        norm_params=jax.tree.map(to_np, store.norm_params),
        x6d=to_np(store.x6d),
        tpose=to_np(store.tpose),
    )


@dataclasses.dataclass
class HostStreamDataset:
    """StreamDataset twin whose FrameStore lives in host RAM.

    ``host_batch`` produces the numpy slab (cheap, runs on a prefetch
    thread); ``make_batch_fn`` returns the traceable slab -> data-dict
    assembler installed as the train step's ``batch_fn``. ``batch`` (eager,
    device) exists for init/dummy use and API parity."""

    store: FrameStore  # numpy leaves (host_store)
    skeleton: Skeleton
    data_keys: Sequence[str]
    direction_process: str
    arena_size: Optional[np.ndarray]
    label: str = "train"
    discrete_classes: Optional[Dict[str, np.ndarray]] = None
    extras: Optional[Dict[str, np.ndarray]] = None  # per-window host arrays

    def __len__(self) -> int:
        return int(self.store.starts.shape[0])

    @classmethod
    def from_stream(cls, ds) -> "HostStreamDataset":
        """Convert a (device-resident) StreamDataset: same metadata, store
        and extras moved to host RAM."""
        return cls(
            store=host_store(ds.store),
            skeleton=ds.skeleton,
            data_keys=tuple(ds.data_keys),
            direction_process=ds.direction_process,
            arena_size=ds.arena_size,
            label=ds.label,
            discrete_classes=ds.discrete_classes,
            extras={
                k: np.asarray(jax.device_get(v))
                for k, v in (ds.extras or {}).items()
            },
        )

    @property
    def n_keypts(self) -> int:
        return self.skeleton.n_keypts

    @property
    def kinematic_tree(self):
        return self.skeleton.tree

    @property
    def norm_params(self):
        return self.store.norm_params

    # -- host side ---------------------------------------------------------

    def host_batch(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        """Gather the slab for the windows whose dataset indices are ``idx``:
        frame-shaped fields flattened window-major to (B*W, ...), extras
        gathered per window. Pure numpy — runs on the prefetch thread."""
        idx = np.asarray(idx)
        W = int(self.store.window)
        starts = np.asarray(self.store.starts)[idx]  # (B,)
        fidx = (starts[:, None] + np.arange(W, dtype=starts.dtype)).reshape(-1)
        slab = {}
        for name in _FRAME_FIELDS:
            arr = getattr(self.store, name)
            if arr is not None:
                slab[name] = arr[fidx]
        for k, v in (self.extras or {}).items():
            if k in self.data_keys:
                slab["extra_" + k] = np.asarray(v)[idx]
        return slab

    def epoch_slabs(
        self, batches: Iterable[np.ndarray]
    ) -> Iterator[Dict[str, np.ndarray]]:
        for idx in batches:
            yield self.host_batch(idx)

    # -- device side -------------------------------------------------------

    def make_batch_fn(self):
        """Traceable slab -> data-dict assembler (the step's ``batch_fn``):
        rebuilds a slab-backed FrameStore with starts ``arange(B)*W`` and
        runs the shared per-window stage — identical math to the
        device-resident path."""
        W = int(self.store.window)
        tree = self.skeleton.tree
        norm_params = jax.tree.map(jnp.asarray, self.store.norm_params)
        extra_keys = tuple(
            k for k in (self.extras or {}) if k in self.data_keys
        )
        assemble_keys = tuple(
            k for k in self.data_keys if k not in extra_keys
        )
        dp = self.direction_process

        def fn(slab: Dict[str, Array]) -> Dict[str, Array]:
            B = slab["yaw"].shape[0] // W
            starts = jnp.arange(B, dtype=jnp.int32) * W
            store = FrameStore(
                pose=slab["pose"],
                local_quat=slab["local_quat"],
                offsets=slab["offsets"],
                yaw=slab["yaw"],
                ids=slab["ids"],
                starts=starts,
                window=W,
                mid_ids=jnp.take(slab["ids"], starts + W // 2, axis=0),
                norm_params=norm_params,
                x6d=slab.get("x6d"),
                tpose=slab.get("tpose"),
            )
            out = assemble_windows(store, tree, starts, assemble_keys, dp)
            for k in extra_keys:
                out[k] = slab["extra_" + k]
            return out

        return fn

    def batch(self, idx) -> Dict[str, Array]:
        """Eager device assembly of ``idx`` (init/dummy/API-parity path)."""
        slab = self.host_batch(np.asarray(idx))
        return self.make_batch_fn()(
            {k: jnp.asarray(v) for k, v in slab.items()}
        )


def prefetch_to_device(
    items: Iterable, size: int = 2, sharding=None
) -> Iterator:
    """Iterate ``items`` (pytrees of host arrays) with a background thread
    that stages up to ``size`` of them on device ahead of the consumer —
    the H2D copy of batch t+1 overlaps the device compute of batch t.
    Exceptions on the worker re-raise at the consuming site."""
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def put(x):
        return jax.device_put(x, sharding) if sharding is not None else jax.device_put(x)

    def worker():
        try:
            for item in items:
                q.put(jax.tree.map(put, item))
        except BaseException as e:  # surfaced on the consumer side
            q.put(e)
            return
        q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        got = q.get()
        if got is _END:
            return
        if isinstance(got, BaseException):
            raise got
        yield got

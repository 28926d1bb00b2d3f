"""Checkpoint / resume.

Directory-layout parity with the reference (weights/epoch_E + checkpoints/
epoch_E + latents/, params/read.py:34-36, trainer.py:388-399): model weights
every save interval, full optimizer/scrubber/rng state at the coarser
interval. Serialization is flax msgpack (host-independent, works for any
pytree of arrays).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import flax.serialization
import jax

__all__ = [
    "save_weights",
    "load_weights",
    "save_train_state",
    "load_train_state",
]


def _to_host(tree):
    return jax.tree.map(lambda x: jax.device_get(x), tree)


def save_weights(out_path: str, epoch: int, params, batch_stats=None) -> str:
    path = Path(out_path) / "weights" / f"epoch_{epoch}.msgpack"
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {"params": _to_host(params)}
    if batch_stats is not None:
        payload["batch_stats"] = _to_host(batch_stats)
    path.write_bytes(flax.serialization.to_bytes(payload))
    return str(path)


def load_weights(
    load_path: str, epoch: int, params_template, batch_stats_template=None
):
    """Load ``weights/epoch_E.msgpack`` (native), falling back to
    ``weights/epoch_E.pth`` — a reference-trained torch checkpoint
    (reference trainer.py:388-393) — via the layout-mapping importer, so a
    config's ``model.load_model`` can point at a reference run directly."""
    path = Path(load_path) / "weights" / f"epoch_{epoch}.msgpack"
    template = {"params": params_template}
    if batch_stats_template is not None:
        template["batch_stats"] = batch_stats_template
    if not path.exists():
        pth = Path(load_path) / "weights" / f"epoch_{epoch}.pth"
        if pth.exists():
            from scrubvae_tpu.utils.torch_import import import_torch_weights

            restored = import_torch_weights(pth, template)
            return restored.get("params"), restored.get("batch_stats")
    restored = flax.serialization.from_bytes(template, path.read_bytes())
    return restored.get("params"), restored.get("batch_stats")


def save_train_state(out_path: str, epoch: int, state: Any) -> str:
    path = Path(out_path) / "checkpoints" / f"epoch_{epoch}.msgpack"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(flax.serialization.to_bytes(_to_host(state)))
    return str(path)


def load_train_state(load_path: str, epoch: int, state_template: Any) -> Optional[Any]:
    path = Path(load_path) / "checkpoints" / f"epoch_{epoch}.msgpack"
    if not path.exists():
        return None
    return flax.serialization.from_bytes(state_template, path.read_bytes())

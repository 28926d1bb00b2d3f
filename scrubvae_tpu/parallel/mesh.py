"""Device-mesh parallelism (data parallel + opt-in head tensor parallel).

The reference is strictly single-device (SURVEY.md 2.2); here the train step
is a single SPMD program over a ``jax.sharding`` mesh: batches (or window
index vectors) are sharded along the ``data`` axis, train state is replicated,
and XLA inserts the gradient/metric/moment all-reduces over ICI automatically
under jit. Streaming-scrubber updates stay bitwise identical across replicas
because their batch moments (x^T x, class means/covs) are computed on the
globally-sharded batch (a psum under the hood).

Generic TP/PP is intentionally absent — the model is ~10-60M params
(SURVEY.md 2.2 rows TP/PP, "not needed") — with ONE targeted exception: the
``fc_sigma`` Cholesky head holds ~75% of all parameters (z=128 →
4096×8256), so its kernel concentrates the per-chip optimizer traffic and
the cross-chip gradient all-reduce. An optional ``model`` mesh axis
column-shards exactly that head (``TP_RULES``): the forward activation
(B, K) shards on K, the packed-Cholesky reductions (matvec/diag/sumsq,
models/layers.py packed_*) partition over K with automatic psums, and the
head's gradient/optimizer state stay shard-local — GSPMD derives all of it
from the one kernel annotation. Enable via ``train.mesh:
{data: N, model: M}``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_sharding",
    "data_axis_size",
    "param_specs",
    "tp_mask",
    "place_state",
    "TP_RULES",
]


def make_mesh(n_devices=None, axis: str = "data") -> Mesh:
    """1-D data mesh from an int/None, or a 2-D (data, model) mesh from a
    ``{"data": N, "model": M}`` dict (model size 1/absent collapses to 1-D).
    ``None``/-1 sizes mean "all remaining visible devices"."""
    devices = jax.devices()
    if isinstance(n_devices, dict):
        model = int(n_devices.get("model") or 1)
        data = n_devices.get("data")
        data = None if data in (None, -1) else int(data)
        if model > 1:
            if data is None:
                data = len(devices) // model
            n = data * model
            if n > len(devices):
                raise ValueError(
                    f"mesh {{data: {data}, model: {model}}} needs {n} devices, "
                    f"{len(devices)} visible"
                )
            return Mesh(
                np.asarray(devices[:n]).reshape(data, model), ("data", "model")
            )
        n_devices = data
    if n_devices is not None:
        devices = devices[: int(n_devices)]
    return Mesh(np.asarray(devices), (axis,))


def data_axis_size(mesh: Mesh) -> int:
    return mesh.shape.get("data", mesh.devices.size)


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


# Tensor-parallel placement rules: (flax param-path suffix, PartitionSpec).
# Column-shard the sigma head (both the dense and the low-rank factored
# variants). Everything else stays replicated — at this model scale the
# other leaves are a rounding error next to fc_sigma (SURVEY 2.2).
TP_RULES = (
    ("fc_sigma/kernel", P(None, "model")),
    ("fc_sigma/bias", P("model")),
    ("fc_sigma_v/kernel", P(None, "model")),
    ("fc_sigma_v/bias", P("model")),
)


def _spec_for(path: str, rules) -> P:
    for suffix, spec in rules:
        if path.endswith(suffix):
            return spec
    return P()


def _flat_specs(params, mesh: Mesh, rules):
    """{"a/b/kernel": PartitionSpec} for a (nested-dict) param tree.
    PartitionSpec is a tuple subclass, so spec trees are kept as flat dicts
    rather than pytrees (jax.tree would descend into the specs)."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params, sep="/")
    if "model" not in mesh.shape or mesh.shape["model"] <= 1:
        return {p: P() for p in flat}
    return {p: _spec_for(p, rules) for p in flat}


def param_specs(params, mesh: Mesh, rules=TP_RULES):
    """Nested dict of PartitionSpec mirroring ``params`` (TP_RULES matched
    by path suffix; everything else — and every leaf when the mesh has no
    ``model`` axis — replicated)."""
    import flax.traverse_util as tu

    return tu.unflatten_dict(_flat_specs(params, mesh, rules), sep="/")


def tp_mask(params, mesh: Mesh, rules=TP_RULES):
    """Bool pytree (same treedef as params): True where the leaf is
    TP-sharded — the fused optimizer routes those leaves through the
    plain-XLA elementwise path, which GSPMD partitions shard-locally (a
    Pallas custom call would force an all-gather instead)."""
    import flax.traverse_util as tu

    specs = _flat_specs(params, mesh, rules)
    return tu.unflatten_dict(
        {p: len(s) > 0 for p, s in specs.items()}, sep="/"
    )


def _put_with_specs(tree, mesh: Mesh, rules):
    import flax.traverse_util as tu

    specs = _flat_specs(tree, mesh, rules)
    flat = tu.flatten_dict(tree, sep="/")
    out = {
        p: jax.device_put(v, NamedSharding(mesh, specs[p]))
        for p, v in flat.items()
    }
    return tu.unflatten_dict(out, sep="/")


def place_state(state, mesh: Mesh, rules=TP_RULES):
    """Place a TrainState on the mesh: params (and the optimizer moments,
    which mirror the param tree) follow ``param_specs``; everything else is
    replicated."""
    placed = replicate(state, mesh)
    placed = placed.replace(params=_put_with_specs(state.params, mesh, rules))
    opt = state.opt_state
    if hasattr(opt, "mu") and hasattr(opt, "nu"):
        placed = placed.replace(
            opt_state=opt._replace(
                mu=_put_with_specs(opt.mu, mesh, rules),
                nu=_put_with_specs(opt.nu, mesh, rules),
            )
        )
    return placed

"""Latent extraction with npy caching
(/root/reference/src/scrubvae/get/eval.py:8-70): encode the full dataset in
batches, cache to latents/{split}_{epoch}.npy, report active dims.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["latents", "encode_dataset"]


def encode_dataset(model, variables, dataset, batch_size: int = 512) -> np.ndarray:
    """Jitted batched encoding of every sample's mu.

    Uses the encoders' ``mu_only`` fast path (the Cholesky head - 25% of
    encoder FLOPs at the flagship point - never runs; eval-mode z is mu,
    reference get/eval.py:62-66).

    The jitted closure is cached on the dataset (keyed by model identity
    and batch size) and takes ``variables`` as an argument, so repeated
    calls - the per-saved-epoch extraction loop of the epoch_metric
    harness (reference eval/metrics.py:23-88) - reuse the compiled
    executable instead of paying two encoder compiles per call.

    The dataset's arrays are baked into the trace as constants, so the
    cache assumes the dataset is IMMUTABLE after construction (true for
    every dataset class in this package - batch() reads frozen device
    arrays). If arrays were ever mutated in place, cached calls would
    silently encode the stale data; delete ``dataset._enc_cache`` after
    any such mutation."""
    # structural (dataclass) equality, not identity: the per-epoch
    # extraction loop rebuilds an identical module object each call
    cache = getattr(dataset, "_enc_cache", None)
    if cache is None or cache[0] != model or cache[1] != batch_size:

        @jax.jit
        def enc(variables, idx):
            data = dataset.batch(idx)
            out = model.apply(
                variables, data, train=False, method=model.encode, mu_only=True
            )
            return out["mu"]

        cache = (model, batch_size, enc)
        dataset._enc_cache = cache
    enc = cache[2]

    n = len(dataset)
    zs = []
    for lo in range(0, n, batch_size):
        idx = jnp.arange(lo, min(lo + batch_size, n))
        zs.append(np.asarray(enc(variables, idx)))
    return np.concatenate(zs, axis=0)


def latents(
    config: dict,
    model=None,
    variables=None,
    epoch: Optional[int] = None,
    dataset=None,
    label: str = "test",
    overwrite: bool = False,
    batch_size: int = 512,
) -> np.ndarray:
    path = Path(config["out_path"]) / "latents" / f"{label}_{epoch}.npy"
    if path.exists() and not overwrite:
        z = np.load(path)
        if dataset is not None:
            assert z.shape[0] == len(dataset)
    else:
        if model is None or variables is None:
            from scrubvae_tpu import factory
            from scrubvae_tpu.utils import checkpoint as ckpt

            model, info = factory.build_model(
                config["model"],
                config["disentangle"],
                n_keypts=dataset.n_keypts,
                direction_process=config["data"].get("direction_process"),
                arena_size=dataset.arena_size,
                discrete_classes=dataset.discrete_classes,
            )
            dummy = dataset.batch(jnp.arange(2))
            init_rng = jax.random.PRNGKey(0)
            template = model.init(
                {"params": init_rng, "dropout": init_rng},
                dummy,
                rng=init_rng,
                train=True,
            )
            load_path = config["model"].get("load_model") or config["out_path"]
            params, batch_stats = ckpt.load_weights(
                load_path,
                epoch,
                template["params"],
                template.get("batch_stats"),
            )
            variables = {"params": params}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats
        z = encode_dataset(model, variables, dataset, batch_size)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.save(path, z)

    nonzero = int((z.std(axis=0) > 0.1).sum())
    print(f"Latent dims with std > 0.1 over dataset: {nonzero}")
    return z

"""scrubvae_tpu: TPU-native framework for scrubbed conditional VAE modeling
of 3D pose sequences (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the capabilities of tdunnlab/scrubvae
(/root/reference) for TPU: functional pytree models, one fused jitted train
step, data-parallel sharding over a device mesh, device-resident windowed
data pipeline, and streaming scrubber state threaded explicitly through the
training step.
"""

__version__ = "0.1.0"

# Reference-shaped public surface (reference src/scrubvae/__init__.py:1-6
# exposes eval/data/model/params/plt/train; its `get` module is our
# `factory`). Imported eagerly so `import scrubvae_tpu as scrubvae;
# scrubvae.get.data_and_model(...)` / `scrubvae.train.train(...)` work as
# drop-in equivalents of the reference calls.
from scrubvae_tpu import data, models as model, ops, parallel, params, train, utils  # noqa: E402,F401
from scrubvae_tpu import evals  # noqa: E402
from scrubvae_tpu import factory as get  # noqa: E402,F401
from scrubvae_tpu import plot as plt  # noqa: E402,F401

eval = evals  # reference name (its subpackage is `eval`)  # noqa: A001

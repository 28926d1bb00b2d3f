"""scrubvae_tpu: TPU-native framework for scrubbed conditional VAE modeling
of 3D pose sequences (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the capabilities of tdunnlab/scrubvae
(/root/reference) for TPU: functional pytree models, one fused jitted train
step, data-parallel sharding over a device mesh, device-resident windowed
data pipeline, and streaming scrubber state threaded explicitly through the
training step.
"""

__version__ = "0.1.0"

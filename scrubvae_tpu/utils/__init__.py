from scrubvae_tpu.utils import checkpoint, logging  # noqa: F401

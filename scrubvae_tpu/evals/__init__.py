from scrubvae_tpu.evals import cluster, latents, metrics, restrictiveness  # noqa: F401
from scrubvae_tpu.evals.restrictiveness import (  # noqa: F401
    generative_restrictiveness_batch,
)

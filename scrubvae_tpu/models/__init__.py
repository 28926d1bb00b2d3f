from scrubvae_tpu.models import layers, mi  # noqa: F401
from scrubvae_tpu.models import scrubbers  # noqa: F401
from scrubvae_tpu.models.mlp_vae import MLPVAE  # noqa: F401
from scrubvae_tpu.models.residual import ResVAE  # noqa: F401
from scrubvae_tpu.models.transformer import TransformerVAE  # noqa: F401

from scrubvae_tpu.params.param_keys import PARAM_KEYS  # noqa: F401
from scrubvae_tpu.params import read  # noqa: F401

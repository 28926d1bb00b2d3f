from scrubvae_tpu.train import losses, optim, state, step  # noqa: F401
from scrubvae_tpu.train.trainer import Trainer, train  # noqa: F401

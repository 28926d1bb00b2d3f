"""Top-level model assembly: core VAE + trainable scrubber heads.

Mirrors the reference's composition (VAE.forward, residual.py:318-362):
encode -> reparameterize -> decode -> per-feature scrubber passes, where the
linear null-space projection (when present) supplies ``z_null`` as the input
latent for every other scrubber. Trainable scrubber parameters (linear
projections, gradient-reversal ensembles) live in this module's tree so the
single outer optimizer covers them, exactly like the reference's
``model.parameters()``. Streaming-statistics scrubbers and the adversarial
discriminator are *not* submodules - they are explicit state threaded
through the train step (models.scrubbers).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import flax.linen as nn
from jax import Array

from scrubvae_tpu.models.scrubbers import GRScrubber, LinearProjection

__all__ = ["ScrubVAE"]


class ScrubVAE(nn.Module):
    vae: nn.Module
    linear_dims: Mapping[str, int] = None  # feat -> out_dim
    gr_dims: Mapping[str, int] = None  # feat -> out_dim
    gr_alpha: float = 1.0

    def setup(self):
        lin = dict(self.linear_dims or {})
        gr = dict(self.gr_dims or {})
        self.linear = {k: LinearProjection(d, name=f"linear_{k}") for k, d in lin.items()}
        self.grad_reversal = {
            k: GRScrubber(d, alpha=self.gr_alpha, name=f"gr_{k}") for k, d in gr.items()
        }

    def encode(
        self, data: Dict[str, Array], train: bool = True, mu_only: bool = False
    ):
        return self.vae.encode(data, train=train, mu_only=mu_only)

    def decode(self, z: Array, data: Dict[str, Array], train: bool = True):
        return self.vae.decode(z, data, train=train)

    def latent_for(self, out: Dict, key: str) -> Array:
        if self.linear and key in self.linear:
            return out["disentangle"]["linear"][key]["z_null"]
        return out["mu"]

    def __call__(
        self,
        data: Dict[str, Array],
        rng: Optional[Array] = None,
        train: bool = True,
        mu_only: bool = False,
    ) -> Dict[str, Array]:
        out = self.vae(data, rng=rng, train=train, mu_only=mu_only)
        dis: Dict[str, Dict] = {}
        if self.linear:
            dis["linear"] = {k: m(out["mu"]) for k, m in self.linear.items()}
        out["disentangle"] = dis
        if self.grad_reversal:
            dis["grad_reversal"] = {}
            for k, m in self.grad_reversal.items():
                latent = (
                    dis["linear"][k]["z_null"]
                    if self.linear and k in self.linear
                    else out["mu"]
                )
                dis["grad_reversal"][k] = m(latent)
        return out

"""Minimal MLP encoder/decoder VAE - the BASELINE.json config-1 model
("Vanilla VAE, MLP enc/dec, CPU-runnable"), sharing the ResVAE data
interface (x6d/root dicts, arena normalization, conditional decode) so the
whole train/eval stack is model-agnostic.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from scrubvae_tpu.models.layers import CholeskyL
from scrubvae_tpu.ops.kinematics import inv_normalize_root, normalize_root

__all__ = ["MLPVAE"]


class MLPVAE(nn.Module):
    in_channels: int  # features per frame
    window: int = 51
    z_dim: int = 32
    hidden: Sequence[int] = (512, 256)
    is_diag: bool = True
    conditional_dim: int = 0
    prior: str = "gaussian"
    arena_size: Optional[tuple] = None
    conditional_keys: Sequence[str] = ()
    discrete_classes: Optional[Dict[str, int]] = None

    def _arena(self, dtype):
        return jnp.asarray(self.arena_size, dtype=dtype)

    def setup(self):
        # Layers live in setup() (not inline in compact methods) so
        # ``apply(method=model.encode)`` works - the MI-estimator refresh and
        # latent extraction call encode directly.
        self.enc_layers = [
            nn.Dense(w, name=f"enc_{i}") for i, w in enumerate(self.hidden)
        ]
        self.fc_mu = nn.Dense(self.z_dim, name="fc_mu")
        sig_dim = self.z_dim if self.is_diag else self.z_dim * (self.z_dim + 1) // 2
        self.fc_sigma = nn.Dense(sig_dim, name="fc_sigma")
        self.cholesky = CholeskyL(self.z_dim, self.is_diag)
        self.dec_layers = [
            nn.Dense(w, name=f"dec_{i}")
            for i, w in enumerate(reversed(list(self.hidden)))
        ]
        self.dec_out = nn.Dense(self.window * self.in_channels, name="dec_out")

    def __call__(self, data, rng=None, train: bool = True, mu_only: bool = False):
        out = self.encode(data, train=train, mu_only=mu_only)
        if train and rng is not None and not mu_only:
            eps = jax.random.normal(rng, out["mu"].shape, dtype=out["mu"].dtype)
            z = out["mu"] + jnp.einsum("bij,bj->bi", out["L"], eps)
        else:
            z = out["mu"]
        out["z"] = z
        out.update(self.decode(z, data, train=train))
        return out

    def encode(self, data, train: bool = True, mu_only: bool = False):
        x6d = data["x6d"]
        B, W = x6d.shape[0], x6d.shape[1]
        flat = x6d.reshape(B, W, -1)
        if self.arena_size is not None:
            norm_root = normalize_root(data["root"], self._arena(x6d.dtype))
            x_in = jnp.concatenate([flat, norm_root], axis=-1)
        else:
            x_in = flat
        h = x_in.reshape(B, -1)
        for layer in self.enc_layers:
            h = nn.relu(layer(h))
        mu = self.fc_mu(h)
        if mu_only:
            return {"mu": mu}
        L = self.cholesky(self.fc_sigma(h))
        return {"mu": mu, "L": L}

    def build_conditionals(self, data):
        if self.conditional_dim <= 0:
            return None
        parts = []
        discrete = self.discrete_classes or {}
        for k in self.conditional_keys:
            v = data[k]
            if k in discrete:
                parts.append(
                    jax.nn.one_hot(v.reshape(-1).astype(jnp.int32), discrete[k])
                )
            else:
                parts.append(v)
        return jnp.concatenate(parts, axis=-1)

    def decode(self, z, data, train: bool = True):
        out = {}
        var = self.build_conditionals(data)
        if var is not None:
            out["var"] = var
            z = jnp.concatenate([z, var], axis=-1)
        B = z.shape[0]
        h = z
        for layer in self.dec_layers:
            h = nn.relu(layer(h))
        h = self.dec_out(h)
        x_hat = jnp.tanh(h).reshape(B, self.window, self.in_channels)
        if self.arena_size is not None:
            out["root"] = inv_normalize_root(x_hat[..., -3:], self._arena(x_hat.dtype))
            x6d = x_hat[..., :-3]
        else:
            x6d = x_hat
        out["x6d"] = x6d.reshape(B, self.window, -1, 6)
        return out

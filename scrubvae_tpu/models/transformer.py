"""Transformer VAE variant in flax.linen.

Capability parity with the reference TransformerVAE
(/root/reference/src/scrubvae/model/transformer.py:29-167): sinusoidal
positional encoding, pre-softmax pose embedding, encoder stack -> flatten ->
(mu, CholeskyL); decoder cross-attends zero-queries + positions against the
latent as a single memory token. Built on flax MultiHeadDotProductAttention
(MXU-friendly fused attention) instead of torch nn.Transformer.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from scrubvae_tpu.models.layers import CholeskyL

__all__ = ["TransformerVAE", "TransformerEncoder", "TransformerDecoder"]


def sinusoidal_positions(length: int, d_model: int) -> np.ndarray:
    pos = np.arange(length)[:, None].astype(np.float32)
    div = np.exp(np.arange(0, d_model, 2).astype(np.float32) * (-np.log(1e4) / d_model))
    pe = np.zeros((length, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class EncoderLayer(nn.Module):
    n_heads: int = 4
    ff_size: int = 512
    dropout: float = 0.1
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        d = x.shape[-1]
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, deterministic=not train, dropout_rate=self.dropout
        )(x, x)
        x = nn.LayerNorm()(x + nn.Dropout(self.dropout, deterministic=not train)(attn))
        act = nn.gelu if self.activation == "gelu" else nn.relu
        h = nn.Dense(self.ff_size)(x)
        h = nn.Dense(d)(act(h))
        return nn.LayerNorm()(x + nn.Dropout(self.dropout, deterministic=not train)(h))


class DecoderLayer(nn.Module):
    n_heads: int = 4
    ff_size: int = 512
    dropout: float = 0.1
    activation: str = "gelu"

    @nn.compact
    def __call__(self, tgt: Array, memory: Array, train: bool = True) -> Array:
        d = tgt.shape[-1]
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, deterministic=not train, dropout_rate=self.dropout
        )(tgt, tgt)
        tgt = nn.LayerNorm()(tgt + nn.Dropout(self.dropout, deterministic=not train)(sa))
        ca = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, deterministic=not train, dropout_rate=self.dropout
        )(tgt, memory)
        tgt = nn.LayerNorm()(tgt + nn.Dropout(self.dropout, deterministic=not train)(ca))
        act = nn.gelu if self.activation == "gelu" else nn.relu
        h = nn.Dense(self.ff_size)(tgt)
        h = nn.Dense(d)(act(h))
        return nn.LayerNorm()(
            tgt + nn.Dropout(self.dropout, deterministic=not train)(h)
        )


class TransformerEncoder(nn.Module):
    z_dim: int = 128
    window: int = 51
    activation: str = "gelu"
    n_heads: int = 4
    ff_size: int = 512
    n_layers: int = 4
    is_diag: bool = False
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Array, train: bool = True):
        # x: (B, W, C_in)
        h = nn.Dense(self.z_dim, name="pose_embedding")(x)
        pe = jnp.asarray(sinusoidal_positions(self.window, self.z_dim))
        h = h + pe[None, : h.shape[1]]
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        for _ in range(self.n_layers):
            h = EncoderLayer(self.n_heads, self.ff_size, self.dropout, self.activation)(
                h, train=train
            )
        flat = h.reshape(h.shape[0], -1)
        mu = nn.Dense(self.z_dim, name="fc_mu")(flat)
        sig_dim = self.z_dim if self.is_diag else self.z_dim * (self.z_dim + 1) // 2
        L = CholeskyL(self.z_dim, self.is_diag)(nn.Dense(sig_dim, name="fc_sigma")(flat))
        return mu, L


class TransformerDecoder(nn.Module):
    out_channels: int
    z_dim: int = 128
    window: int = 51
    activation: str = "gelu"
    n_heads: int = 4
    ff_size: int = 512
    n_layers: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, z: Array, train: bool = True) -> Array:
        B = z.shape[0]
        pe = jnp.asarray(sinusoidal_positions(self.window, self.z_dim))
        tgt = jnp.broadcast_to(pe[None], (B, self.window, self.z_dim))
        tgt = nn.Dropout(self.dropout, deterministic=not train)(tgt)
        memory = z[:, None, :]
        for _ in range(self.n_layers):
            tgt = DecoderLayer(
                self.n_heads, self.ff_size, self.dropout, self.activation
            )(tgt, memory, train=train)
        return jnp.tanh(nn.Dense(self.out_channels, name="fc_out")(tgt))


class TransformerVAE(nn.Module):
    in_channels: int
    z_dim: int = 128
    window: int = 51
    activation: str = "gelu"
    n_heads: int = 4
    ff_size: int = 512
    n_layers: int = 4
    is_diag: bool = False

    def setup(self):
        self.encoder = TransformerEncoder(
            z_dim=self.z_dim,
            window=self.window,
            activation=self.activation,
            n_heads=self.n_heads,
            ff_size=self.ff_size,
            n_layers=self.n_layers,
            is_diag=self.is_diag,
        )
        self.decoder = TransformerDecoder(
            out_channels=self.in_channels,
            z_dim=self.z_dim,
            window=self.window,
            activation=self.activation,
            n_heads=self.n_heads,
            ff_size=self.ff_size,
            n_layers=self.n_layers,
        )

    def __call__(self, x: Array, rng: Optional[Array] = None, train: bool = True):
        mu, L = self.encoder(x, train=train)
        if train and rng is not None:
            eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
            z = mu + jnp.einsum("bij,bj->bi", L, eps)
        else:
            z = mu
        x_hat = self.decoder(z, train=train)
        return x_hat, mu, L

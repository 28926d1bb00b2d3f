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


def _act(name: str):
    # torch nn.TransformerEncoderLayer(activation="gelu") applies the EXACT
    # erf gelu (F.gelu default); flax nn.gelu defaults to the tanh
    # approximation — use the exact form for parity.
    if name == "gelu":
        return lambda v: nn.gelu(v, approximate=False)
    return nn.relu


# torch LayerNorm default eps (flax defaults to 1e-6)
_LN_EPS = 1e-5


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
        x = nn.LayerNorm(epsilon=_LN_EPS)(
            x + nn.Dropout(self.dropout, deterministic=not train)(attn)
        )
        act = _act(self.activation)
        h = nn.Dense(self.ff_size)(x)
        h = nn.Dense(d)(act(h))
        return nn.LayerNorm(epsilon=_LN_EPS)(
            x + nn.Dropout(self.dropout, deterministic=not train)(h)
        )


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
        tgt = nn.LayerNorm(epsilon=_LN_EPS)(
            tgt + nn.Dropout(self.dropout, deterministic=not train)(sa)
        )
        ca = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, deterministic=not train, dropout_rate=self.dropout
        )(tgt, memory)
        tgt = nn.LayerNorm(epsilon=_LN_EPS)(
            tgt + nn.Dropout(self.dropout, deterministic=not train)(ca)
        )
        act = _act(self.activation)
        h = nn.Dense(self.ff_size)(tgt)
        h = nn.Dense(d)(act(h))
        return nn.LayerNorm(epsilon=_LN_EPS)(
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
    def __call__(self, x: Array, train: bool = True, mu_only: bool = False):
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
        if mu_only:
            return mu, None
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
    """Transformer VAE with the shared data-dict interface (same contract as
    ResVAE / MLPVAE: encode/decode over ``{"x6d","root",feat...}`` with arena
    normalization and conditional decoding), so the whole train/eval/scrubber
    stack is model-agnostic. Reference capability:
    /root/reference/src/scrubvae/model/transformer.py:120-167."""

    in_channels: int
    z_dim: int = 128
    window: int = 51
    activation: str = "gelu"
    n_heads: int = 4
    ff_size: int = 512
    n_layers: int = 4
    is_diag: bool = False
    conditional_dim: int = 0
    prior: str = "gaussian"
    arena_size: Optional[tuple] = None
    conditional_keys: tuple = ()
    discrete_classes: Optional[dict] = None

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
        if self.conditional_dim > 0:
            # project [z, conditionals] back to the decoder memory width
            self.cond_proj = nn.Dense(self.z_dim, name="cond_proj")

    def _arena(self, dtype):
        return jnp.asarray(self.arena_size, dtype=dtype)

    def _flatten_input(self, data) -> Array:
        from scrubvae_tpu.ops.kinematics import normalize_root

        x6d = data["x6d"]
        B, W = x6d.shape[0], x6d.shape[1]
        flat = x6d.reshape(B, W, -1)
        if self.arena_size is not None:
            norm_root = normalize_root(data["root"], self._arena(x6d.dtype))
            return jnp.concatenate([flat, norm_root], axis=-1)
        return flat

    def encode(self, data, train: bool = True, mu_only: bool = False):
        mu, L = self.encoder(
            self._flatten_input(data), train=train, mu_only=mu_only
        )
        if L is None:
            return {"mu": mu}
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
        from scrubvae_tpu.ops.kinematics import inv_normalize_root

        out = {}
        var = self.build_conditionals(data)
        if var is not None:
            out["var"] = var
            z = self.cond_proj(jnp.concatenate([z, var], axis=-1))
        x_hat = self.decoder(z, train=train)
        B = x_hat.shape[0]
        if self.arena_size is not None:
            out["root"] = inv_normalize_root(x_hat[..., -3:], self._arena(x_hat.dtype))
            x6d = x_hat[..., :-3]
        else:
            x6d = x_hat
        out["x6d"] = x6d.reshape(B, self.window, -1, 6)
        return out

    def __call__(
        self,
        data,
        rng: Optional[Array] = None,
        train: bool = True,
        mu_only: bool = False,
    ):
        out = self.encode(data, train=train, mu_only=mu_only)
        if train and rng is not None and not mu_only:
            eps = jax.random.normal(rng, out["mu"].shape, dtype=out["mu"].dtype)
            z = out["mu"] + jnp.einsum("bij,bj->bi", out["L"], eps)
        else:
            z = out["mu"]
        out["z"] = z
        out.update(self.decode(z, data, train=train))
        return out

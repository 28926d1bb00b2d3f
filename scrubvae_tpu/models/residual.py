"""Residual convolutional VAE (flagship model) in flax.linen.

Architecture parity with the reference ResVAE
(/root/reference/src/scrubvae/model/residual.py:183-491): conv_in k7 ->
residual downsampling stack -> flatten -> (mu, CholeskyL) or (alpha, beta)
heads; decoder mirrors with transpose blocks and a final transposed conv
whose kernel closes the length arithmetic back to the window; arena-size
root normalization on encode/decode; conditional variables appended to z.

Everything is feature-last (B, W, C); the whole forward is a single XLA
program - no per-batch host logic.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from scrubvae_tpu.models.layers import (
    CholeskyL,
    Conv1d,
    ConvTranspose1d,
    ResidualBlock,
    ResidualBlockTranspose,
    decoder_lengths,
    encoder_lengths,
    make_activation,
)
from scrubvae_tpu.ops.kinematics import inv_normalize_root, normalize_root

__all__ = ["ResidualEncoder", "ResidualDecoder", "ResVAE"]

DEFAULT_CH = (64, 128, 256, 512, 1024)


class ResidualEncoder(nn.Module):
    ch: Sequence[int] = DEFAULT_CH
    kernel: int = 5
    z_dim: int = 128
    window: int = 51
    activation: str = "prelu"
    is_diag: bool = False
    prior: str = "gaussian"
    init_dilation: Optional[int] = None
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 MXU path)
    # Optional low-rank factorization of the full-covariance head: the
    # flatten->L_entries map becomes flatten->rank->L_entries. At the
    # reference operating point (flatten 4096, z 128) the dense fc_sigma is
    # 33.8M params (~70% of the model) and dominates both the optimizer's
    # HBM pass and the head matmul FLOPs; rank 256 cuts it 10x. This
    # constrains the *map* to L, not the covariance itself (L still has
    # full z(z+1)/2 degrees of freedom per sample). Config-gated deviation
    # (model.sigma_head_rank), default off = exact reference arithmetic
    # (reference residual.py:218-221).
    sigma_head_rank: Optional[int] = None
    # Emit the Cholesky factor in packed tril form (B, z(z+1)/2) instead of
    # materializing (B, z, z). Same math (layers.packed_* helpers; weights
    # interchangeable with the full path), ~10% faster fused step at the
    # flagship point. The factory enables it whenever no configured loss
    # needs the full matrix (total_correlation does).
    packed_sigma: bool = False

    def dilations(self):
        n = len(self.ch) - 1
        if self.init_dilation is None:
            return [1] * n
        return [self.init_dilation * 2**i for i in range(n)]

    @nn.compact
    def __call__(
        self, x: Array, train: bool = True, mu_only: bool = False
    ) -> Tuple[Array, Optional[Array]]:
        dil = self.dilations()
        if self.dtype is not None:
            x = x.astype(self.dtype)
        h = Conv1d(self.ch[0], 7, 1, 3, dtype=self.dtype)(x)
        h = make_activation(self.activation)(h)
        for i in range(len(self.ch) - 1):
            h = ResidualBlock(
                self.ch[i + 1], self.kernel, self.activation, dil[i],
                dtype=self.dtype,
            )(h, train=train)
        h = h.reshape(h.shape[0], -1)

        # Heads compute in bf16 on the MXU but emit float32: mu/L feed the
        # KL, sampler, and scrubbers, which stay in full precision.
        if self.prior == "gaussian":
            mu = nn.Dense(self.z_dim, name="fc_mu", dtype=self.dtype)(h)
            # Latent-extraction fast path: fc_sigma is ~75% of flagship
            # params and 25% of encoder FLOPs, and eval-mode z is just mu
            # (reference get/eval.py:8-70 reads only mu) - skip the head.
            if mu_only:
                return mu.astype(jnp.float32), None
            sig_dim = (
                self.z_dim if self.is_diag else self.z_dim * (self.z_dim + 1) // 2
            )
            rank = self.sigma_head_rank
            if rank and not self.is_diag and rank < min(sig_dim, h.shape[-1]):
                hs = nn.Dense(rank, name="fc_sigma_u", dtype=self.dtype)(h)
                sig = nn.Dense(sig_dim, name="fc_sigma_v", dtype=self.dtype)(hs)
            else:
                sig = nn.Dense(sig_dim, name="fc_sigma", dtype=self.dtype)(h)
            if self.packed_sigma:
                from scrubvae_tpu.models.layers import packed_softplus_diag

                Lp = packed_softplus_diag(
                    sig.astype(jnp.float32), self.z_dim, self.is_diag
                )
                return mu.astype(jnp.float32), Lp
            L = CholeskyL(self.z_dim, self.is_diag)(sig.astype(jnp.float32))
            return mu.astype(jnp.float32), L
        elif self.prior == "beta":
            alpha = (
                jax.nn.softplus(
                    nn.Dense(self.z_dim, name="fc_alpha", dtype=self.dtype)(h).astype(
                        jnp.float32
                    )
                )
                + 1.0
            )
            beta = (
                jax.nn.softplus(
                    nn.Dense(self.z_dim, name="fc_beta", dtype=self.dtype)(h).astype(
                        jnp.float32
                    )
                )
                + 1.0
            )
            return alpha, beta
        raise ValueError(f"unknown prior {self.prior!r}")


class ResidualDecoder(nn.Module):
    out_channels: int
    ch: Sequence[int] = DEFAULT_CH
    kernel: int = 5
    z_dim: int = 128
    window: int = 51
    activation: str = "prelu"
    conditional_dim: int = 0
    init_dilation: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z: Array, train: bool = True) -> Array:
        n_blocks = len(self.ch) - 1
        dil = [1] * n_blocks  # see layers.ResidualBlockTranspose note
        latent_len = encoder_lengths(self.window, self.kernel, n_blocks, dil)[-1]
        if self.dtype is not None:
            z = z.astype(self.dtype)
        h = nn.Dense(latent_len * self.ch[-1], name="fc_in", dtype=self.dtype)(z)
        h = h.reshape(h.shape[0], latent_len, self.ch[-1])
        for i in range(1, len(self.ch)):
            h = ResidualBlockTranspose(
                self.ch[-i - 1], self.kernel, self.activation, dil[-i],
                dtype=self.dtype,
            )(h, train=train)
        l_out = decoder_lengths(latent_len, self.kernel, n_blocks)[-1]
        final_kernel = self.window - l_out + 7
        h = ConvTranspose1d(
            self.out_channels, final_kernel, 1, 3, name="conv_out", dtype=self.dtype
        )(h)
        # reconstruction feeds f32 losses (rotation asin / FK), keep f32 out
        return jnp.tanh(h).astype(jnp.float32)


class ResVAE(nn.Module):
    """Encoder/decoder assembly with root normalization and conditional
    decoding. Scrubber modules live *outside* this module (explicit state in
    the train step - see models.scrubbers), unlike the reference which mutates
    nn.Module buffers mid-step.
    """

    in_channels: int
    ch: Sequence[int] = DEFAULT_CH
    kernel: int = 5
    z_dim: int = 128
    window: int = 51
    activation: str = "prelu"
    is_diag: bool = False
    conditional_dim: int = 0
    init_dilation: Optional[int] = None
    prior: str = "gaussian"
    arena_size: Optional[tuple] = None  # ((3,), (3,)) min/max rows, static
    conditional_keys: Sequence[str] = ()
    discrete_classes: Optional[Dict[str, int]] = None  # key -> n_classes
    precision: str = "fp32"  # "bf16": conv/dense compute in bfloat16
    sigma_head_rank: Optional[int] = None  # see ResidualEncoder
    packed_sigma: bool = False  # see ResidualEncoder

    def _dtype(self):
        return jnp.bfloat16 if self.precision == "bf16" else None

    def setup(self):
        self.encoder = ResidualEncoder(
            ch=self.ch,
            kernel=self.kernel,
            z_dim=self.z_dim,
            window=self.window,
            activation=self.activation,
            is_diag=self.is_diag,
            prior=self.prior,
            init_dilation=self.init_dilation,
            dtype=self._dtype(),
            sigma_head_rank=self.sigma_head_rank,
            packed_sigma=self.packed_sigma,
        )
        self.decoder = ResidualDecoder(
            out_channels=self.in_channels,
            ch=self.ch,
            kernel=self.kernel,
            z_dim=self.z_dim,
            window=self.window,
            activation=self.activation,
            conditional_dim=self.conditional_dim,
            init_dilation=self.init_dilation,
            dtype=self._dtype(),
        )

    def _arena(self, dtype):
        return jnp.asarray(self.arena_size, dtype=dtype)

    def encode(
        self,
        data: Dict[str, Array],
        train: bool = True,
        mu_only: bool = False,
    ) -> Dict[str, Array]:
        # Structural factor exclusion: when the batch carries a separate
        # encoder view ("x6d_enc"/"root_enc" — midfwd-aligned while the
        # recon target stays absolute; data/pipeline.py assemble_windows),
        # the encoder reads that view, so z cannot carry absolute heading
        # and the decoder must take it from the conditional input.
        x6d = data.get("x6d_enc", data["x6d"])
        B, W = x6d.shape[0], x6d.shape[1]
        flat = x6d.reshape(B, W, -1)
        if self.arena_size is not None:
            root = data.get("root_enc", data["root"])
            norm_root = normalize_root(root, self._arena(x6d.dtype))
            x_in = jnp.concatenate([flat, norm_root], axis=-1)
        else:
            x_in = flat
        a, b = self.encoder(
            x_in, train=train, mu_only=mu_only and self.prior == "gaussian"
        )
        out: Dict[str, Array] = {}
        if self.prior == "gaussian":
            if b is None:
                return {"mu": a}
            out["mu"], out["Lp" if self.packed_sigma else "L"] = a, b
        else:
            out["alpha"], out["beta"] = a, b
            out["mu"] = (a - 1.0 + 1e-8) / (a + b - 2.0 + 2e-8) * 2.0 - 1.0
        return out

    def build_conditionals(self, data: Dict[str, Array]) -> Optional[Array]:
        """One-hot discrete + continuous conditionals, concatenated
        (reference decode, residual.py:464-477)."""
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

    def decode(
        self, z: Array, data: Dict[str, Array], train: bool = True
    ) -> Dict[str, Array]:
        out: Dict[str, Array] = {}
        var = self.build_conditionals(data)
        if var is not None:
            out["var"] = var
            z = jnp.concatenate([z, var], axis=-1)
        x_hat = self.decoder(z, train=train)  # (B, W, C)
        B = z.shape[0]
        if self.arena_size is not None:
            x6d = x_hat[..., :-3]
            out["root"] = inv_normalize_root(
                x_hat[..., -3:], self._arena(x_hat.dtype)
            ).reshape(B, self.window, 3)
        else:
            x6d = x_hat
        out["x6d"] = x6d.reshape(B, self.window, -1, 6)
        return out

    def sample_z(self, mu: Array, L: Array, rng: Array) -> Array:
        eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
        if self.packed_sigma:
            from scrubvae_tpu.models.layers import packed_matvec

            return mu + packed_matvec(L, eps, self.z_dim, self.is_diag)
        return mu + jnp.einsum("bij,bj->bi", L, eps)

    def __call__(
        self,
        data: Dict[str, Array],
        rng: Optional[Array] = None,
        train: bool = True,
        mu_only: bool = False,
    ) -> Dict[str, Array]:
        # mu_only: eval-time fast path — skip the Cholesky head entirely
        # (z is mu in eval anyway). Only valid when nothing downstream
        # consumes L (the eval step decides statically from its loss keys).
        out = self.encode(data, train=train, mu_only=mu_only)
        if self.prior == "gaussian":
            if train and rng is not None and not mu_only:
                z = self.sample_z(
                    out["mu"], out["Lp" if self.packed_sigma else "L"], rng
                )
            else:
                z = out["mu"]
        else:
            # Beta prior: rsample in (0,1) scaled to (-1,1). Gamma-based
            # reparameterized sampling (differentiable in JAX).
            k1, k2 = jax.random.split(rng if rng is not None else jax.random.PRNGKey(0))
            ga = jax.random.gamma(k1, out["alpha"])
            gb = jax.random.gamma(k2, out["beta"])
            z = ga / (ga + gb) * 2.0 - 1.0
            if not train:
                z = out["mu"]
        out["z"] = z
        out.update(self.decode(z, data, train=train))
        return out

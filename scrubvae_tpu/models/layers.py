"""Core NN layers for the residual conv VAE, in flax.linen (NWC layout).

Shape-semantics parity with the reference blocks
(/root/reference/src/scrubvae/model/residual.py:39-292): identical conv
arithmetic (kernel/stride/padding/dilation and the derived latent lengths),
BatchNorm eps 1e-4, PReLU/Tanh activations, transposed blocks with
linear-upsample skip paths.

TPU-first choices (documented deviations, not semantic ones):
* feature-last (B, W, C) layout so the channel dim rides the 128-lane axis;
* flatten order is (length, channel) rather than torch's (channel, length) -
  irrelevant for from-scratch training;
* weight init is flax default (lecun_normal) instead of torch kaiming.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import Array

__all__ = [
    "conv_out_len",
    "conv_transpose_out_len",
    "encoder_lengths",
    "decoder_lengths",
    "PReLU",
    "Conv1d",
    "ConvTranspose1d",
    "upsample_linear_1d",
    "CholeskyL",
    "packed_softplus_diag",
    "packed_diag",
    "packed_matvec",
    "packed_sumsq",
    "packed_to_L",
    "ResidualBlock",
    "ResidualBlockTranspose",
]


def conv_out_len(l: int, kernel: int, stride: int, pad: int, dilation: int = 1) -> int:
    return (l + 2 * pad - dilation * (kernel - 1) - 1) // stride + 1


def conv_transpose_out_len(
    l: int, kernel: int, stride: int, pad: int, dilation: int = 1
) -> int:
    return (l - 1) * stride - 2 * pad + dilation * (kernel - 1) + 1


def encoder_lengths(
    window: int, kernel: int, n_blocks: int, dilations: Sequence[int]
) -> list:
    """Sequence lengths through conv_in + residual blocks (reference
    find_latent_dim conv math, residual.py:6-20)."""
    lens = [conv_out_len(window, 7, 1, 3)]
    for i in range(n_blocks):
        d = int(dilations[i])
        stride = 1 if d > 1 else 2
        lens.append(conv_out_len(lens[-1], kernel, stride, kernel // 2, d))
    return lens


def decoder_lengths(latent_len: int, kernel: int, n_blocks: int) -> list:
    """Lengths through transpose blocks (reference find_out_dim,
    residual.py:23-36; undilated path)."""
    lens = [latent_len]
    for _ in range(n_blocks):
        l = conv_transpose_out_len(lens[-1], kernel, 1, kernel // 2)
        lens.append(conv_transpose_out_len(l, kernel, 2, kernel // 2))
    return lens


class PReLU(nn.Module):
    """Single-parameter PReLU, init 0.25 (torch nn.PReLU default)."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x: Array) -> Array:
        alpha = self.param(
            "alpha", lambda key: jnp.asarray(self.init, dtype=jnp.float32)
        )
        return jnp.maximum(x, 0.0) + alpha.astype(x.dtype) * jnp.minimum(x, 0.0)


def make_activation(name: str):
    return nn.tanh if name == "tanh" else PReLU()


class Conv1d(nn.Module):
    """Torch-Conv1d-equivalent 1D conv in NWC layout.

    ``dtype`` is the compute dtype (bf16 for the MXU fast path); params stay
    float32 (flax casts per-call, the standard TPU mixed-precision recipe).
    """

    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel,),
            strides=(self.stride,),
            padding=[(self.pad, self.pad)],
            kernel_dilation=(self.dilation,),
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


class ConvTranspose1d(nn.Module):
    """Torch-ConvTranspose1d-equivalent: out = (L-1)*s - 2p + d(k-1) + 1.

    Implemented as an input-dilated conv (lhs_dilation) with padding
    d(k-1) - p per side, which reproduces the transposed-conv length
    arithmetic exactly.
    """

    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, x.shape[-1], self.features),
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            w = w.astype(self.dtype)
        edge = self.dilation * (self.kernel - 1) - self.pad
        out = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(1,),
            padding=[(edge, edge)],
            lhs_dilation=(self.stride,),
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + b.astype(out.dtype)
        return out


def upsample_linear_1d(x: Array, scale: int = 2) -> Array:
    """Linear interpolation upsample along W (torch Upsample mode='linear',
    align_corners=False, i.e. half-pixel centers).

    For the hot scale=2 case the weights are the fixed (0.75, 0.25) pair
    with edge clamping, so it is written as elementwise blends + interleave
    instead of jax.image.resize (which lowers to a dot + transposes on TPU).
    """
    B, W, C = x.shape
    if scale != 2:
        return jax.image.resize(x, (B, W * scale, C), method="linear")
    prev = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)  # x[i-1], clamped
    nxt = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)  # x[i+1], clamped
    even = 0.75 * x + 0.25 * prev  # out[2i]
    odd = 0.75 * x + 0.25 * nxt  # out[2i+1]
    return jnp.stack([even, odd], axis=2).reshape(B, 2 * W, C)


class CholeskyL(nn.Module):
    """Map a flat vector onto a lower-triangular Cholesky factor with a
    softplus-positive diagonal (reference CholeskyL, residual.py:39-68)."""

    z_dim: int
    is_diag: bool

    @nn.compact
    def __call__(self, x: Array) -> Array:
        D = self.z_dim
        B = x.shape[0]
        # +1e-6 floor on the diagonal: softplus underflows to exact 0 for
        # inputs < -103, and the KL / total-correlation losses take
        # log(diag) -> -inf -> nan gradients. A collapsing posterior under
        # a small annealed beta reaches that underflow (observed: the full
        # ladder config went nan at epoch 8 with prior KL ~2e4). The floor
        # is invisible for any healthy scale (diag ~1e-2..10) and matches
        # what the KL can resolve in f32 anyway.
        if self.is_diag:
            diag = jax.nn.softplus(x) + 1e-6
            L = jnp.zeros((B, D, D), dtype=x.dtype)
            return L.at[:, jnp.arange(D), jnp.arange(D)].set(diag)
        idx = jnp.tril_indices(D)
        L = jnp.zeros((B, D, D), dtype=x.dtype)
        L = L.at[:, idx[0], idx[1]].set(x)
        ar = jnp.arange(D)
        return L.at[:, ar, ar].set(jax.nn.softplus(L[:, ar, ar]) + 1e-6)


# ---------------------------------------------------------------------------
# Packed lower-triangular representation.
#
# Materializing the (B, D, D) Cholesky factor from the head's packed
# D(D+1)/2 vector costs a scatter forward and a masked gather backward; at
# the flagship point (B=512, D=128) that machinery measured ~0.8 ms/step,
# ~10% of the fused train step (profiled fusions around f32[512,16384] /
# [8256,512] buffers). Everything the train losses need from L - the
# sampler matvec L@eps, diag(L), and trace(LL^T) - is computable directly
# on the packed vector with static index maps and one tiny one-hot matmul,
# so the full matrix never touches HBM. Only total_correlation (which
# evaluates cross-sample densities) needs the materialized factor; the
# factory keeps the full path when that loss is configured.
#
# Layout: row-major packed tril, entry k <-> (row_k, col_k), row i at
# offset i(i+1)/2 (the same order CholeskyL scatters, so fc_sigma weights
# are interchangeable between paths). For is_diag the packed vector is
# just the diagonal (K == D).
# ---------------------------------------------------------------------------

import functools as _functools

import numpy as _np


@_functools.lru_cache(maxsize=None)
def _tril_info(D: int, diag_only: bool):
    if diag_only:
        rows = cols = _np.arange(D, dtype=_np.int32)
    else:
        rows = _np.repeat(_np.arange(D), _np.arange(1, D + 1)).astype(_np.int32)
        cols = _np.concatenate(
            [_np.arange(i + 1) for i in range(D)]
        ).astype(_np.int32)
    diag_pos = _np.nonzero(rows == cols)[0].astype(_np.int32)
    # one-hot row-aggregation matrix: (xp @ R)[b, i] = sum_{k: row_k == i}
    row_onehot = _np.zeros((rows.size, D), _np.float32)
    row_onehot[_np.arange(rows.size), rows] = 1.0
    return rows, cols, diag_pos, row_onehot


def packed_softplus_diag(xp: Array, D: int, diag_only: bool = None) -> Array:
    """Apply CholeskyL's softplus(+1e-6 floor) to the diagonal entries of a
    packed tril vector (B, K). Semantics identical to CholeskyL."""
    if diag_only is None:
        diag_only = xp.shape[-1] == D
    if diag_only:
        return jax.nn.softplus(xp) + 1e-6
    rows, cols, _, _ = _tril_info(D, diag_only)
    is_diag = jnp.asarray(rows == cols)
    return jnp.where(is_diag, jax.nn.softplus(xp) + 1e-6, xp)


def packed_diag(xp: Array, D: int, diag_only: bool = None) -> Array:
    """diag(L) from the packed vector: a static 128-entry column take."""
    if diag_only is None:
        diag_only = xp.shape[-1] == D
    if diag_only:
        return xp
    _, _, diag_pos, _ = _tril_info(D, diag_only)
    return xp[:, diag_pos]


def packed_sumsq(xp: Array) -> Array:
    """sum_b trace(L_b L_b^T) = sum of squares of all packed entries."""
    return jnp.sum(jnp.square(xp))


def packed_matvec(xp: Array, v: Array, D: int, diag_only: bool = None) -> Array:
    """L @ v without materializing L: (L v)_i = sum_{k in row i} xp_k v_{col_k}.

    Column expansion is a static take; the row reduction is a one-hot
    matmul (MXU-friendly; exact in f32 at HIGHEST precision)."""
    if diag_only is None:
        diag_only = xp.shape[-1] == D
    if diag_only:
        return xp * v
    _, cols, _, row_onehot = _tril_info(D, diag_only)
    prod = xp * jnp.take(v, jnp.asarray(cols), axis=1)
    return jax.lax.dot(
        prod.astype(jnp.float32),
        jnp.asarray(row_onehot),
        precision=jax.lax.Precision.HIGHEST,
    )


def packed_to_L(xp: Array, D: int, diag_only: bool = None) -> Array:
    """Materialize the (B, D, D) factor from a packed vector (already
    softplus'd) - compatibility escape hatch for full-L consumers."""
    if diag_only is None:
        diag_only = xp.shape[-1] == D
    B = xp.shape[0]
    L = jnp.zeros((B, D, D), dtype=xp.dtype)
    if diag_only:
        ar = jnp.arange(D)
        return L.at[:, ar, ar].set(xp)
    rows, cols, _, _ = _tril_info(D, diag_only)
    return L.at[:, jnp.asarray(rows), jnp.asarray(cols)].set(xp)


class ResidualBlock(nn.Module):
    """Strided (or dilated) residual downsampling block
    (reference residual.py:71-119)."""

    features: int
    kernel: int = 3
    activation: str = "prelu"
    dilation: int = 1
    bn_momentum: float = 0.9
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        stride = 1 if self.dilation > 1 else 2
        k, p = self.kernel, self.kernel // 2
        act1 = make_activation(self.activation)
        act2 = make_activation(self.activation)

        h = Conv1d(self.features // 2, k, stride, p, self.dilation, dtype=self.dtype)(x)
        h = nn.BatchNorm(
            use_running_average=not train, epsilon=1e-4, momentum=self.bn_momentum,
            dtype=self.dtype,
        )(h)
        h = act1(h)
        h = Conv1d(self.features, k, 1, p, 1, dtype=self.dtype)(h)

        skip = Conv1d(self.features, k, stride, p, self.dilation, dtype=self.dtype)(x)

        out = nn.BatchNorm(
            use_running_average=not train, epsilon=1e-4, momentum=self.bn_momentum,
            dtype=self.dtype,
        )(h + skip)
        return act2(out)


class ResidualBlockTranspose(nn.Module):
    """Transposed residual upsampling block with linear-upsample skip
    (reference residual.py:122-180)."""

    features: int
    kernel: int = 3
    activation: str = "prelu"
    dilation: int = 1
    bn_momentum: float = 0.9
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        if self.dilation > 1:
            raise NotImplementedError(
                "dilated transpose blocks have inconsistent lengths in the "
                "reference design (residual.py:136-170) and are not supported"
            )
        k, p = self.kernel, self.kernel // 2
        in_ch = x.shape[-1]
        act1 = make_activation(self.activation)
        act2 = make_activation(self.activation)

        h = ConvTranspose1d(in_ch // 2, k, 1, p, dtype=self.dtype)(x)
        h = nn.BatchNorm(
            use_running_average=not train, epsilon=1e-4, momentum=self.bn_momentum,
            dtype=self.dtype,
        )(h)
        h = act1(h)
        h = ConvTranspose1d(self.features, k, 2, p, dtype=self.dtype)(h)

        skip = upsample_linear_1d(x, 2)
        skip = Conv1d(self.features, k + 1, 1, p, dtype=self.dtype)(skip)

        out = nn.BatchNorm(
            use_running_average=not train, epsilon=1e-4, momentum=self.bn_momentum,
            dtype=self.dtype,
        )(h + skip)
        return act2(out)

"""Primitive loss functions in pure JAX.

Semantics-parity with /root/reference/src/scrubvae/train/losses.py (formulas
and normalization conventions are identical, including un-normalized sums
where the reference uses them), written as fused jnp expressions that XLA
lowers to single VPU/MXU kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from scrubvae_tpu.ops.kinematics import KinematicTree, fwd_kin_cont6d
from scrubvae_tpu.ops.rotation import rotation_6d_to_matrix

LN2PI = jnp.log(2.0 * jnp.pi)

__all__ = [
    "rotation_loss",
    "stable_rotation_loss",
    "prior_loss",
    "prior_loss_packed",
    "beta_prior_loss",
    "mpjpe_loss",
    "direct_lsq_loss",
    "total_correlation",
    "mse_sum",
]


def mse_sum(pred: Array, target: Array) -> Array:
    return jnp.sum((pred - target) ** 2)


def rotation_loss(x: Array, x_hat: Array, eps: float = 1e-7) -> Array:
    """Geodesic 6D rotation loss, acos form (losses.py:104-120)."""
    batch_size = x.shape[0]
    m1 = rotation_6d_to_matrix(x).reshape(-1, 3, 3)
    m2 = rotation_6d_to_matrix(x_hat).reshape(-1, 3, 3)
    m = m1 @ jnp.swapaxes(m2, -1, -2)
    cos = (m[:, 0, 0] + m[:, 1, 1] + m[:, 2, 2] - 1.0) / 2.0
    cos = jnp.clip(cos, -1.0 + eps, 1.0 - eps)
    return jnp.sum(jnp.arccos(cos)) / batch_size


def stable_rotation_loss(x: Array, x_hat: Array, eps: float = 1e-7) -> Array:
    """Numerically stable geodesic loss via asin of the chordal distance
    (losses.py:123-136). NOTE: un-normalized sum over all rotations, as in
    the reference."""
    m1 = rotation_6d_to_matrix(x)
    m2 = rotation_6d_to_matrix(x_hat)
    diff = m2 - m1
    # +1e-14 inside the sqrt: its gradient is unbounded (nan) at an exact
    # zero difference, which perfectly-reconstructed rotations reach late
    # in training; the shift biases sin by <= 1e-7 (far below f32 noise).
    sin = jnp.sqrt(jnp.sum(diff * diff, axis=(-1, -2)) + 1e-14) / (2.0**1.5)
    sin = jnp.clip(sin, -1.0 + eps, 1.0 - eps)
    return 2.0 * jnp.sum(jnp.arcsin(sin))


def prior_loss(mu: Array, L: Array) -> Array:
    """KL(N(mu, LL^T) || N(0, I)) for Cholesky factor L, averaged over the
    batch (losses.py:138-146)."""
    var_diag = jnp.sum(L * L, axis=-1)  # diag(L L^T)
    log_diag_L = jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1))
    kl = -0.5 * jnp.sum(1.0 + 2.0 * log_diag_L - mu**2 - var_diag)
    return kl / mu.shape[0]


def prior_loss_packed(mu: Array, Lp: Array, diag_only: bool = False) -> Array:
    """prior_loss computed on the packed tril factor (models/layers.py
    packed_* helpers) without materializing L: sum_i diag(LL^T)_i is the
    sum of squares of every packed entry, and diag(L) is a static take.
    Same formula as prior_loss (reference losses.py:138-146)."""
    from scrubvae_tpu.models.layers import packed_diag, packed_sumsq

    D = mu.shape[1]
    log_diag = jnp.log(packed_diag(Lp, D, diag_only))
    kl = -0.5 * (
        mu.shape[0] * D
        + 2.0 * jnp.sum(log_diag)
        - jnp.sum(mu**2)
        - packed_sumsq(Lp)
    )
    return kl / mu.shape[0]


def beta_prior_loss(alpha: Array, beta: Array) -> Array:
    """KL(Beta(alpha, beta) || Beta(1, 1)) summed over dims, averaged over the
    batch (losses.py:199-206). Closed form with digammas."""
    dg = jax.scipy.special.digamma
    betaln = (
        jax.scipy.special.gammaln(alpha)
        + jax.scipy.special.gammaln(beta)
        - jax.scipy.special.gammaln(alpha + beta)
    )
    kl = (
        -betaln
        + (alpha - 1.0) * dg(alpha)
        + (beta - 1.0) * dg(beta)
        - (alpha + beta - 2.0) * dg(alpha + beta)
    )
    return jnp.sum(kl) / alpha.shape[0]


def mpjpe_loss(
    target_pose: Array,
    x6d_hat: Array,
    tree: KinematicTree,
    offsets: Array,
    root_hat: Array | None = None,
) -> Array:
    """Mean per-joint position error with FK inside the loss
    (losses.py:148-171). target_pose: (B, W, J, 3); x6d_hat: (B, W, J, 6);
    offsets: (B, W, J, 3). Normalized by B * 3 * J (reference convention -
    not by window length)."""
    B, W, J = target_pose.shape[0], target_pose.shape[1], target_pose.shape[2]
    if root_hat is None:
        root_hat = jnp.zeros_like(target_pose[..., 0, :])
    pose_hat = fwd_kin_cont6d(
        x6d_hat.reshape(-1, J, 6),
        tree,
        offsets.reshape(-1, J, 3),
        root_pos=root_hat.reshape(-1, 3),
        do_root_R=True,
        eps=1e-8,
    ).reshape(target_pose.shape)
    return jnp.sum((target_pose - pose_hat) ** 2) / (B * 3 * J)


def direct_lsq_loss(z: Array, y: Array, bias: bool = False) -> Array:
    """Closed-form least-squares residual of decoding y from z
    (losses.py:173-179)."""
    if bias:
        z = jnp.concatenate([z, jnp.ones((z.shape[0], 1), dtype=z.dtype)], axis=-1)
    zz = z.T @ z
    zy = z.T @ y
    yhat = z @ jnp.linalg.solve(zz, zy)
    return jnp.sum((yhat - y) ** 2)


def _gaussian_log_density_unsummed(z: Array, mu: Array, logvar: Array) -> Array:
    diff_sq = (z - mu) ** 2
    inv_var = jnp.exp(-logvar)
    return -0.5 * (inv_var * diff_sq + logvar + LN2PI)


def total_correlation(z: Array, mu: Array, L: Array) -> Array:
    """beta-TCVAE minibatch total-correlation estimator (losses.py:41-101).

    O(B^2 D) fused log-density matrix - a single VPU kernel on TPU. z is
    stop-gradiented as in the reference.
    """
    logvar = jnp.log(jnp.sum(L * L, axis=-1))
    log_qz_prob = _gaussian_log_density_unsummed(
        jax.lax.stop_gradient(z)[:, None], mu[None, :], logvar[None, :]
    )
    log_qz_product = jnp.sum(
        jax.scipy.special.logsumexp(log_qz_prob, axis=1), axis=1
    )
    log_qz = jax.scipy.special.logsumexp(jnp.sum(log_qz_prob, axis=2), axis=1)
    return jnp.mean(log_qz - log_qz_product)

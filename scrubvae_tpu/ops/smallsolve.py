"""Unrolled linear solves for tiny SPD systems on TPU.

``jnp.linalg.solve`` lowers to a column-sequential LU ``while`` loop on TPU;
for the scrubbers' tiny systems (LinearProjection's (3,3) Gram matrix,
MALS' (n,n) normal equations with n <= ~15, QDA's per-class (D,D)
covariances) that is pure serialized loop overhead. (A per-step-dispatch
ablation had briefly attributed ~2/3 of the fused step to these solves;
the scanned-mode re-measurement showed that was tunnel dispatch noise and
the true scanned-step cost of the scrubbers is below measurement noise —
artifacts/profile/README.md §2-3. The unroll is kept: it removes every
solve ``while`` loop from the compiled step for free.) Every matrix at
these call sites is symmetric positive definite by construction (w @ w.T
of a full-rank decoder; EMA normal equations seeded from the identity;
streaming covariances seeded from the identity), so unpivoted Gauss-Jordan
elimination is numerically equivalent to a Cholesky solve and unrolls at
trace time into ~n fused rank-1 VPU updates with zero loop overhead.

These helpers replace ``jnp.linalg.solve`` / ``slogdet`` ONLY for static
n <= SMALL_N_MAX; larger systems fall back to lax.linalg (the unroll would
bloat the program). Differentiation works through the unrolled graph
directly (plain arithmetic ops).

Parity note: results agree with LAPACK-pivoted solves to f32 roundoff for
SPD inputs (tests/test_math_core.py::TestSmallSolve); this is an
implementation detail, not a semantics deviation.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

__all__ = ["SMALL_N_MAX", "spd_solve", "spd_slogdet"]

# Above this the unrolled program stops being worth the compile-time/program
# size; scrubber systems are all <= 16.
SMALL_N_MAX = 32


def _gauss_jordan(A: Array, B: Array):
    """Unrolled Gauss-Jordan: returns (A^-1 B, sum(log|pivot|)).

    A: (..., n, n) SPD, B: (..., n, m). No pivoting (SPD pivots are
    positive); each of the n trace-time iterations is one rank-1 update
    over the batched augmented system.
    """
    A = jnp.asarray(A)  # callers may pass numpy (host-side scrubber use)
    B = jnp.asarray(B)
    n = A.shape[-1]
    logdet = jnp.zeros(A.shape[:-2], dtype=A.dtype)
    for k in range(n):
        piv = A[..., k, k]  # (...,)
        logdet = logdet + jnp.log(jnp.abs(piv))
        inv = 1.0 / piv[..., None]  # (..., 1)
        row_a = A[..., k, :] * inv  # (..., n)
        row_b = B[..., k, :] * inv  # (..., m)
        col = A[..., :, k]  # (..., n)
        # eliminate column k everywhere, then restore the normalized pivot
        # row (the update zeroes it: col[k] == piv)
        A = A - col[..., :, None] * row_a[..., None, :]
        B = B - col[..., :, None] * row_b[..., None, :]
        A = A.at[..., k, :].set(row_a)
        B = B.at[..., k, :].set(row_b)
    return B, logdet


def spd_solve(A: Array, B: Array) -> Array:
    """``jnp.linalg.solve(A, B)`` for small SPD ``A`` (..., n, n) with
    ``B`` (..., n, m) or (..., n): unrolled, loop-free on TPU."""
    vec = B.ndim == A.ndim - 1
    if vec:
        B = B[..., None]
    if A.shape[-1] > SMALL_N_MAX:
        out = jnp.linalg.solve(A, B)
    else:
        out, _ = _gauss_jordan(A, B)
    return out[..., 0] if vec else out


def spd_slogdet(A: Array) -> Array:
    """log|det A| for small SPD ``A`` (sign is +1 by assumption); matches
    ``jnp.linalg.slogdet(A)[1]`` for SPD inputs."""
    if A.shape[-1] > SMALL_N_MAX:
        return jnp.linalg.slogdet(A)[1]
    _, logdet = _gauss_jordan(A, A[..., :, :1])  # dummy rhs, 1 column
    return logdet

"""Rotation-representation conversions in pure JAX.

Capability parity with the reference conversion suite
(/root/reference/src/scrubvae/data/rotation_conversion.py), re-written as
branch-free vectorized jnp (PyTorch3D semantics: scalar-first quaternions,
matrices acting on column vectors).

The 6D representation here is the *row* convention of Zhou et al. (first two
matrix rows + Gram-Schmidt), used by the rotation loss - distinct from the
column-wise ``cont6d`` convention in ops.quaternion used by the kinematics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from scrubvae_tpu.ops.quaternion import quaternion_to_matrix  # noqa: F401

__all__ = [
    "quaternion_to_matrix",
    "matrix_to_quaternion",
    "axis_angle_to_quaternion",
    "quaternion_to_axis_angle",
    "axis_angle_to_matrix",
    "matrix_to_axis_angle",
    "euler_angles_to_matrix",
    "matrix_to_euler_angles",
    "rotation_6d_to_matrix",
    "matrix_to_rotation_6d",
    "random_quaternions",
    "random_rotations",
    "standardize_quaternion",
    "quaternion_multiply",
    "quaternion_invert",
    "quaternion_apply",
    "canonicalize_smplh",
]


def _sqrt_positive_part(x: Array) -> Array:
    return jnp.sqrt(jnp.maximum(x, 0.0))


def matrix_to_quaternion(matrix: Array) -> Array:
    """Rotation matrices (..., 3, 3) -> scalar-first quaternions (..., 4).

    Branch-free variant of the PyTorch3D algorithm: build the four candidate
    quaternions from each diagonal combination, select the numerically best
    (largest denominator) with a one-hot where.
    """
    m = matrix
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    q_abs = jnp.stack(
        [
            _sqrt_positive_part(1.0 + m00 + m11 + m22),
            _sqrt_positive_part(1.0 + m00 - m11 - m22),
            _sqrt_positive_part(1.0 - m00 + m11 - m22),
            _sqrt_positive_part(1.0 - m00 - m11 + m22),
        ],
        axis=-1,
    )
    quat_by_rijk = jnp.stack(
        [
            jnp.stack(
                [
                    q_abs[..., 0] ** 2,
                    m[..., 2, 1] - m[..., 1, 2],
                    m[..., 0, 2] - m[..., 2, 0],
                    m[..., 1, 0] - m[..., 0, 1],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    m[..., 2, 1] - m[..., 1, 2],
                    q_abs[..., 1] ** 2,
                    m[..., 1, 0] + m[..., 0, 1],
                    m[..., 0, 2] + m[..., 2, 0],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    m[..., 0, 2] - m[..., 2, 0],
                    m[..., 1, 0] + m[..., 0, 1],
                    q_abs[..., 2] ** 2,
                    m[..., 2, 1] + m[..., 1, 2],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    m[..., 1, 0] - m[..., 0, 1],
                    m[..., 2, 0] + m[..., 0, 2],
                    m[..., 2, 1] + m[..., 1, 2],
                    q_abs[..., 3] ** 2,
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )
    flr = jnp.asarray(0.1, dtype=matrix.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))
    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax.nn.one_hot(best, 4, dtype=bool, axis=-1)
    out = jnp.sum(jnp.where(onehot[..., None], quat_candidates, 0.0), axis=-2)
    return standardize_quaternion(out)


def standardize_quaternion(q: Array) -> Array:
    """Flip sign so the real part is non-negative."""
    return jnp.where(q[..., :1] < 0, -q, q)


def quaternion_multiply(a: Array, b: Array) -> Array:
    from scrubvae_tpu.ops.quaternion import qmul

    return qmul(a, b)


def quaternion_invert(q: Array) -> Array:
    from scrubvae_tpu.ops.quaternion import qinv

    return qinv(q)


def quaternion_apply(q: Array, point: Array) -> Array:
    from scrubvae_tpu.ops.quaternion import qrot

    return qrot(q, point)


def axis_angle_to_quaternion(axis_angle: Array) -> Array:
    """Axis-angle (..., 3) -> quaternion, Taylor-stable near zero angle."""
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = 0.5 * angles
    small = jnp.abs(angles) < 1e-6
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angles * angles) / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angles)
    )
    return jnp.concatenate([jnp.cos(half), axis_angle * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(q: Array) -> Array:
    norms = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    half_angles = jnp.arctan2(norms, q[..., :1])
    angles = 2.0 * half_angles
    small = jnp.abs(angles) < 1e-6
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / jnp.where(small, 1.0, angles),
    )
    return q[..., 1:] / sin_half_over_angle


def axis_angle_to_matrix(axis_angle: Array) -> Array:
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: Array) -> Array:
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def _axis_rotation_matrix(axis: str, angle: Array) -> Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, c, -s, zero, s, c)
    elif axis == "Y":
        flat = (c, zero, s, zero, one, zero, -s, zero, c)
    elif axis == "Z":
        flat = (c, -s, zero, s, c, zero, zero, zero, one)
    else:
        raise ValueError(f"invalid axis {axis!r}")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: Array, convention: str) -> Array:
    """Extrinsic composition R = R_c0(a0) @ R_c1(a1) @ R_c2(a2)."""
    if len(convention) != 3 or any(c not in "XYZ" for c in convention):
        raise ValueError(f"invalid convention {convention!r}")
    mats = [
        _axis_rotation_matrix(c, euler_angles[..., i])
        for i, c in enumerate(convention)
    ]
    return mats[0] @ mats[1] @ mats[2]


def _angle_from_tan(
    axis: str, other_axis: str, data: Array, horizontal: bool, tait_bryan: bool
) -> Array:
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i1, i2 = i2, i1
    even = (axis + other_axis) in ("XY", "YZ", "ZX")
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: Array, convention: str) -> Array:
    if len(convention) != 3 or any(c not in "XYZ" for c in convention):
        raise ValueError(f"invalid convention {convention!r}")
    i0 = "XYZ".index(convention[0])
    i2 = "XYZ".index(convention[2])
    tait_bryan = i0 != i2
    if tait_bryan:
        central = jnp.arcsin(
            jnp.clip(matrix[..., i0, i2] * (-1.0 if i0 - i2 in (-1, 2) else 1.0), -1, 1)
        )
    else:
        central = jnp.arccos(jnp.clip(matrix[..., i0, i0], -1, 1))
    a0 = _angle_from_tan(
        convention[0], convention[1], matrix[..., i2], False, tait_bryan
    )
    a2 = _angle_from_tan(
        convention[2], convention[1], matrix[..., i0, :], True, tait_bryan
    )
    return jnp.stack([a0, central, a2], axis=-1)


def random_quaternions(key: Array, n: int, dtype=jnp.float32) -> Array:
    q = jax.random.normal(key, (n, 4), dtype=dtype)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def random_rotations(key: Array, n: int, dtype=jnp.float32) -> Array:
    return quaternion_to_matrix(random_quaternions(key, n, dtype))


def _smooth_normalize(x: Array, eps: float = 1e-6) -> Array:
    """x / ||x|| with a smooth, fully differentiable guard.

    ``x / max(||x||, eps)`` (torch F.normalize, used by the reference) is
    forward-safe but its BACKWARD is nan at ||x|| == 0 (norm's gradient is
    0/0) and explodes as 1/||x|| near it. An untrained decoder emits 6D
    rows with ||a2_perp|| ~ 1e-7; TPU bf16-pass matmul noise pushes such
    rows through exact zero, which turned entire gradient trees nan
    (observed on the conditional ladder config, step 76). rsqrt(||x||^2 +
    eps^2) is smooth everywhere, bounds the gradient by ~1/eps, and for
    ||x|| >= 1e-2 differs from 1/||x|| by < 1e-8 relative — below f32
    resolution for every legitimate rotation row.
    """
    n2 = jnp.sum(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(n2 + eps * eps)


def rotation_6d_to_matrix(d6: Array) -> Array:
    """Row-convention 6D -> rotation matrix via Gram-Schmidt (Zhou et al.).

    Matches the reference rotation-loss path
    (rotation_conversion.py:469-488): rows are stacked, b3 = b1 x b2.
    Normalizations use the smooth guard (see _smooth_normalize) so the
    backward pass stays finite on degenerate rows.
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = _smooth_normalize(a1)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = _smooth_normalize(b2)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: Array) -> Array:
    """First two rows of the rotation matrix, flattened."""
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


def canonicalize_smplh(poses: Array, trans: Array | None = None):
    """Canonicalize SMPL-H-style rotation sequences against the first frame.

    API parity with reference rotation_conversion.py:506-531 (unused by the
    reference's main training path but part of its public surface): rotate
    every frame's global orientation by the inverse-free re-composition of
    frame 0's axis-angle (so sequences start from a canonical heading), and
    optionally re-integrate the translation velocity in the rotated frame,
    starting from the origin.

    poses: (B, T, J, 3, 3) rotation matrices; trans: (B, T, 3).
    """
    global_orient = poses[:, :, 0]  # (B, T, 3, 3)
    rot2d = axis_angle_to_matrix(matrix_to_axis_angle(global_orient[:, 0]))
    # einsum("ikj,imkl->imjl"): R0^T @ R_t per frame
    global_orient = jnp.einsum("ikj,imkl->imjl", rot2d, global_orient)
    xc = jnp.concatenate([global_orient[:, :, None], poses[:, :, 1:]], axis=2)
    if trans is None:
        return xc
    vel = trans[:, 1:] - trans[:, :-1]
    vel = jnp.einsum("ikj,ilk->ilj", rot2d, vel)
    trans_c = jnp.concatenate(
        [jnp.zeros_like(trans[:, :1]), jnp.cumsum(vel, axis=1)], axis=1
    )
    return xc, trans_c

"""Quaternion algebra in pure JAX.

Capability parity with the reference quaternion library
(/root/reference/src/scrubvae/data/quaternion.py:17-446), re-designed for XLA:
every op is a closed-form elementwise expression over the last axis (VPU
friendly, no batch flattening, no shape-dependent Python control flow), works
under jit/vmap/grad, and is dtype-polymorphic (f32 default, bf16-safe).

Conventions: scalar-first quaternions ``q = (w, x, y, z)``; rotation matrices
act on column vectors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

__all__ = [
    "qinv",
    "qnormalize",
    "qmul",
    "qrot",
    "qeuler",
    "qfix",
    "euler_to_quaternion",
    "expmap_to_quaternion",
    "quaternion_to_matrix",
    "quaternion_to_cont6d",
    "cont6d_to_matrix",
    "qpow",
    "qslerp",
    "qbetween",
    "lerp",
    "yaw_quat",
]


def qinv(q: Array) -> Array:
    """Conjugate of unit quaternion(s): (w, -x, -y, -z)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qnormalize(q: Array, eps: float = 0.0) -> Array:
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + eps)


def qmul(q: Array, r: Array) -> Array:
    """Hamilton product q*r over the last axis; broadcasts like jnp."""
    qw, qx, qy, qz = jnp.split(q, 4, axis=-1)
    rw, rx, ry, rz = jnp.split(r, 4, axis=-1)
    return jnp.concatenate(
        [
            qw * rw - qx * rx - qy * ry - qz * rz,
            qw * rx + qx * rw + qy * rz - qz * ry,
            qw * ry - qx * rz + qy * rw + qz * rx,
            qw * rz + qx * ry - qy * rx + qz * rw,
        ],
        axis=-1,
    )


def qrot(q: Array, v: Array) -> Array:
    """Rotate vector(s) v by quaternion(s) q (broadcasting batch dims).

    Uses the cross-product form v + 2*(w*(u x v) + u x (u x v)) which is two
    cross products instead of a 3x3 matmul - cheaper on the VPU.
    """
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def _asin_clamped(x: Array, epsilon: float) -> Array:
    return jnp.arcsin(jnp.clip(x, -1.0 + epsilon, 1.0 - epsilon))


def qeuler(q: Array, order: str, epsilon: float = 0.0, deg: bool = True) -> Array:
    """Quaternion to Euler angles for the six Tait-Bryan orders."""
    q0, q1, q2, q3 = (q[..., i] for i in range(4))
    if order == "xyz":
        x = jnp.arctan2(2 * (q0 * q1 - q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        y = _asin_clamped(2 * (q1 * q3 + q0 * q2), epsilon)
        z = jnp.arctan2(2 * (q0 * q3 - q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    elif order == "yzx":
        x = jnp.arctan2(2 * (q0 * q1 - q2 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
        y = jnp.arctan2(2 * (q0 * q2 - q1 * q3), 1 - 2 * (q2 * q2 + q3 * q3))
        z = _asin_clamped(2 * (q1 * q2 + q0 * q3), epsilon)
    elif order == "zxy":
        x = _asin_clamped(2 * (q0 * q1 + q2 * q3), epsilon)
        y = jnp.arctan2(2 * (q0 * q2 - q1 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        z = jnp.arctan2(2 * (q0 * q3 - q1 * q2), 1 - 2 * (q1 * q1 + q3 * q3))
    elif order == "xzy":
        x = jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
        y = jnp.arctan2(2 * (q0 * q2 + q1 * q3), 1 - 2 * (q2 * q2 + q3 * q3))
        z = _asin_clamped(2 * (q0 * q3 - q1 * q2), epsilon)
    elif order == "yxz":
        x = _asin_clamped(2 * (q0 * q1 - q2 * q3), epsilon)
        y = jnp.arctan2(2 * (q1 * q3 + q0 * q2), 1 - 2 * (q1 * q1 + q2 * q2))
        z = jnp.arctan2(2 * (q1 * q2 + q0 * q3), 1 - 2 * (q1 * q1 + q3 * q3))
    elif order == "zyx":
        x = jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        y = _asin_clamped(2 * (q0 * q2 - q1 * q3), epsilon)
        z = jnp.arctan2(2 * (q0 * q3 + q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    else:
        raise ValueError(f"unknown euler order {order!r}")
    out = jnp.stack([x, y, z], axis=-1)
    return out * (180.0 / jnp.pi) if deg else out


def qfix(q: Array) -> Array:
    """Enforce sign continuity along the leading (time) axis.

    Replaces the reference's in-place cumsum masking with a functional
    cumulative-product sign (XLA scan-free: cumprod of +-1).
    """
    dots = jnp.sum(q[1:] * q[:-1], axis=-1)
    flips = jnp.where(dots < 0, -1.0, 1.0).astype(q.dtype)
    signs = jnp.concatenate(
        [jnp.ones_like(flips[:1]), jnp.cumprod(flips, axis=0)], axis=0
    )
    return q * signs[..., None]


def _axis_quat(angle: Array, axis: int) -> Array:
    """Quaternion for rotation by `angle` around base axis (0=x,1=y,2=z)."""
    half = 0.5 * angle
    c, s = jnp.cos(half), jnp.sin(half)
    zeros = jnp.zeros_like(angle)
    comps = [c, zeros, zeros, zeros]
    comps[axis + 1] = s
    return jnp.stack(comps, axis=-1)


def euler_to_quaternion(e: Array, order: str, deg: bool = False) -> Array:
    """Compose per-axis quaternions in the given order.

    Mirrors the reference convention (euler2quat/euler_to_quaternion), incl.
    the antipodal sign flip for the cyclic orders xyz/yzx/zxy.
    """
    if deg:
        e = e * (jnp.pi / 180.0)
    axis_of = {"x": 0, "y": 1, "z": 2}
    result = None
    for coord in order:
        ax = axis_of[coord]
        r = _axis_quat(e[..., ax], ax)
        result = r if result is None else qmul(result, r)
    if order in ("xyz", "yzx", "zxy"):
        result = -result
    return result


def expmap_to_quaternion(e: Array) -> Array:
    """Axis-angle (exponential map) to quaternion, stable near zero."""
    theta = jnp.linalg.norm(e, axis=-1, keepdims=True)
    w = jnp.cos(0.5 * theta)
    xyz = 0.5 * jnp.sinc(0.5 * theta / jnp.pi) * e
    return jnp.concatenate([w, xyz], axis=-1)


def quaternion_to_matrix(q: Array) -> Array:
    """Quaternion(s) to rotation matrix(es), shape (..., 3, 3)."""
    r, i, j, k = (q[..., n] for n in range(4))
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    m = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quaternion_to_cont6d(q: Array) -> Array:
    """First two *columns* of the rotation matrix, concatenated (ref convention
    for the pose representation: quaternion.py:325-334)."""
    m = quaternion_to_matrix(q)
    return jnp.concatenate([m[..., 0], m[..., 1]], axis=-1)


def cont6d_to_matrix(c6d: Array, eps: float = 0.0) -> Array:
    """6D (column) representation to rotation matrix.

    Column convention with cross-product completion - matches the FK path of
    the reference (quaternion.py:337-353), NOT the row-wise Gram-Schmidt of
    the rotation-loss path (see ops.rotation.rotation_6d_to_matrix).
    """
    x_raw = c6d[..., 0:3]
    y_raw = c6d[..., 3:6]
    # Smooth normalization: x * rsqrt(|x|^2 + eps'^2) instead of the
    # reference's x / (|x| + eps) — the latter's backward is nan at |x|==0
    # (norm grad is 0/0) and explodes near it, which a raw decoder output
    # can hit under TPU matmul rounding. Identical to f32 resolution for
    # any non-degenerate input; eps' floors at 1e-6 to bound the gradient.
    eps_eff = max(float(eps), 1e-6)
    def _nrm(v):
        n2 = jnp.sum(v * v, axis=-1, keepdims=True)
        return v * jax.lax.rsqrt(n2 + eps_eff * eps_eff)
    x = _nrm(x_raw)
    z = _nrm(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def qpow(q0: Array, t: Array | float) -> Array:
    """Raise unit quaternion(s) to power(s) t. If t is an array, the result
    has shape t.shape + q0.shape (reference semantics)."""
    q0 = qnormalize(q0)
    theta0 = jnp.arccos(jnp.clip(q0[..., 0], -1.0, 1.0))
    theta0 = jnp.where(jnp.abs(theta0) <= 1e-9, 1e-9, theta0)
    v0 = q0[..., 1:] / jnp.sin(theta0)[..., None]
    t_arr = jnp.asarray(t)
    theta = t_arr.reshape(t_arr.shape + (1,) * theta0.ndim) * theta0
    w = jnp.cos(theta)[..., None]
    xyz = jnp.broadcast_to(v0, theta.shape + (3,)) * jnp.sin(theta)[..., None]
    return jnp.concatenate([w, xyz], axis=-1)


def qslerp(q0: Array, q1: Array, t: Array) -> Array:
    """Spherical interpolation from q0 to q1 at points t."""
    q0 = qnormalize(q0)
    q1 = qnormalize(q1)
    q_ = qpow(qmul(q1, qinv(q0)), t)
    return qmul(q_, jnp.broadcast_to(q0, q_.shape))


def qbetween(v0: Array, v1: Array) -> Array:
    """Quaternion rotating v0 onto v1 (shortest arc)."""
    v = jnp.cross(v0, v1)
    w = jnp.sqrt(
        jnp.sum(v0 * v0, axis=-1, keepdims=True)
        * jnp.sum(v1 * v1, axis=-1, keepdims=True)
    ) + jnp.sum(v0 * v1, axis=-1, keepdims=True)
    return qnormalize(jnp.concatenate([w, v], axis=-1))


def lerp(p0: Array, p1: Array, t: Array | float) -> Array:
    t_arr = jnp.asarray(t)
    t_b = t_arr.reshape(t_arr.shape + (1,) * p0.ndim)
    return p0 + t_b * (p1 - p0)


def yaw_quat(yaw: Array) -> Array:
    """Quaternion for rotation about +z by ``yaw`` radians.

    Used by the midfwd alignment (dataset.py:405-413 builds it via
    fwd_qtn[:, [-1, 0]] = [sin(yaw/2), cos(yaw/2)]).
    """
    half = 0.5 * yaw
    zeros = jnp.zeros_like(yaw)
    return jnp.stack([jnp.cos(half), zeros, zeros, jnp.sin(half)], axis=-1)

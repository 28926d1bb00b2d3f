"""Skeleton kinematics in pure JAX, vectorized for TPU.

Semantics-parity with the reference kinematics
(/root/reference/src/scrubvae/data/dataset.py:11-116, 134-309) but re-designed
for XLA instead of translated:

* The reference walks each kinematic chain in a Python loop of sequential
  quaternion/matrix products (dataset.py:35-44, 97-116). Here the tree is
  compiled once into flat ``pos_parent``/``rot_parent`` index arrays plus a
  level (topological-depth) grouping, so FK is <= depth (4) steps of batched
  3x3 matmuls over *all* joints at a level, and IK is fully closed-form
  parallel over joints (the reference's cumulative product telescopes:
  the accumulated chain rotation at joint j is exactly
  ``qbetween(offset_dir_j, bone_dir_j)``, so locals need only one gather).

* Note the reference's chain convention: the first link of every chain
  composes its rotation directly with the *root* rotation (dataset.py:36,99
  re-initialize R to the root's rotation per chain), while positions chain
  from the previous joint. ``rot_parent`` / ``pos_parent`` encode exactly
  that (they differ for chain heads like TailBase-rooted legs).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from scrubvae_tpu.ops import quaternion as qtn

__all__ = [
    "KinematicTree",
    "inv_kin",
    "fwd_kin_cont6d",
    "segment_lengths",
    "speed_parts",
    "frame_yaw",
    "angle2D",
    "angle_from_2D",
    "normalize_root",
    "inv_normalize_root",
]


@dataclasses.dataclass(frozen=True)
class KinematicTree:
    """Compiled form of a chain-list kinematic tree.

    Attributes
    ----------
    chains: the original chain list (kept for serialization/debug).
    offsets: (J, 3) unit offset directions from the skeleton config.
    pos_parent: (J,) index of the position parent (previous joint in chain).
    rot_parent: (J,) index of the rotation parent (root for chain heads).
    levels: per-depth tuples of joint indices (root excluded).
    """

    chains: tuple
    offsets: np.ndarray
    pos_parent: np.ndarray
    rot_parent: np.ndarray
    levels: tuple

    @property
    def n_joints(self) -> int:
        return len(self.offsets)

    @staticmethod
    def build(chains: Sequence[Sequence[int]], offsets) -> "KinematicTree":
        offsets = np.asarray(offsets, dtype=np.float32)
        n = len(offsets)
        pos_parent = np.full(n, -1, dtype=np.int32)
        rot_parent = np.full(n, -1, dtype=np.int32)
        for chain in chains:
            for i in range(1, len(chain)):
                pos_parent[chain[i]] = chain[i - 1]
                # First link of each chain composes with the root rotation
                # (reference dataset.py:36,99), deeper links with the previous
                # joint's accumulated rotation.
                rot_parent[chain[i]] = 0 if i == 1 else chain[i - 1]
        depth = np.zeros(n, dtype=np.int32)
        for chain in chains:
            for i in range(1, len(chain)):
                j = chain[i]
                depth[j] = (
                    max(
                        depth[pos_parent[j]],
                        depth[rot_parent[j]] if rot_parent[j] >= 0 else 0,
                    )
                    + 1
                )
        levels = []
        for d in range(1, int(depth.max()) + 1 if n > 1 else 1):
            idx = np.nonzero(depth == d)[0]
            if len(idx):
                levels.append(tuple(int(i) for i in idx))
        return KinematicTree(
            chains=tuple(tuple(int(j) for j in c) for c in chains),
            offsets=offsets,
            pos_parent=pos_parent,
            rot_parent=rot_parent,
            levels=tuple(levels),
        )


def inv_kin(
    pose: Array,
    tree: KinematicTree,
    forward_indices: Sequence[int] = (0, 1),
) -> Array:
    """Pose (..., J, 3) -> local joint quaternions (..., J, 4).

    Matches reference ``inv_kin`` (dataset.py:11-46) minus its first-frame
    root-identity quirk (dataset.py:33 overwrites only flat sample 0 - a bug
    we intentionally do not replicate).
    """
    fwd = pose[..., forward_indices[1], :] - pose[..., forward_indices[0], :]
    fwd = fwd / jnp.linalg.norm(fwd, axis=-1, keepdims=True)
    target = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0], dtype=pose.dtype), fwd.shape
    )
    root_quat = qtn.qbetween(fwd, target)

    pos_parent = jnp.asarray(tree.pos_parent)
    offsets = jnp.asarray(tree.offsets, dtype=pose.dtype)

    # Bone directions (children only; root slot is arbitrary and masked).
    parent_pos = jnp.take(pose, jnp.maximum(pos_parent, 0), axis=-2)
    bone = pose - parent_pos
    bone = bone / jnp.maximum(
        jnp.linalg.norm(bone, axis=-1, keepdims=True), 1e-12
    )
    g = qtn.qbetween(jnp.broadcast_to(offsets, pose.shape), bone)
    # Global accumulated rotation per joint: chain telescoping makes it g_j;
    # the root's is root_quat.
    g = g.at[..., 0, :].set(root_quat)

    rot_parent = jnp.asarray(np.maximum(tree.rot_parent, 0))
    g_parent = jnp.take(g, rot_parent, axis=-2)
    local = qtn.qmul(qtn.qinv(g_parent), g)
    local = local.at[..., 0, :].set(root_quat)
    return local


def _mm3(A, B):
    """3x3 matrix product on plane-tuple rotations.

    A, B: nested 3x3 tuples of (N,) planes. Pure elementwise FMAs with no
    stack/concatenate inside, so XLA fuses the whole tree walk into a few
    large VPU fusions - tiny batched 3x3 matmuls would pad each matrix
    toward an (8, 128) tile, and jnp.stack between joints acts as a fusion
    barrier (measured as ~140 standalone mul ops per step)."""
    return tuple(
        tuple(
            A[a][0] * B[0][b] + A[a][1] * B[1][b] + A[a][2] * B[2][b]
            for b in range(3)
        )
        for a in range(3)
    )


def _mv3(A, v):
    """Plane-tuple 3x3 rotation applied to a 3-tuple of (N,)/(1,) planes."""
    return tuple(
        A[a][0] * v[0] + A[a][1] * v[1] + A[a][2] * v[2] for a in range(3)
    )


def fwd_kin_cont6d(
    cont6d: Array,
    tree: KinematicTree,
    offsets: Array,
    root_pos: Array,
    do_root_R: bool = True,
    eps: float = 0.0,
) -> Array:
    """Forward kinematics from cont6d rotations.

    cont6d: (..., J, 6); offsets: (J, 3) or (..., J, 3); root_pos: (..., 3).
    Returns joint positions (..., J, 3).

    Matches reference ``fwd_kin_cont6d_torch`` (dataset.py:83-116), but in a
    TPU-native structure-of-arrays layout: all per-joint quantities are
    (3, 3, N) / (3, N) planes with the flattened batch N in the trailing
    (lane) dimension, and the tree walk is unrolled over the 17 static
    joints. No gathers, no scatters, no (..., 3, 3)-trailing tensors - this
    is the hot differentiable op of the jpe loss (76% of the fused step
    before this layout; see tools/attr_bench.py).
    """
    batch_shape = cont6d.shape[:-2]
    J = cont6d.shape[-2]
    xs = jnp.moveaxis(cont6d.reshape((-1, J, 6)), 0, -1)  # (J, 6, N)
    N = xs.shape[-1]

    # cont6d -> rotation, column convention (qtn.cont6d_to_matrix
    # semantics), held as per-joint 3x3 tuples of (N,) planes.
    # Normalization is the smooth rsqrt(|v|^2 + eps'^2) form: sqrt's
    # gradient is nan at an exact zero vector and explodes near it, which
    # raw decoder outputs hit under TPU matmul rounding (this op runs
    # inside the differentiable jpe loss - see ops.rotation._smooth_normalize).
    eps_eff = max(float(eps), 1e-6)

    def _joint_R(j):
        xr = [xs[j, i] for i in range(3)]
        yr = [xs[j, 3 + i] for i in range(3)]
        rx = jax.lax.rsqrt(
            xr[0] * xr[0] + xr[1] * xr[1] + xr[2] * xr[2] + eps_eff * eps_eff
        )
        cx = [v * rx for v in xr]
        zr = [
            cx[1] * yr[2] - cx[2] * yr[1],
            cx[2] * yr[0] - cx[0] * yr[2],
            cx[0] * yr[1] - cx[1] * yr[0],
        ]
        rz = jax.lax.rsqrt(
            zr[0] * zr[0] + zr[1] * zr[1] + zr[2] * zr[2] + eps_eff * eps_eff
        )
        cz = [v * rz for v in zr]
        cy = [
            cz[1] * cx[2] - cz[2] * cx[1],
            cz[2] * cx[0] - cz[0] * cx[2],
            cz[0] * cx[1] - cz[1] * cx[0],
        ]
        # rows a, columns (cx | cy | cz)
        return tuple((cx[a], cy[a], cz[a]) for a in range(3))

    R = [_joint_R(j) for j in range(J)]

    # offsets to per-joint 3-tuples of planes
    if offsets.ndim == 2:
        offs_arr = jnp.asarray(offsets, dtype=cont6d.dtype)
        offs = [tuple(offs_arr[j, i][None] for i in range(3)) for j in range(J)]
    else:
        o = jnp.moveaxis(offsets.reshape((-1, J, 3)), 0, -1)  # (J, 3, N)
        offs = [tuple(o[j, i] for i in range(3)) for j in range(J)]

    root_soa = jnp.moveaxis(root_pos.reshape((-1, 3)), 0, -1)  # (3, N)

    Rg: list = [None] * J
    pos: list = [None] * J
    if do_root_R:
        Rg[0] = R[0]
    else:
        one = jnp.ones((N,), dtype=cont6d.dtype)
        zero = jnp.zeros((N,), dtype=cont6d.dtype)
        Rg[0] = tuple(
            tuple(one if a == b else zero for b in range(3)) for a in range(3)
        )
    pos[0] = (root_soa[0], root_soa[1], root_soa[2])

    for level in tree.levels:
        for j in level:
            rp = int(tree.rot_parent[j])
            pp = int(tree.pos_parent[j])
            Rg[j] = _mm3(Rg[rp], R[j])
            rv = _mv3(Rg[j], offs[j])
            pos[j] = tuple(pos[pp][i] + rv[i] for i in range(3))

    # single stack at the very end: (J, 3, N) -> (..., J, 3)
    out = jnp.stack(
        [jnp.stack(jnp.broadcast_arrays(*p), axis=0) for p in pos], axis=0
    )
    return jnp.moveaxis(out, -1, 0).reshape(batch_shape + (J, 3))


def segment_lengths(pose: Array, tree: KinematicTree) -> Array:
    """Per-frame offsets scaled by observed segment lengths.

    pose (..., J, 3) -> (..., J, 3); matches reference ``get_segment_len``
    (dataset.py:279-296): offset_j * ||pose_j - pose_parent_j|| (root stays 0).
    """
    pos_parent = jnp.asarray(np.maximum(tree.pos_parent, 0))
    parent_pos = jnp.take(pose, pos_parent, axis=-2)
    seg = jnp.linalg.norm(pose - parent_pos, axis=-1, keepdims=True)
    offsets = jnp.asarray(tree.offsets, dtype=pose.dtype)
    mask = jnp.asarray(tree.pos_parent >= 0, dtype=pose.dtype)[..., None]
    return offsets * seg * mask + offsets * (1.0 - mask)


def speed_parts(
    pose: Array,
    parts: Sequence[Sequence[int]],
    true_part_centering: bool = False,
) -> Array:
    """Average root / per-part relative speeds over a window.

    pose: (N, W, J, 3). Returns (N, len(parts)+1); column 0 is the mean root
    displacement per frame, column i+1 the mean relative keypoint speed of
    ``parts[i][1:]`` (reference ``get_speed_parts``, dataset.py:134-163).

    Default is reference-EXACT semantics: the reference's part-centering
    line (dataset.py:149-151) indexes ``centered_pose[:, p:p+1, :]`` — the
    WINDOW axis, not the joint axis — which broadcasts a per-window
    constant that ``np.diff`` over frames cancels, so its "relative to
    part root" speeds are in fact all root-centered. The hardcoded
    avg_speed_3d normalization stats (get/data.py:58-67) were fit on those
    values, so parity requires replicating them (found by the end-to-end
    composition differential, tests/test_preprocess_composition.py).
    ``true_part_centering=True`` opts into the intended semantics
    (subtract the part-root JOINT before differencing) — a documented
    deviation (PARITY.md), config gate ``data.part_centered_speed``.
    """
    root_d = jnp.diff(pose[..., 0, :], n=1, axis=-2)
    root_spd = jnp.sqrt(jnp.sum(root_d**2, axis=-1)).mean(axis=-1)
    cols = [root_spd]
    centered = pose - pose[..., 0:1, :]
    for part in parts:
        if true_part_centering and part[0] != 0:
            pose_part = centered - centered[..., part[0] : part[0] + 1, :]
        else:
            pose_part = centered
        rel = jnp.diff(pose_part[..., list(part[1:]), :], n=1, axis=-3)
        rel = jnp.sqrt(jnp.sum(rel**2, axis=-1))
        cols.append(rel.mean(axis=(-1, -2)))
    return jnp.stack(cols, axis=-1)


def frame_yaw(pose: Array, root_i: int = 0, front_i: int = 1) -> Array:
    """Yaw (radians) of the root->front segment (dataset.py:236-243)."""
    fwd = pose[..., front_i, :] - pose[..., root_i, :]
    fwd = fwd / jnp.linalg.norm(fwd, axis=-1, keepdims=True)
    return -jnp.arctan2(fwd[..., 1], fwd[..., 0])


def angle2D(angle: Array) -> Array:
    """Radians (..., K) -> interleaved [sin, cos] pairs (..., 2K)."""
    out = jnp.stack([jnp.sin(angle), jnp.cos(angle)], axis=-1)
    return out.reshape(angle.shape[:-1] + (-1,))


def angle_from_2D(a2d: Array) -> Array:
    pairs = a2d.reshape(a2d.shape[:-1] + (-1, 2))
    return jnp.arctan2(pairs[..., 0], pairs[..., 1])


def normalize_root(root: Array, arena_size: Array) -> Array:
    """Map arena coordinates into (-1, 1) (dataset.py:119-125)."""
    lo, hi = arena_size[0], arena_size[1]
    return 2.0 * (root - lo) / (hi - lo) - 1.0


def inv_normalize_root(norm_root: Array, arena_size: Array) -> Array:
    lo, hi = arena_size[0], arena_size[1]
    return 0.5 * (norm_root + 1.0) * (hi - lo) + lo

"""Device-resident preprocessing pipeline.

The reference preprocesses on host into fully materialized window tensors
(data/dataset.py:313-454; each sample an independent (W, J, *) copy - a ~25x
memory blowup at stride 2) and feeds them through a 5-worker DataLoader.
Here the design is TPU-native:

* **Per-frame stage** (once, jitted): IK to local quaternions, per-frame
  segment-length offsets, per-frame yaw - all window-independent, so they are
  computed per *frame*, ~window/stride times cheaper than the reference.
* **Frame store**: the per-frame arrays live in HBM.
* **Per-window stage** (inside the jitted train step): gather (B, W) frame
  indices, apply mid-frame centering + midfwd/x360 alignment, quat->cont6d,
  target-pose FK, windowed speed features. Everything fuses into the step;
  the input pipeline never stalls the device.

A ``materialize`` helper runs the same per-window stage over all windows in
chunks to produce reference-layout arrays (for parity tests, h5 export, and
the offline eval path).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from scrubvae_tpu.data.skeleton import Skeleton
from scrubvae_tpu.data.windows import speed_outlier_mask, window_starts
from scrubvae_tpu.ops import kinematics as kin
from scrubvae_tpu.ops import quaternion as qtn

__all__ = ["FrameStore", "build_frame_store", "assemble_windows", "materialize"]

SPEED_PARTS = (
    (0, 1, 2, 3, 4, 5),  # spine and head
    (1, 6, 7, 8, 9, 10, 11),  # arms from front spine
    (5, 12, 13, 14, 15, 16, 17),  # legs from back spine
)

# Reference-dataset normalization stats (get/data.py:58-67). Overridable per
# dataset via FrameStore.norm_params.
AVG_SPEED_3D_MEAN = (0.4993, 0.7112, 0.6663)
AVG_SPEED_3D_STD = (0.4038, 0.3586, 0.4169)


@dataclasses.dataclass
class FrameStore:
    """HBM-resident per-frame arrays + window start indices.

    ``x6d`` / ``tpose`` are optional per-frame precomputes: the cont6d
    representation and the zero-root forward kinematics are window-independent
    except for the mid-frame yaw alignment, which acts as (a) a quaternion
    pre-multiply on the root row and (b) a rigid rotation of the FK pose —
    both exact algebra, applied per window after the gather. Precomputing
    them removes the per-step FK + full cont6d conversion from the train
    step (~650B/frame of extra HBM)."""

    pose: Array  # (T, J, 3) raw pose
    local_quat: Array  # (T, J, 4) per-frame IK
    offsets: Array  # (T, J, 3) per-frame scaled offsets
    yaw: Array  # (T,) per-frame root yaw
    ids: Array  # (T,) animal id per frame
    starts: Array  # (N,) window start frames
    window: int
    mid_ids: Array  # (N,) id at window mid frame
    norm_params: Dict[str, Dict[str, Array]]
    x6d: Optional[Array] = None  # (T, J, 6) cont6d of local_quat
    tpose: Optional[Array] = None  # (T, J, 3) zero-root FK per frame
    # intended-semantics part-root centering for the windowed speed
    # features (deviation gate data.part_centered_speed; default is the
    # reference's no-op centering — see ops.kinematics.speed_parts)
    part_centered_speed: bool = False

    @property
    def n_windows(self) -> int:
        return int(self.starts.shape[0])


def build_frame_store(
    pose: np.ndarray,
    ids: np.ndarray,
    skeleton: Skeleton,
    window: int = 51,
    stride: int = 2,
    speed_threshold: Optional[float] = 2.25,
    norm_params: Optional[dict] = None,
    precompute: bool = True,
    exact_offsets: bool = False,
    part_centered_speed: bool = False,
) -> FrameStore:
    """Per-frame preprocessing + window index build.

    Mirrors the front half of reference preprocess_save_data
    (dataset.py:313-454) with IK at frame granularity. ``precompute``
    additionally stores per-frame cont6d + zero-root FK (see FrameStore).

    ``exact_offsets``/``part_centered_speed`` are documented-deviation
    gates (PARITY.md): by default the reference's integer-truncated
    scaled offsets (when the skeleton yaml is integer-valued, see
    Skeleton.int_offsets) and its no-op speed part-centering are
    replicated exactly; the gates opt into the intended semantics.
    """
    tree = skeleton.tree
    # reference get_segment_len keeps the yaml OFFSET dtype through the
    # scaled assignment — integer yaml => values truncated toward zero
    truncate_offsets = skeleton.int_offsets and not exact_offsets
    starts = window_starts(ids, stride, window)
    if speed_threshold is not None:
        keep = speed_outlier_mask(pose, starts, window, speed_threshold)
        starts = starts[keep]

    pose_j = jnp.asarray(pose, dtype=jnp.float32)

    @jax.jit
    def per_frame(p):
        local_q = kin.inv_kin(p, tree, forward_indices=[1, 0])
        offs = kin.segment_lengths(p, tree)
        if truncate_offsets:
            offs = jnp.trunc(offs)
        yaw = kin.frame_yaw(p, 0, 1)
        extra = {}
        if precompute:
            extra["x6d"] = qtn.quaternion_to_cont6d(local_q)
            extra["tpose"] = kin.fwd_kin_cont6d(
                extra["x6d"],
                tree,
                offs,
                root_pos=jnp.zeros(p.shape[:-2] + (3,), dtype=p.dtype),
                do_root_R=True,
                eps=1e-8,
            )
        return local_q, offs, yaw, extra

    local_quat, offsets, yaw, extra = per_frame(pose_j)

    if norm_params is None:
        norm_params = {
            "avg_speed_3d": {
                "mean": jnp.asarray(AVG_SPEED_3D_MEAN),
                "std": jnp.asarray(AVG_SPEED_3D_STD),
            }
        }

    starts_j = jnp.asarray(starts)
    ids_j = jnp.asarray(np.asarray(ids, dtype=np.int32))
    mid_ids = ids_j[starts_j + window // 2]
    return FrameStore(
        pose=pose_j,
        local_quat=local_quat,
        offsets=offsets,
        yaw=yaw,
        ids=ids_j,
        starts=starts_j,
        window=window,
        mid_ids=mid_ids,
        norm_params=norm_params,
        x6d=extra.get("x6d"),
        tpose=extra.get("tpose"),
        part_centered_speed=part_centered_speed,
    )


def assemble_windows(
    store: FrameStore,
    tree: kin.KinematicTree,
    start_idx: Array,
    data_keys: Sequence[str],
    direction_process: str = "midfwd",
) -> Dict[str, Array]:
    """Per-window stage: gather + align + represent. Pure and jit-traceable;
    called inside the train step with the batch's window indices.

    Matches the back half of reference preprocess_save_data
    (dataset.py:376-449): mid-frame xy centering, midfwd half-yaw rotation of
    root quaternion and root trajectory, cont6d conversion, zero-root
    target-pose FK, windowed speed features, mid-frame heading.
    """
    W = store.window
    fidx = start_idx[:, None] + jnp.arange(W, dtype=start_idx.dtype)[None, :]
    mid = start_idx + W // 2
    out: Dict[str, Array] = {}

    need_pose = any(
        k in data_keys for k in ("avg_speed_3d", "raw_pose", "x6d_enc")
    )
    pose_w = jnp.take(store.pose, fidx, axis=0) if need_pose else None

    yaw_mid = jnp.take(store.yaw, mid, axis=0)  # (B,)

    if "heading" in data_keys:
        out["heading"] = kin.angle2D(yaw_mid[:, None])

    if "avg_speed_3d" in data_keys:
        spd = kin.speed_parts(pose_w, SPEED_PARTS, store.part_centered_speed)
        avg3 = jnp.concatenate(
            [spd[:, :2], spd[:, 2:].mean(axis=-1, keepdims=True)], axis=-1
        )
        np_ = store.norm_params.get("avg_speed_3d")
        if np_ is not None:
            avg3 = (avg3 - np_["mean"]) / np_["std"]
        out["avg_speed_3d"] = avg3

    # Structural factor exclusion (demo of the conditional-decode contract):
    # "x6d_enc"/"root_enc" are a heading-FREE view of the same window,
    # produced alongside an absolute (x360) target, so the decoder can only
    # recover the target's orientation from the conditional heading input.
    # NOTE x6d_enc is NOT the midfwd x6d: the shared IK parametrizes every
    # child joint as qbetween(canonical offset, world bone) — a minimal
    # rotation that is NOT yaw-equivariant, so midfwd x6d still encodes
    # absolute heading redundantly across all limb rows (measured: mean
    # |Δcont6d| 0.38 under a global 90° yaw; the reference inv_kin,
    # dataset.py:11-46, shares this). The enc view therefore rotates the
    # POSE into the mid-frame heading frame first and re-runs IK on the
    # aligned pose — exactly invariant by construction. No reference
    # counterpart (its encoder/target always share one representation).
    want_enc = "x6d_enc" in data_keys or "root_enc" in data_keys

    if (
        "root" in data_keys or "x6d" in data_keys or "target_pose" in data_keys
        or want_enc
    ):
        root = jnp.take(store.pose[:, 0, :], fidx, axis=0)  # (B, W, 3)
        if direction_process in ("midfwd", "x360"):
            center = jnp.take(store.pose[:, 0, :], mid, axis=0)
            center = center.at[:, 2].set(0.0)  # only xy centering
            root = root - center[:, None, :]

        midfwd = direction_process == "midfwd"
        need_q = midfwd or want_enc
        fwd_q = qtn.yaw_quat(yaw_mid)[:, None, :] if need_q else None  # (B,1,4)
        if want_enc and "root_enc" in data_keys:
            out["root_enc"] = qtn.qrot(
                jnp.broadcast_to(fwd_q, root.shape[:-1] + (4,)), root
            )
        if want_enc and "x6d_enc" in data_keys:
            # Rotate the whole pose window into the mid-frame heading frame,
            # THEN run IK: exactly heading-invariant (see note above).
            pw = pose_w - jnp.take(store.pose[:, 0, :], mid, axis=0)[
                :, None, None, :
            ]
            pw = qtn.qrot(
                jnp.broadcast_to(fwd_q[:, :, None, :], pw.shape[:-1] + (4,)), pw
            )
            out["x6d_enc"] = qtn.quaternion_to_cont6d(
                kin.inv_kin(pw, tree, forward_indices=[1, 0])
            )
        if midfwd:
            root = qtn.qrot(jnp.broadcast_to(fwd_q, root.shape[:-1] + (4,)), root)

        if store.x6d is not None:
            # Fast path: per-frame cont6d gathered from HBM; only the root
            # row depends on the window (fwd_q premultiply = exact algebra).
            x6d = jnp.take(store.x6d, fidx, axis=0)  # (B, W, J, 6)
            if midfwd:
                root_lq = jnp.take(store.local_quat[:, 0, :], fidx, axis=0)
                root_q = qtn.qmul(
                    jnp.broadcast_to(fwd_q, root_lq.shape), root_lq
                )
                x6d = x6d.at[..., 0, :].set(qtn.quaternion_to_cont6d(root_q))
        else:
            local_q = jnp.take(store.local_quat, fidx, axis=0)  # (B, W, J, 4)
            if midfwd:
                root_q = qtn.qmul(
                    jnp.broadcast_to(fwd_q, local_q[..., 0, :].shape),
                    local_q[..., 0, :],
                )
                local_q = local_q.at[..., 0, :].set(root_q)
            x6d = qtn.quaternion_to_cont6d(local_q)

        if "x6d" in data_keys:
            out["x6d"] = x6d
        if "root" in data_keys:
            out["root"] = root

        offs = jnp.take(store.offsets, fidx, axis=0)
        if "offsets" in data_keys:
            out["offsets"] = offs

        if "target_pose" in data_keys:
            B = x6d.shape[0]
            J = x6d.shape[2]
            if store.tpose is not None:
                # Zero-root FK is window-independent up to the rigid fwd_q
                # rotation (root translation is zero, so the yaw alignment
                # rotates every joint position identically).
                tp = jnp.take(store.tpose, fidx, axis=0)  # (B, W, J, 3)
                if midfwd:
                    tp = qtn.qrot(
                        jnp.broadcast_to(fwd_q[:, :, None, :], tp.shape[:-1] + (4,)),
                        tp,
                    )
                out["target_pose"] = tp
            else:
                out["target_pose"] = kin.fwd_kin_cont6d(
                    x6d.reshape(-1, J, 6),
                    tree,
                    offs.reshape(-1, J, 3),
                    root_pos=jnp.zeros((B * W, 3), dtype=x6d.dtype),
                    do_root_R=True,
                    eps=1e-8,
                ).reshape(B, W, J, 3)
    elif "offsets" in data_keys:
        out["offsets"] = jnp.take(store.offsets, fidx, axis=0)

    if "raw_pose" in data_keys:
        out["raw_pose"] = pose_w

    if "ids" in data_keys:
        out["ids"] = jnp.take(store.ids, mid, axis=0)

    return out


def materialize(
    store: FrameStore,
    tree: kin.KinematicTree,
    data_keys: Sequence[str],
    direction_process: str = "midfwd",
    chunk: int = 4096,
) -> Dict[str, np.ndarray]:
    """Run the per-window stage over every window (chunked) and return
    reference-layout numpy arrays - the materialized path used for parity
    tests and h5 export."""
    fn = jax.jit(
        lambda idx: assemble_windows(
            store, tree, idx, tuple(data_keys), direction_process
        )
    )
    n = store.n_windows
    outs: Dict[str, list] = {}
    for lo in range(0, n, chunk):
        idx = store.starts[lo : lo + chunk]
        res = fn(idx)
        for k, v in res.items():
            outs.setdefault(k, []).append(np.asarray(v))
    return {k: np.concatenate(v, axis=0) for k, v in outs.items()}

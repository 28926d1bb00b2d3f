"""Generative restrictiveness: randomize a conditioned factor, decode with
the same latent, re-measure the factor from the generated pose
(/root/reference/src/scrubvae/eval/eval.py:22-120). Pure JAX; jittable.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from scrubvae_tpu.ops import kinematics as kin

__all__ = ["generative_restrictiveness_batch"]

# Reference's hardcoded speed jitter stats/clamps (eval/eval.py:41-56).
SPD_STD = (0.4038, 0.3586, 0.4169)
SPD_MIN = (-1.2323, -1.9734, -1.5858)
SPD_MAX = (4.6167, 4.6437, 4.2551)
SPEED_PARTS = (
    (0, 1, 2, 3, 4, 5),
    (1, 6, 7, 8, 9, 10, 11),
    (5, 12, 13, 14, 15, 16, 17),
)


def generative_restrictiveness_batch(
    model,
    variables,
    z: Array,
    data: Dict[str, Array],
    key: str,
    tree,
    rng: Array,
    norm_params: Optional[dict] = None,
):
    """Returns (pred, target) for the given factor key."""
    B, W, J = data["x6d"].shape[0], data["x6d"].shape[1], data["x6d"].shape[2]
    data = dict(data)
    var_true = data[key]

    if key == "heading":
        rand_yaw = (jax.random.uniform(rng, (B, 1)) * 2.0 - 1.0) * jnp.pi
        data["heading"] = jnp.concatenate(
            [jnp.sin(rand_yaw), jnp.cos(rand_yaw)], axis=-1
        )
    elif key == "avg_speed_3d":
        spd_std = jnp.asarray(SPD_STD)
        jitter = jax.random.normal(rng, (B, 1)) * spd_std * 1.5 + 0.5
        data["avg_speed_3d"] = jnp.clip(
            var_true + jitter, jnp.asarray(SPD_MIN), jnp.asarray(SPD_MAX)
        )
    else:
        raise ValueError(f"unsupported factor {key!r}")

    out = model.apply(
        {k: v for k, v in variables.items() if v is not None},
        z,
        data,
        train=False,
        method=model.decode,
    )

    pose = kin.fwd_kin_cont6d(
        out["x6d"].reshape(-1, J, 6),
        tree,
        data["offsets"].reshape(-1, J, 3),
        root_pos=out["root"].reshape(-1, 3),
        do_root_R=True,
        eps=1e-8,
    ).reshape(B, W, J, 3)

    if key == "heading":
        fwd = pose[:, W // 2, 1, :] - pose[:, W // 2, 0, :]
        fwd = fwd / jnp.linalg.norm(fwd, axis=-1, keepdims=True)
        yaw = -jnp.arctan2(fwd[:, 1], fwd[:, 0])[:, None]
        pred = jnp.concatenate([jnp.sin(yaw), jnp.cos(yaw)], axis=-1)
    else:  # avg_speed_3d
        root_d = jnp.diff(pose[:, :, 0, :], n=1, axis=-2)
        root_spd = jnp.sqrt((root_d**2).sum(-1)).mean(-1)
        cols = []
        for part in SPEED_PARTS:
            # Reference centers on the *mid-frame* part-root here
            # (eval/eval.py:86-98), unlike preprocessing.
            center = pose[:, W // 2, part[0], :][:, None, None, :]
            pp = pose - center
            rel = jnp.diff(pp[..., list(part[1:]), :], n=1, axis=-3)
            cols.append(jnp.sqrt((rel**2).sum(-1)).mean(axis=(-1, -2)))
        dxyz = jnp.stack(cols, axis=-1)
        pred = jnp.concatenate(
            [
                root_spd[:, None],
                dxyz[:, 0:1],
                dxyz[:, 1:].mean(axis=-1, keepdims=True),
            ],
            axis=-1,
        )
        np_ = (norm_params or {}).get("avg_speed_3d")
        if np_ is not None:
            pred = (pred - jnp.asarray(np_["mean"])) / jnp.asarray(np_["std"])

    return pred, data[key]

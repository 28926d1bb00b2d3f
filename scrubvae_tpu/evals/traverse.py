"""Latent traversal visualization and null-space analysis
(/root/reference/src/scrubvae/eval/eval.py:14-19, 123-243): shift a latent
along a linear decoder's weight direction (or around a circle for heading),
decode, forward-kinematics, render grid/arena videos and static traces.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scrubvae_tpu.ops import kinematics as kin

__all__ = ["project_to_null", "traverse_latent"]


def project_to_null(z: np.ndarray, weight: np.ndarray):
    """Project latents onto the null space of a linear decoder weight
    (reference eval/eval.py:14-19)."""
    import scipy.linalg as spl

    u_orth = spl.null_space(weight)
    return np.asarray(z) @ u_orth, u_orth


def traverse_latent(
    model,
    variables,
    dataset,
    z: np.ndarray,
    weight: np.ndarray,
    index: int,
    label: str = "",
    minmax: float = 10.0,
    n_shifts: int = 15,
    grid_vis: bool = True,
    arena_vis: bool = True,
    static_vis: bool = False,
    circle: bool = False,
    save_path: str = "./",
    sample_index: int = 1000,
):
    """Decode a sweep of shifted latents and render videos/traces.

    Returns the generated poses (n_shifts*window, J, 3) alongside writing
    any requested visualizations.
    """
    from scrubvae_tpu.plot import trace as plot_trace
    from scrubvae_tpu.plot.constants import PLANE
    from scrubvae_tpu.plot import pose_viz

    window = model.vae.window if hasattr(model, "vae") else model.window
    n_keypts = dataset.n_keypts
    z = np.asarray(z)
    weight = np.asarray(weight)

    if circle:
        linspace = np.linspace(-np.pi, np.pi, n_shifts)[:, None]
        circ = np.concatenate([np.sin(linspace), np.cos(linspace)], axis=-1)
        radius = np.linalg.norm(z[index : index + 1] @ weight.T)
        z_null_proj = weight.T @ np.linalg.solve(
            weight @ weight.T, weight @ z[index : index + 1].T
        )
        circle_z = circ @ weight
        circle_z = (
            circle_z / np.linalg.norm(circle_z, axis=-1, keepdims=True) * radius
        )
        sample_latent = z[index : index + 1] - z_null_proj.T + circle_z
    else:
        graded = np.linspace(-minmax, minmax, n_shifts)[:, None] @ weight.sum(
            axis=0, keepdims=True
        )
        sample_latent = np.repeat(z[index : index + 1], n_shifts, axis=0) + graded

    sample_idx = np.full(n_shifts, min(sample_index, len(dataset) - 1))
    data = dataset.batch(jnp.asarray(sample_idx))
    out = model.apply(
        variables,
        jnp.asarray(sample_latent, dtype=jnp.float32),
        data,
        train=False,
        method=model.decode,
    )
    offsets = np.asarray(dataset.batch(jnp.asarray([index]))["offsets"])[0]

    pose = np.asarray(
        kin.fwd_kin_cont6d(
            out["x6d"].reshape(-1, n_keypts, 6),
            dataset.kinematic_tree,
            jnp.asarray(np.tile(offsets[None], (n_shifts, 1, 1, 1)).reshape(-1, n_keypts, 3)),
            root_pos=out["root"].reshape(-1, 3),
            do_root_R=True,
        )
    )

    subtitles = sample_latent @ weight.T
    if weight.shape[0] != 1:
        subtitles = [
            " ".join(f"{s:.2f}" for s in np.atleast_1d(row)) for row in subtitles
        ]
    else:
        subtitles = [f"{float(s):.2f}" for s in subtitles.squeeze()]

    if static_vis:
        for vis_plane in ["xz", "xy"]:
            pose_trans = pose.reshape(n_shifts, window, n_keypts, 3).copy()
            pose_trans[..., PLANE[vis_plane[-1]]] += (
                np.linspace(-20, 20, n_shifts) * n_shifts
            )[:, None, None]
            plot_trace(
                pose_trans.reshape(-1, n_keypts, 3),
                dataset.skeleton,
                frames=np.arange(n_shifts) * window,
                n_full_pose=3,
                vis_plane=vis_plane,
                centered=False,
                N_FRAMES=window,
                FIG_NAME=f"{dataset.label}_trace_{index}.png",
                SAVE_ROOT=save_path,
            )

    if grid_vis:
        pose_viz.grid3D(
            pose,
            dataset.skeleton,
            frames=np.arange(n_shifts) * window,
            centered=False,
            subtitles=subtitles,
            title=f"{dataset.label} Data - {label} Traversal",
            fps=15,
            N_FRAMES=window,
            VID_NAME=f"{dataset.label}_grid{index}_mod.mp4",
            SAVE_ROOT=save_path,
        )

    if arena_vis:
        pose_viz.arena3D(
            pose,
            dataset.skeleton,
            frames=np.arange(n_shifts) * window,
            centered=False,
            fps=15,
            N_FRAMES=window,
            VID_NAME=f"{dataset.label}_arena{index}_mod.mp4",
            SAVE_ROOT=save_path,
        )

    return pose

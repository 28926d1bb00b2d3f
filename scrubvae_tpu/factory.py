"""Factory layer: configs -> data, model, scrubber state.

Equivalent of the reference ``get`` package
(/root/reference/src/scrubvae/get/{get,model,data}.py) re-shaped for the
functional stack: builders return modules + explicit state pytrees instead of
mutated nn.Modules.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from scrubvae_tpu.data.dataset import StreamDataset, WindowDataset
from scrubvae_tpu.data.pipeline import build_frame_store
from scrubvae_tpu.data.pose_io import read_key_h5, read_pose_h5
from scrubvae_tpu.data.skeleton import Skeleton, load_skeleton
from scrubvae_tpu.models.mlp_vae import MLPVAE
from scrubvae_tpu.models.residual import ResVAE
from scrubvae_tpu.models.scrubvae import ScrubVAE
from scrubvae_tpu.models import scrubbers as scr

__all__ = [
    "feat_dims",
    "build_model",
    "init_scrub_state",
    "mouse_data",
    "data_and_model",
    "all_saved_epochs",
]


def feat_dims(model_config: dict, discrete_classes: Optional[dict] = None) -> dict:
    """Feature-name -> dimension map (reference get/model.py:19-31)."""
    window = model_config.get("window") or 51
    dims = {
        "avg_speed": 1,
        "part_speed": 4,
        "frame_speed": window - 1,
        "avg_speed_3d": 3,
        "heading": 2,
        "heading_change": 1,
        "fluorescence": 1,
    }
    if discrete_classes:
        dims.update({k: len(v) for k, v in discrete_classes.items()})
    return dims


def in_channels_for(n_keypts: int, direction_process: Optional[str]) -> int:
    """x6d channels (+3 root channels unless the representation drops the
    root; reference get/model.py:33-35)."""
    c = n_keypts * 6
    if direction_process in ("x360", "midfwd", None):
        c += 3
    return c


def build_model(
    model_config: dict,
    disentangle_config: dict,
    n_keypts: int,
    direction_process: Optional[str],
    arena_size=None,
    discrete_classes: Optional[dict] = None,
    loss_keys=None,
) -> tuple:
    """Construct the ScrubVAE flax module from config. Returns
    (module, info) where info carries conditional/disentangle metadata used
    by the trainer (reference get/model.py:4-151).

    loss_keys: the configured loss-weight keys, used to auto-enable the
    packed Cholesky head (models/layers.py packed_*) when no loss needs the
    materialized (B, z, z) factor; only total_correlation does. Explicit
    model.packed_sigma overrides; None (unknown) keeps the full path."""
    methods = disentangle_config.get("method") or {}
    fdims = feat_dims(model_config, discrete_classes)
    dc_sizes = {k: len(v) for k, v in (discrete_classes or {}).items()}

    conditional_keys = list(methods.get("conditional", []))
    conditional_dim = sum(fdims[k] for k in conditional_keys)

    in_ch = in_channels_for(n_keypts, direction_process)
    if in_ch > n_keypts * 6 and arena_size is None:
        # The reference couples these implicitly and crashes with a conv
        # shape error (get/model.py:33-35 adds the root channels per
        # direction_process; residual.py:439 only concatenates root when
        # arena_size is set). Fail fast with the actual cause instead.
        raise ValueError(
            f"direction_process={direction_process!r} includes the 3 root "
            "channels, which requires data.arena_size for root "
            "normalization - add arena_size to the config's data section"
        )
    common = dict(
        in_channels=in_ch,
        z_dim=model_config.get("z_dim") or 128,
        window=model_config.get("window") or 51,
        conditional_dim=conditional_dim,
        prior=model_config.get("prior") or "gaussian",
        arena_size=(
            tuple(map(tuple, np.asarray(arena_size).tolist()))
            if arena_size is not None
            else None
        ),
        conditional_keys=tuple(conditional_keys),
        discrete_classes=dc_sizes or None,
    )
    mtype = model_config.get("type") or "rcnn"
    packed = model_config.get("packed_sigma")
    if packed is None:
        packed = (
            loss_keys is not None
            and "total_correlation" not in set(loss_keys)
            and (model_config.get("prior") or "gaussian") == "gaussian"
        )
    if mtype == "rcnn":
        vae = ResVAE(
            ch=tuple(model_config.get("channel") or (64, 128, 256, 512, 1024)),
            kernel=model_config.get("kernel") or 5,
            activation=model_config.get("activation") or "prelu",
            is_diag=bool(model_config.get("diag")),
            init_dilation=model_config.get("init_dilation"),
            precision=model_config.get("precision") or "fp32",
            sigma_head_rank=model_config.get("sigma_head_rank"),
            packed_sigma=bool(packed),
            **common,
        )
    elif mtype == "transformer":
        from scrubvae_tpu.models.transformer import TransformerVAE

        vae = TransformerVAE(
            activation=model_config.get("activation") or "gelu",
            n_heads=model_config.get("n_heads") or 4,
            ff_size=model_config.get("ff_size") or 512,
            n_layers=model_config.get("n_layers") or 4,
            is_diag=bool(model_config.get("diag")),
            **{k: v for k, v in common.items()},
        )
    elif mtype == "mlp":
        vae = MLPVAE(
            hidden=tuple(model_config.get("hidden") or (512, 256)),
            is_diag=bool(model_config.get("diag", True)),
            **{
                k: v
                for k, v in common.items()
                if k not in ("init_dilation",)
            },
        )
    else:
        raise ValueError(f"unknown model type {mtype!r}")

    linear_dims = {k: fdims[k] for k in methods.get("linear", [])}
    gr_dims = {k: fdims[k] for k in methods.get("grad_reversal", [])}
    model = ScrubVAE(
        vae=vae,
        linear_dims=linear_dims,
        gr_dims=gr_dims,
        gr_alpha=float(disentangle_config.get("alpha") or 1.0),
    )
    info = dict(
        in_channels=in_ch,
        conditional_keys=conditional_keys,
        conditional_dim=conditional_dim,
        disentangle_keys=list(disentangle_config.get("features") or []),
        feat_dims=fdims,
        window=common["window"],
        z_dim=common["z_dim"],
    )
    return model, info


def init_scrub_state(
    rng,
    disentangle_config: dict,
    loss_config: dict,
    z_dim: int,
    fdims: dict,
    discrete_classes: Optional[dict] = None,
):
    """Initialize streaming scrubber states + adversarial nets per feature
    (reference get/model.py:72-113). Returns (scrub_state, adv_bundle)."""
    methods = disentangle_config.get("method") or {}
    scrub_state: Dict[str, Dict] = {}

    if "moving_avg_lsq" in methods:
        scrub_state["moving_avg_lsq"] = {}
        for feat in methods["moving_avg_lsq"]:
            scrub_state["moving_avg_lsq"][feat] = scr.mals_init(
                z_dim,
                fdims[feat],
                bias=(loss_config or {}).get(feat + "_mals", 0) < 0,
                polynomial_order=int(disentangle_config.get("polynomial") or 1),
                l2_reg=float(disentangle_config.get("l2_reg") or 0.0),
            )

    if "qda" in methods:
        scrub_state["qda"] = {}
        for feat in methods["qda"]:
            scrub_state["qda"][feat] = scr.qda_init(
                z_dim, np.asarray(discrete_classes[feat])
            )

    if "moving_avg" in methods:
        scrub_state["moving_avg"] = {}
        for feat in methods["moving_avg"]:
            scrub_state["moving_avg"][feat] = scr.ma_init(
                z_dim, np.asarray(discrete_classes[feat])
            )

    adv_bundle = None
    if "adversarial_net" in methods:
        conditional_dim = sum(fdims[k] for k in methods.get("conditional", []))
        adv_states = {}
        model = scr.AdvNet()
        import optax

        tx = optax.adamw(0.1)
        for feat in methods["adversarial_net"]:
            rng, sub = jax.random.split(rng)
            import jax.numpy as jnp

            params = model.init(
                sub,
                jnp.zeros((1, z_dim)),
                jnp.zeros((1, conditional_dim)),
            )
            adv_states[feat] = scr.AdvState(params=params, opt_state=tx.init(params))
        adv_bundle = {"model": model, "tx": tx, "states": adv_states}

    return scrub_state, adv_bundle


# ---------------------------------------------------------------------------
# Data factory (reference get/data.py)
# ---------------------------------------------------------------------------


def _discrete_classes_for(
    data, dataset_name: str, data_keys, data_path: Optional[Path] = None
) -> dict:
    """Discrete-class maps incl. the parkinsons id/pd_label recoding and the
    per-animal fluorescence lookup from metadata.csv (reference
    get/data.py:73-95). Mutates ``data`` in place; fluorescence and pd_label
    are derived from the *raw* ids before the >=36 recode."""
    discrete = {}
    ids = np.asarray(data["ids"])
    if dataset_name == "parkinsons":
        if "pd_label" in data_keys:
            data["pd_label"] = (ids >= 36).astype(np.int64)[:, None]
            discrete["pd_label"] = np.unique(data["pd_label"])
        if "fluorescence" in data_keys and data_path is not None:
            import pandas as pd

            meta = pd.read_csv(Path(data_path) / dataset_name / "metadata.csv")
            fluor = meta["Fluorescence"].to_numpy()[ids]
            data["fluorescence"] = fluor.astype(np.float32)[:, None]
        ids = np.where(ids >= 36, ids - 36, ids)
        data["ids"] = ids
        discrete["ids"] = np.arange(len(np.unique(ids)))
    else:
        discrete["ids"] = np.unique(ids)
    return discrete


def mouse_data(
    data_config: dict,
    train_val_test: str = "train",
    data_keys: Sequence[str] = ("x6d", "root", "offsets"),
    skeleton_path: Optional[str] = None,
    stride: Optional[int] = None,
    window: Optional[int] = None,
):
    """Build a StreamDataset from raw pose h5 (on-device pipeline) or a
    WindowDataset from preprocessed per-key h5 files (reference layout).

    The reference reads either preprocessed split files or runs the "full"
    pipeline (get/data.py:27-56); here the full pipeline is the frame-store
    build + on-device window assembly.
    """
    data_path = Path(data_config["data_path"])
    skeleton = load_skeleton(skeleton_path or data_path / "mouse_skeleton.yaml")
    dataset_name = data_config.get("dataset") or "synthetic"
    window = window or data_config.get("window") or 51
    stride = stride or data_config.get("stride") or 2
    data_keys = list(data_keys)
    if "ids" not in data_keys:
        data_keys = data_keys + ["ids"]

    split_dir = data_path / dataset_name / train_val_test
    pose_file = data_path / dataset_name / "pose.h5"
    split_pose_file = split_dir / "pose.h5"

    if split_pose_file.exists() or (train_val_test == "full" and pose_file.exists()):
        src = split_pose_file if split_pose_file.exists() else pose_file
        pose, ids = read_pose_h5(src)
        thresh = (
            2.25 if data_config.get("remove_speed_outliers") is not False else None
        )
        store = build_frame_store(
            pose, ids, skeleton, window=window, stride=stride, speed_threshold=thresh,
            # documented-deviation gates (PARITY.md): default replicates the
            # reference's integer-truncated offsets + no-op speed centering
            exact_offsets=bool(data_config.get("exact_offsets")),
            part_centered_speed=bool(data_config.get("part_centered_speed")),
        )
        per_window = {"ids": np.asarray(store.mid_ids)}
        discrete = _discrete_classes_for(
            per_window, dataset_name, data_keys, data_path=data_path
        )
        # recoded ids + metadata-derived columns ride as per-window extras;
        # everything frame-shaped assembles on device.
        extras = {
            k: jnp.asarray(v)
            for k, v in per_window.items()
            if k == "ids" or k in data_keys
        }
        ds = StreamDataset(
            store=store,
            skeleton=skeleton,
            data_keys=tuple(data_keys),
            direction_process=data_config.get("direction_process") or "midfwd",
            arena_size=(
                np.asarray(data_config["arena_size"], dtype=np.float32)
                if data_config.get("arena_size") is not None
                else None
            ),
            label=train_val_test,
            discrete_classes=discrete,
            extras=extras,
        )
        # data.host_stream: keep the TRAIN frame store in host RAM and
        # stream per-batch slabs (data/hoststream.py) — for corpora larger
        # than HBM. Val/test splits stay device-resident (they are read
        # repeatedly by the scanned eval epoch).
        if data_config.get("host_stream") and train_val_test == "train":
            from scrubvae_tpu.data.hoststream import HostStreamDataset

            ds = HostStreamDataset.from_stream(ds)
        return ds

    # Preprocessed per-key h5 files (reference get/data.py:32-44 layout)
    plain = {"ids", "heading", "avg_speed_3d", "offsets", "raw_pose"}
    data = {}
    for key in data_keys:
        if key in ("pd_label", "fluorescence"):
            continue
        name = (
            f"{key}.h5"
            if key in plain
            else f"{key}_{data_config.get('direction_process')}.h5"
        )
        data[key] = read_key_h5(split_dir / name, key)

    norm_params = {
        "avg_speed_3d": {
            "mean": np.asarray([0.4993, 0.7112, 0.6663], dtype=np.float32),
            "std": np.asarray([0.4038, 0.3586, 0.4169], dtype=np.float32),
        }
    }
    if "avg_speed_3d" in data:
        data["avg_speed_3d"] = (
            data["avg_speed_3d"] - norm_params["avg_speed_3d"]["mean"]
        ) / norm_params["avg_speed_3d"]["std"]

    discrete = _discrete_classes_for(
        data, dataset_name, data_keys, data_path=data_path
    )
    return WindowDataset(
        data=data,
        arena_size=(
            np.asarray(data_config["arena_size"], dtype=np.float32)
            if data_config.get("arena_size") is not None
            else None
        ),
        skeleton=skeleton,
        label=train_val_test,
        discrete_classes=discrete,
        norm_params=norm_params,
    )


def data_and_model(
    config: dict,
    train_val_test: Sequence[str] = ("train", "val"),
    data_keys: Sequence[str] = ("x6d", "root", "offsets", "target_pose"),
    use_default_val_keys: bool = True,
):
    """Reference get.data_and_model parity (get/get.py:7-75)."""
    if use_default_val_keys:
        if config["data"].get("dataset") == "parkinsons":
            val_keys = [
                "ids", "x6d", "root", "offsets", "target_pose",
                "fluorescence", "pd_label",
            ]
        else:
            val_keys = [
                "ids", "x6d", "root", "offsets", "target_pose",
                "avg_speed_3d", "heading",
            ]
    else:
        val_keys = list(data_keys)

    # window is a model-section key (reference params/param_keys.py:30) but
    # is also accepted under data; resolve ONE value here and thread it to
    # both the loaders and build_model so they can never silently disagree
    # (a data-section-only window used to leave the model at its 51 default
    # and fail deep inside the loss with a shape error).
    window = (
        config["model"].get("window") or config["data"].get("window") or 51
    )

    # data.encoder_direction_process: midfwd gives the encoder an aligned
    # view while the recon target keeps the configured representation
    # (structural factor exclusion; models/residual.py ResVAE.encode).
    enc_dp = config["data"].get("encoder_direction_process")
    enc_keys = (
        ["x6d_enc", "root_enc"]
        if enc_dp and enc_dp != config["data"].get("direction_process")
        else []
    )

    datasets = {}
    for label in train_val_test:
        keys = val_keys if label == "val" else list(data_keys)
        datasets[label] = mouse_data(
            config["data"],
            train_val_test=label,
            data_keys=list(keys) + enc_keys,
            window=window,
        )

    first = datasets[list(train_val_test)[0]]
    model_config = dict(config["model"])
    model_config["window"] = window
    if config.get("train", {}).get("precision"):
        model_config.setdefault("precision", config["train"]["precision"])
    model, info = build_model(
        model_config,
        config["disentangle"],
        n_keypts=first.n_keypts,
        direction_process=config["data"].get("direction_process"),
        arena_size=first.arena_size,
        discrete_classes=first.discrete_classes,
        loss_keys=(config.get("loss") or {}).keys(),
    )
    return datasets, model, info


def all_saved_epochs(path: str) -> np.ndarray:
    """Epoch numbers with saved weights (reference get/get.py:78-84)."""
    z_path = Path(path) / "weights"
    epochs = [
        int(re.findall(r"\d+", f.name)[0]) for f in z_path.glob("epoch*")
    ]
    return np.sort(np.asarray(epochs, dtype=int))


# Reference-shaped aliases: the reference exposes this module as
# `scrubvae.get` with `get.model(...)` (get/model.py:4) and
# `get.latents(...)` (get/eval.py:8).
model = build_model


def latents(*args, **kwargs):
    from scrubvae_tpu.evals.latents import latents as _latents

    return _latents(*args, **kwargs)

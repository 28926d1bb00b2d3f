"""Smoke tests for the plot layer and offline analysis utilities
(reference plot/plot.py, plot/eval.py, eval/cluster.py, eval/eval.py):
every renderer produces a file on tiny synthetic inputs, clustering caches
round-trip, and the null-space projection is orthogonal to the decoder
weight."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from scrubvae_tpu.data.skeleton import load_skeleton
from scrubvae_tpu.data.synthetic import synthetic_pose_stream
from scrubvae_tpu.evals import cluster
from scrubvae_tpu.evals.traverse import project_to_null
from scrubvae_tpu.plot import feature_ridge, sample_clusters, scatter_cmap, trace
from scrubvae_tpu.plot import eval as plot_eval
from scrubvae_tpu.plot import pose_viz

SKEL = load_skeleton("configs/mouse_skeleton.yaml")


@pytest.fixture(scope="module")
def pose():
    p, _ = synthetic_pose_stream(SKEL, n_frames=140, n_ids=1, seed=3)
    return np.asarray(p)


class TestPlots:
    def test_trace(self, pose, tmp_path):
        out = trace(
            pose, SKEL, frames=[0, 40], N_FRAMES=30,
            FIG_NAME="t.png", SAVE_ROOT=str(tmp_path),
        )
        assert (tmp_path / "t.png").exists(), out

    def test_feature_ridge(self, tmp_path):
        rng = np.random.default_rng(0)
        out = feature_ridge(
            rng.normal(size=(200, 1)),
            rng.integers(0, 3, size=200),
            feature_name="speed",
            FIG_NAME="r.png",
            SAVE_ROOT=str(tmp_path),
        )
        assert (tmp_path / "r.png").exists(), out

    def test_scatter_cmap(self, tmp_path):
        rng = np.random.default_rng(1)
        out = scatter_cmap(
            rng.normal(size=(100, 2)), rng.normal(size=100),
            FIG_NAME="s.png", SAVE_ROOT=str(tmp_path),
        )
        assert (tmp_path / "s.png").exists(), out

    def test_loss_curves(self, tmp_path):
        loss_dict = {
            "total": [3.0, 2.0, 1.0],
            "rotation": [2.0, 1.5, 1.0],
            "avg_speed_3d": [0.2, 0.1, 0.05],
            "mcmi": [-0.1, -0.2, -0.3],
        }
        outs = plot_eval.loss(
            loss_dict, str(tmp_path) + "/", disentangle_keys=("avg_speed_3d",)
        )
        assert outs and all(isinstance(p, str) for p in outs)

    def test_grid3d_video_fallback(self, pose, tmp_path):
        # no ffmpeg in this image -> pillow .gif fallback
        pose_viz.grid3D(
            pose, SKEL, frames=[0, 30], N_FRAMES=8, fps=5,
            VID_NAME="g.mp4", SAVE_ROOT=str(tmp_path),
        )
        assert (tmp_path / "g.mp4").exists() or (tmp_path / "g.gif").exists()

    def test_arena3d_video_fallback(self, pose, tmp_path):
        pose_viz.arena3D(
            pose, SKEL, frames=[0], N_FRAMES=8, fps=5,
            VID_NAME="a.mp4", SAVE_ROOT=str(tmp_path),
        )
        assert (tmp_path / "a.mp4").exists() or (tmp_path / "a.gif").exists()

    def test_sample_clusters(self, pose, tmp_path):
        ids = np.zeros(3, dtype=int)
        outs = sample_clusters(
            pose, ids, SKEL, n_samples=2, window=8, SAVE_ROOT=str(tmp_path) + "/"
        )
        assert len(outs) == 1


class TestClusterAndNullSpace:
    def test_gmm_cache_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        z = np.concatenate(
            [rng.normal(size=(60, 4)), rng.normal(size=(60, 4)) + 4.0]
        )
        k1, m1 = cluster.gmm(z, label="t", path=str(tmp_path) + "/", n_components=2)
        k2, m2 = cluster.gmm(z, label="t", path=str(tmp_path) + "/", n_components=2)
        assert k1.shape == (120,)
        np.testing.assert_array_equal(k1, k2)  # second call hits the cache
        assert len(np.unique(k1)) == 2
        assert (tmp_path / "t_gmm.p").exists()
        assert (tmp_path / "t_gmm.npy").exists()

    def test_dbscan_runs(self, tmp_path):
        rng = np.random.default_rng(3)
        z = np.concatenate(
            [rng.normal(size=(40, 3)), rng.normal(size=(40, 3)) + 8.0]
        )
        preds = cluster.dbscan(
            z, min_samples=5, label="d", path=str(tmp_path) + "/"
        )
        assert preds.shape == (80,)
        assert (tmp_path / "d_sc_pred.npy").exists()

    def test_project_to_null_orthogonal(self):
        rng = np.random.default_rng(4)
        z = rng.normal(size=(50, 8))
        w = rng.normal(size=(3, 8))
        z_null, basis = project_to_null(z, w)
        assert z_null.shape == (50, 5) and basis.shape == (8, 5)
        # back in latent space, the projection has no component along w
        np.testing.assert_allclose(
            (z_null @ basis.T) @ w.T, np.zeros((50, 3)), atol=1e-5
        )


class TestMetricHelpers:
    def test_shannon_entropy(self):
        from scrubvae_tpu.evals.metrics import shannon_entropy

        assert shannon_entropy(np.asarray([0, 0, 0, 0])) == 0.0
        np.testing.assert_allclose(
            shannon_entropy(np.asarray([0, 1, 0, 1])), np.log(2), rtol=1e-6
        )

    def test_hungarian_match_relabels(self):
        from scrubvae_tpu.evals.metrics import hungarian_match

        x1 = np.asarray([0, 0, 1, 1, 2, 2])
        x2 = np.asarray([2, 2, 0, 0, 1, 1])  # permutation of x1's labels
        mapped = hungarian_match(x1, x2)
        np.testing.assert_array_equal(mapped, x2)

    def test_mmd_same_vs_shifted(self):
        from scrubvae_tpu.evals.metrics import mmd_estimate

        rng = np.random.default_rng(5)
        X = rng.normal(size=(80, 3))
        Y = rng.normal(size=(80, 3))
        Z = rng.normal(size=(80, 3)) + 3.0
        assert mmd_estimate(X, Z) > mmd_estimate(X, Y)


@pytest.mark.slow
class TestTraverseLatent:
    def test_static_traversal_renders(self, tmp_path):
        """End-to-end latent traversal on a tiny MLP VAE: decode a sweep of
        shifted latents, FK the output, render the static trace."""
        import jax
        import jax.numpy as jnp

        from scrubvae_tpu.data.dataset import StreamDataset
        from scrubvae_tpu.data.pipeline import build_frame_store
        from scrubvae_tpu.evals.traverse import traverse_latent
        from scrubvae_tpu.models.mlp_vae import MLPVAE

        pose, ids = synthetic_pose_stream(SKEL, n_frames=120, n_ids=1, seed=6)
        store = build_frame_store(
            pose, ids, SKEL, window=21, stride=2, speed_threshold=None
        )
        arena = np.asarray([[-300, -300, 0], [300, 300, 100]], np.float32)
        ds = StreamDataset(
            store,
            SKEL,
            ("x6d", "root", "offsets", "target_pose"),
            "midfwd",
            arena_size=arena,
            label="test",
        )
        model = MLPVAE(
            in_channels=18 * 6 + 3,
            hidden=(32,),
            z_dim=4,
            window=21,
            arena_size=tuple(map(tuple, arena.tolist())),
        )
        rng = jax.random.PRNGKey(0)
        variables = model.init(
            {"params": rng}, ds.batch(jnp.arange(2)), rng=rng, train=True
        )
        z = np.random.default_rng(7).normal(size=(len(ds), 4)).astype(np.float32)
        weight = np.asarray([[1.0, 0, 0, 0]], dtype=np.float32)
        out_pose = traverse_latent(
            model,
            variables,
            ds,
            z,
            weight,
            index=0,
            n_shifts=3,
            grid_vis=False,
            arena_vis=False,
            static_vis=True,
            save_path=str(tmp_path) + "/",
            sample_index=0,
        )
        assert out_pose.shape == (3 * 21, 18, 3)
        assert np.isfinite(out_pose).all()
        assert (tmp_path / "test_trace_0.png").exists()


@pytest.mark.slow
class TestEpochMetricHarness:
    def test_epoch_regression_sweep_with_cache(self, tmp_path):
        """Offline per-epoch decodability sweep over saved checkpoints
        (reference epoch_metric/epoch_regression): train a tiny run via the
        config path, sweep linear decodability across saved epochs, and
        check the pickle cache short-circuits the second call."""
        import pickle

        import yaml

        from scrubvae_tpu.data.pose_io import write_pose_h5
        from scrubvae_tpu.evals.metrics import epoch_regression
        from scrubvae_tpu.params import read

        data_path = tmp_path / "data"
        (data_path / "synthetic" / "train").mkdir(parents=True)
        import shutil

        shutil.copy("configs/mouse_skeleton.yaml", data_path / "mouse_skeleton.yaml")
        pose, ids = synthetic_pose_stream(SKEL, n_frames=200, n_ids=2, seed=8)
        write_pose_h5(data_path / "synthetic" / "train" / "pose.h5", pose, ids)

        run = tmp_path / "run"
        run.mkdir()
        cfg = {
            "data": {
                "data_path": str(data_path) + "/",
                "dataset": "synthetic",
                "batch_size": 16,
                "direction_process": "midfwd",
                "arena_size": [[-300, -300, 0], [300, 300, 100]],
                "remove_speed_outliers": False,
            },
            "disentangle": {"method": {}},
            "model": {"type": "mlp", "z_dim": 4, "window": 21,
                      "hidden": [16], "diag": True},
            "train": {"lr": 1e-3, "optimizer": "adam", "lr_schedule": None,
                      "num_epochs": 10, "seed": 0, "eval_start_epoch": 999,
                      "minimal_test": True},
            "loss": {"rotation": 1.0, "prior": 0.001, "root": 0.01},
            "out_path": "current",
        }
        with open(run / "model_config.yaml", "w") as f:
            yaml.safe_dump(cfg, f)
        resolved = read.config(run / "model_config.yaml")
        # train-split only (no val files on disk), through the factory path
        from scrubvae_tpu import factory
        from scrubvae_tpu.train.trainer import Trainer

        datasets, model, info = factory.data_and_model(
            resolved,
            train_val_test=("train",),
            data_keys=("x6d", "root", "offsets", "target_pose",
                       "avg_speed_3d", "heading"),
        )
        Trainer(resolved, datasets, model, info).fit()

        m1 = epoch_regression(
            str(run) + "/",
            "linear_rand_cv",
            "train",
            disentangle_keys=("avg_speed_3d",),
            start_epoch=4,
        )
        assert list(m1["epochs"]) == [5, 10]
        assert len(m1["avg_speed_3d"]["R2"]) == 2
        pkl = run / "linear_rand_cv_train.p"
        assert pkl.exists()
        # cached second call returns without recomputation
        m2 = epoch_regression(
            str(run) + "/", "linear_rand_cv", "train",
            disentangle_keys=("avg_speed_3d",), start_epoch=4,
        )
        assert list(m2["epochs"]) == [5, 10]
        # latents were cached per epoch as well
        assert (run / "latents" / "train_5.npy").exists()
        assert (run / "latents" / "train_10.npy").exists()

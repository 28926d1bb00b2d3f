"""Host-streaming input pipeline (data/hoststream.py): the host-RAM frame
store + per-batch slab path must be numerically identical to the
device-resident StreamDataset path — same per-window math, just different
residency — and the Trainer's prefetch feed must train equivalently."""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scrubvae_tpu import factory
from scrubvae_tpu.data.dataset import StreamDataset
from scrubvae_tpu.data.hoststream import (
    HostStreamDataset,
    prefetch_to_device,
)
from scrubvae_tpu.data.pipeline import build_frame_store
from scrubvae_tpu.data.skeleton import load_skeleton
from scrubvae_tpu.data.synthetic import synthetic_pose_stream
from scrubvae_tpu.train.trainer import Trainer

SKEL = load_skeleton("configs/mouse_skeleton.yaml")
ARENA = np.asarray([[-300, -300, 0], [300, 300, 100]], np.float32)
KEYS = ("x6d", "root", "offsets", "target_pose", "avg_speed_3d", "heading", "ids")


@pytest.fixture(scope="module")
def stream_ds():
    pose, ids = synthetic_pose_stream(SKEL, n_frames=400, n_ids=2, seed=3)
    store = build_frame_store(pose, ids, SKEL, window=31, stride=2)
    return StreamDataset(
        store,
        SKEL,
        KEYS,
        "midfwd",
        arena_size=ARENA,
        discrete_classes={"ids": np.unique(ids)},
        extras={"ids": jnp.asarray(np.asarray(store.mid_ids))},
    )


@pytest.fixture(scope="module")
def host_ds(stream_ds):
    return HostStreamDataset.from_stream(stream_ds)


class TestSlabEquivalence:
    def test_batch_matches_device_resident(self, stream_ds, host_ds):
        idx = np.asarray([0, 5, 17, 41, 3, 29, 11, 2])
        a = stream_ds.batch(jnp.asarray(idx))
        slab = host_ds.host_batch(idx)
        b = host_ds.make_batch_fn()(
            {k: jnp.asarray(v) for k, v in slab.items()}
        )
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k
            )

    def test_batch_fn_is_jittable(self, host_ds):
        idx = np.arange(8)
        slab = {k: jnp.asarray(v) for k, v in host_ds.host_batch(idx).items()}
        fn = jax.jit(host_ds.make_batch_fn())
        out = fn(slab)
        assert out["x6d"].shape[0] == 8
        eager = host_ds.make_batch_fn()(slab)
        for k in out:
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(eager[k]),
                rtol=1e-6, atol=1e-6, err_msg=k,
            )

    def test_prefetch_order_and_values(self, host_ds):
        batches = [np.arange(i, i + 4) for i in range(0, 20, 4)]
        got = list(prefetch_to_device(host_ds.epoch_slabs(batches), size=2))
        assert len(got) == len(batches)
        for idx, slab in zip(batches, got):
            ref = host_ds.host_batch(idx)
            for k in ref:
                np.testing.assert_array_equal(
                    np.asarray(slab[k]), ref[k], err_msg=k
                )

    def test_prefetch_propagates_worker_errors(self):
        def bad():
            yield {"x": np.zeros(2)}
            raise RuntimeError("boom")

        it = prefetch_to_device(bad(), size=2)
        next(it)
        with pytest.raises(RuntimeError, match="boom"):
            next(it)


def _config(tmp_path, host_stream):
    cfg = {
        "data": {
            "batch_size": 16,
            "dataset": "synthetic",
            "direction_process": "midfwd",
            "arena_size": ARENA.tolist(),
            "host_stream": host_stream,
        },
        "disentangle": {
            "method": {"conditional": ["avg_speed_3d"]},
            "features": ["avg_speed_3d", "heading"],
            "alpha": 1.0,
            "balance_loss": None,
            "bandwidth": 1.0,
            "polynomial": 1,
            "var_mode": "sphere",
            "l2_reg": 0.0,
            "n_iter": 2,
        },
        "model": {
            "type": "rcnn",
            "z_dim": 8,
            "window": 31,
            "diag": True,
            "channel": [4, 4, 8],
            "kernel": 5,
            "start_epoch": 0,
            "load_model": None,
            "prior": "gaussian",
            "activation": "prelu",
            "init_dilation": None,
        },
        "train": {
            "lr": 1e-3,
            "optimizer": "adam",
            "lr_schedule": None,
            "num_epochs": 2,
            "beta_anneal": None,
            "seed": 0,
            "eval_start_epoch": 999,
            "donate": False,
        },
        "loss": {"rotation": 1.0, "prior": 0.001, "root": 0.01, "jpe": 1.0},
        "out_path": str(tmp_path) + "/",
    }
    for d in ("weights", "checkpoints", "latents"):
        pathlib.Path(cfg["out_path"], d).mkdir(parents=True, exist_ok=True)
    return cfg


def _trainer(tmp_path, ds):
    cfg = _config(tmp_path, isinstance(ds, HostStreamDataset))
    model, info = factory.build_model(
        cfg["model"],
        cfg["disentangle"],
        n_keypts=ds.n_keypts,
        direction_process="midfwd",
        arena_size=ARENA,
        discrete_classes=ds.discrete_classes,
        loss_keys=cfg["loss"].keys(),
    )
    return Trainer(cfg, {"train": ds}, model, info)


class TestHostStreamTraining:
    @pytest.mark.slow  # ~6.5 min of XLA:CPU compile on the 1-core host; the
    # default tier keeps the bit-identity claim via TestSlabEquivalence (~3 s)
    def test_epoch_matches_device_resident(
        self, stream_ds, host_ds, tmp_path
    ):
        """Two epochs through the prefetch feed produce the same metrics as
        the device-resident per-step path (identical seeds => identical
        permutations => identical math)."""
        tr_a = _trainer(tmp_path / "a", stream_ds)
        tr_a.use_scan_epoch = tr_a.scan_train = False  # per-step reference
        tr_b = _trainer(tmp_path / "b", host_ds)
        assert tr_b.host_stream and not tr_b.scan_train

        for epoch in (1, 2):
            m_a = tr_a.train_epoch(epoch)
            m_b = tr_b.train_epoch(epoch)
            assert set(m_a) == set(m_b)
            for k in m_a:
                assert abs(m_a[k] - m_b[k]) <= 1e-4 * max(1.0, abs(m_a[k])), (
                    epoch, k, m_a[k], m_b[k],
                )

    def test_factory_builds_host_stream_train_split(self, tmp_path):
        """data.host_stream routes the train split through HostStreamDataset
        at the real factory surface (val splits stay device-resident)."""
        import shutil

        from scrubvae_tpu.data.pose_io import write_pose_h5

        data_dir = tmp_path / "data"
        for split, seed in (("train", 0), ("val", 1)):
            d = data_dir / "synthetic" / split
            d.mkdir(parents=True)
            pose, ids = synthetic_pose_stream(SKEL, n_frames=200, n_ids=2, seed=seed)
            write_pose_h5(d / "pose.h5", pose, ids)
        shutil.copy("configs/mouse_skeleton.yaml", data_dir / "mouse_skeleton.yaml")

        dc = {
            "data_path": str(data_dir),
            "dataset": "synthetic",
            "direction_process": "midfwd",
            "host_stream": True,
        }
        tr = factory.mouse_data(dc, "train", data_keys=("x6d", "root"), window=31)
        va = factory.mouse_data(dc, "val", data_keys=("x6d", "root"), window=31)
        assert isinstance(tr, HostStreamDataset)
        assert isinstance(va, StreamDataset)
        assert isinstance(tr.store.pose, np.ndarray)  # host residency

    def test_host_stream_val_split_rejected(self, stream_ds, host_ds, tmp_path):
        cfg = _config(tmp_path / "valguard", True)
        model, info = factory.build_model(
            cfg["model"], cfg["disentangle"], n_keypts=host_ds.n_keypts,
            direction_process="midfwd", arena_size=ARENA,
            discrete_classes=host_ds.discrete_classes,
            loss_keys=cfg["loss"].keys(),
        )
        with pytest.raises(ValueError, match="host-streaming val"):
            Trainer(cfg, {"train": host_ds, "val": host_ds}, model, info)

"""Data-pipeline tests: window indexing, outlier filtering, and parity of the
on-device window assembly with a naive materialized implementation that
follows the reference preprocessing algorithm step by step
(dataset.py:313-454)."""

import jax.numpy as jnp
import numpy as np

from scrubvae_tpu.data.dataset import StreamDataset, epoch_batches
from scrubvae_tpu.data.pipeline import build_frame_store, materialize
from scrubvae_tpu.data.skeleton import load_skeleton
from scrubvae_tpu.data.synthetic import synthetic_pose_stream
from scrubvae_tpu.data.windows import speed_outlier_mask, window_starts
from scrubvae_tpu.ops import kinematics as kin
from scrubvae_tpu.ops import quaternion as qtn

SKEL = load_skeleton("configs/mouse_skeleton.yaml")


class TestWindows:
    def test_window_starts_respect_id_boundaries(self):
        ids = np.asarray([0] * 100 + [1] * 30 + [2] * 10)
        starts = window_starts(ids, stride=2, window=20)
        for s in starts:
            assert ids[s] == ids[s + 19]
        # id 2 segment shorter than window is skipped
        assert (ids[starts] != 2).all()
        # stride honored within segments
        assert set(np.diff(starts[ids[starts] == 0])) == {2}

    def test_speed_outlier_prefix_sum_matches_naive(self):
        rng = np.random.default_rng(0)
        pose = rng.normal(size=(200, 5, 3)).astype(np.float32)
        starts = window_starts(np.zeros(200, dtype=int), 3, 21)
        mask = speed_outlier_mask(pose, starts, 21, threshold=2.0)
        for i, s in enumerate(starts):
            w = pose[s : s + 21]
            avg = np.sqrt(((np.diff(w, axis=0) ** 2).sum(-1))).mean()
            assert mask[i] == (avg <= 2.0)


def naive_reference_pipeline(pose, ids, window=21, stride=3):
    """Materialized preprocessing mirroring the reference algorithm: window
    first, then IK per windowed frame, mid-frame centering + midfwd."""
    starts = window_starts(ids, stride, window)
    win = np.stack([pose[s : s + window] for s in starts])  # (N, W, J, 3)
    N, W, J, _ = win.shape

    yaw = np.asarray(kin.frame_yaw(jnp.asarray(win[:, window // 2]), 0, 1))
    heading = np.stack([np.sin(yaw), np.cos(yaw)], -1)

    root = win[..., 0, :].copy()
    center = np.zeros_like(root)
    center[..., 0] = root[:, window // 2, 0][:, None]
    center[..., 1] = root[:, window // 2, 1][:, None]
    root = root - center

    flat = win.reshape(-1, J, 3)
    local_q = np.array(
        kin.inv_kin(jnp.asarray(flat), SKEL.tree, forward_indices=[1, 0])
    ).reshape(N, W, J, 4)

    fwd_q = np.zeros((N, 4), dtype=np.float32)
    fwd_q[:, 0] = np.cos(yaw / 2)
    fwd_q[:, 3] = np.sin(yaw / 2)
    fwd_rep = np.repeat(fwd_q[:, None], W, axis=1)
    local_q[..., 0, :] = np.asarray(
        qtn.qmul(jnp.asarray(fwd_rep), jnp.asarray(local_q[..., 0, :]))
    )
    root = np.asarray(qtn.qrot(jnp.asarray(fwd_rep), jnp.asarray(root)))

    x6d = np.asarray(qtn.quaternion_to_cont6d(jnp.asarray(local_q)))
    offsets = np.asarray(
        kin.segment_lengths(jnp.asarray(flat), SKEL.tree)
    ).reshape(N, W, J, 3)
    return dict(starts=starts, x6d=x6d, root=root, offsets=offsets, heading=heading)


class TestPipelineParity:
    def test_on_device_assembly_matches_naive_materialization(self):
        pose, ids = synthetic_pose_stream(SKEL, n_frames=150, n_ids=1, seed=3)
        # exact_offsets: the naive mirror computes UNtruncated scaled
        # offsets; the reference-exact truncation default is pinned against
        # the reference itself in test_preprocess_composition.py
        store = build_frame_store(
            pose, ids, SKEL, window=21, stride=3, speed_threshold=None,
            exact_offsets=True,
        )
        ours = materialize(
            store, SKEL.tree, ("x6d", "root", "offsets", "heading"), "midfwd"
        )
        naive = naive_reference_pipeline(pose, ids, window=21, stride=3)
        assert (np.asarray(store.starts) == naive["starts"]).all()
        np.testing.assert_allclose(ours["heading"][:, 0], naive["heading"][:, 0], atol=1e-4)
        np.testing.assert_allclose(ours["root"], naive["root"], atol=1e-3)
        np.testing.assert_allclose(ours["offsets"], naive["offsets"], atol=1e-3)
        # Quaternion sign is gauge; compare resulting rotations via cont6d
        np.testing.assert_allclose(ours["x6d"], naive["x6d"], atol=2e-3)

    def test_target_pose_fk_consistency(self):
        pose, ids = synthetic_pose_stream(SKEL, n_frames=120, n_ids=1, seed=4)
        # exact_offsets: the bone-length assertion below compares against
        # raw-pose segment lengths, which only the untruncated deviation
        # path preserves (the reference-default truncation shortens bones
        # by up to 1 unit — PARITY.md)
        store = build_frame_store(
            pose, ids, SKEL, window=21, stride=5, speed_threshold=None,
            exact_offsets=True,
        )
        out = materialize(
            store, SKEL.tree, ("x6d", "offsets", "target_pose"), "midfwd"
        )
        # target_pose = FK(x6d, offsets, zero root): recompute directly
        N, W, J = out["x6d"].shape[:3]
        recon = np.asarray(
            kin.fwd_kin_cont6d(
                jnp.asarray(out["x6d"].reshape(-1, J, 6)),
                SKEL.tree,
                jnp.asarray(out["offsets"].reshape(-1, J, 3)),
                jnp.zeros((N * W, 3)),
                do_root_R=True,
                eps=1e-8,
            )
        ).reshape(N, W, J, 3)
        np.testing.assert_allclose(out["target_pose"], recon, atol=1e-4)
        # Relative geometry is preserved: bone lengths of target match raw
        mid_pose = pose[np.asarray(store.starts) + 10]
        pp = SKEL.tree.pos_parent
        for j in [1, 5, 8]:
            raw_len = np.linalg.norm(
                mid_pose[:, j] - mid_pose[:, pp[j]], axis=-1
            )
            tgt_len = np.linalg.norm(
                out["target_pose"][:, 10, j] - out["target_pose"][:, 10, pp[j]],
                axis=-1,
            )
            np.testing.assert_allclose(tgt_len, raw_len, rtol=1e-3)

    def test_avg_speed_3d_and_ids(self):
        pose, ids = synthetic_pose_stream(SKEL, n_frames=200, n_ids=2, seed=5)
        store = build_frame_store(
            pose, ids, SKEL, window=21, stride=3, speed_threshold=None
        )
        out = materialize(store, SKEL.tree, ("avg_speed_3d", "ids"), "midfwd")
        assert out["avg_speed_3d"].shape == (store.n_windows, 3)
        starts = np.asarray(store.starts)
        np.testing.assert_array_equal(out["ids"], ids[starts + 10])


class TestBatching:
    def test_epoch_batches_cover_and_shuffle(self):
        rng = np.random.default_rng(0)
        batches = list(epoch_batches(103, 16, rng))
        assert len(batches) == 6
        flat = np.concatenate(batches)
        assert len(np.unique(flat)) == 96

    def test_stream_dataset_batch_keys(self):
        pose, ids = synthetic_pose_stream(SKEL, n_frames=150, n_ids=1, seed=6)
        store = build_frame_store(pose, ids, SKEL, window=21, stride=3)
        ds = StreamDataset(
            store,
            SKEL,
            ("x6d", "root", "offsets", "target_pose", "heading", "ids"),
            "midfwd",
            arena_size=np.asarray([[-300, -300, 0], [300, 300, 100]], np.float32),
        )
        b = ds.batch(jnp.arange(4))
        assert set(b) == {"x6d", "root", "offsets", "target_pose", "heading", "ids"}
        assert b["x6d"].shape == (4, 21, 18, 6)


class TestParkinsonsDataPath:
    """Parkinsons metadata handling parity (reference get/data.py:73-95):
    pd_label derived from raw id >= 36, fluorescence looked up per animal
    from metadata.csv, ids recoded mod 36 — all before batching."""

    def _make_layout(self, tmp_path):
        import shutil

        from scrubvae_tpu.data.pose_io import write_pose_h5

        shutil.copy("configs/mouse_skeleton.yaml", tmp_path / "mouse_skeleton.yaml")
        # two animals: raw ids 0 (healthy) and 36 (PD-recoded to 0)
        pose0, _ = synthetic_pose_stream(SKEL, n_frames=80, n_ids=1, seed=7)
        pose1, _ = synthetic_pose_stream(SKEL, n_frames=80, n_ids=1, seed=8)
        pose = np.concatenate([pose0, pose1])
        ids = np.asarray([0] * 80 + [36] * 80)
        write_pose_h5(tmp_path / "parkinsons" / "train" / "pose.h5", pose, ids)
        fluor = np.zeros(37, dtype=np.float32)
        fluor[0], fluor[36] = 1.5, 7.25
        lines = ["Subject,Fluorescence"] + [
            f"{i},{fluor[i]}" for i in range(37)
        ]
        (tmp_path / "parkinsons" / "metadata.csv").write_text("\n".join(lines))
        return fluor

    def test_pd_label_fluorescence_and_id_recode(self, tmp_path):
        from scrubvae_tpu import factory

        fluor = self._make_layout(tmp_path)
        ds = factory.mouse_data(
            {
                "data_path": str(tmp_path) + "/",
                "dataset": "parkinsons",
                "direction_process": "midfwd",
                "arena_size": [[-300, -300, 0], [300, 300, 100]],
                "remove_speed_outliers": False,
            },
            train_val_test="train",
            data_keys=["x6d", "root", "offsets", "pd_label", "fluorescence"],
            window=21,
            stride=3,
        )
        b = ds.batch(jnp.arange(len(ds)))
        raw_mid = np.asarray(ds.store.mid_ids)
        assert set(np.unique(raw_mid)) == {0, 36}
        np.testing.assert_array_equal(
            np.asarray(b["pd_label"]).ravel(), (raw_mid >= 36).astype(int)
        )
        np.testing.assert_allclose(
            np.asarray(b["fluorescence"]).ravel(), fluor[raw_mid]
        )
        # ids recoded: both animals collapse to class 0
        np.testing.assert_array_equal(np.asarray(b["ids"]), np.zeros(len(ds)))
        assert set(ds.discrete_classes) == {"pd_label", "ids"}
        assert b["x6d"].shape[1:] == (21, 18, 6)


class TestPrecomputeParity:
    """The per-frame x6d/FK precompute path must equal the per-window
    recompute path exactly (the yaw alignment is exact algebra: quaternion
    premultiply on the root row, rigid rotation of the zero-root FK)."""

    def test_fast_path_matches_recompute(self):
        pose, ids = synthetic_pose_stream(SKEL, n_frames=160, n_ids=2, seed=9)
        keys = ("x6d", "root", "offsets", "target_pose", "heading")
        for dp in ("midfwd", "x360"):
            fast = build_frame_store(
                pose, ids, SKEL, window=21, stride=3, speed_threshold=None,
                precompute=True,
            )
            slow = build_frame_store(
                pose, ids, SKEL, window=21, stride=3, speed_threshold=None,
                precompute=False,
            )
            assert fast.x6d is not None and slow.x6d is None
            a = materialize(fast, SKEL.tree, keys, dp)
            b = materialize(slow, SKEL.tree, keys, dp)
            for k in keys:
                np.testing.assert_allclose(
                    a[k], b[k], atol=2e-5, err_msg=f"{dp}/{k}"
                )


class TestWindowResolution:
    """data_and_model resolves ONE window value shared by loaders and model,
    whether the config carries it under model (reference convention,
    params/param_keys.py:30) or under data."""

    def _layout(self, tmp_path):
        import shutil

        from scrubvae_tpu.data.pose_io import write_pose_h5

        shutil.copy("configs/mouse_skeleton.yaml", tmp_path / "mouse_skeleton.yaml")
        pose, ids = synthetic_pose_stream(SKEL, n_frames=120, n_ids=2, seed=11)
        write_pose_h5(tmp_path / "synthetic" / "train" / "pose.h5", pose, ids)

    def _config(self, tmp_path, model_extra, data_extra):
        return {
            "data": {
                "data_path": str(tmp_path) + "/",
                "dataset": "synthetic",
                "direction_process": "midfwd",
                "arena_size": [[-300, -300, 0], [300, 300, 100]],
                "remove_speed_outliers": False,
                "stride": 5,
                **data_extra,
            },
            "model": {"type": "mlp", "z_dim": 4, "hidden": [8], "diag": True,
                      **model_extra},
            "train": {}, "disentangle": {}, "loss": {},
        }

    def test_data_section_window_reaches_model(self, tmp_path):
        from scrubvae_tpu import factory

        self._layout(tmp_path)
        cfg = self._config(tmp_path, {}, {"window": 31})
        datasets, model, _ = factory.data_and_model(
            cfg, train_val_test=("train",), data_keys=("x6d", "root", "offsets")
        )
        b = datasets["train"].batch(jnp.arange(2))
        assert b["x6d"].shape[1] == 31
        assert getattr(model, "window", 31) == 31

    def test_model_section_window_wins(self, tmp_path):
        from scrubvae_tpu import factory

        self._layout(tmp_path)
        cfg = self._config(tmp_path, {"window": 21}, {"window": 31})
        datasets, model, _ = factory.data_and_model(
            cfg, train_val_test=("train",), data_keys=("x6d", "root", "offsets")
        )
        b = datasets["train"].batch(jnp.arange(2))
        assert b["x6d"].shape[1] == 21
        assert getattr(model, "window", 21) == 21


class TestEncoderView:
    """Structural factor exclusion: x6d_enc/root_enc are the midfwd-aligned
    view assembled alongside an absolute (x360) target from one gather."""

    def test_enc_view_is_heading_invariant(self):
        """x6d_enc/root_enc are exactly invariant under a global yaw of the
        stream (unlike midfwd x6d, whose qbetween IK parametrization leaks
        heading into every limb row — measured mean |Δcont6d| ≈ 0.38 under
        90°), while the x360 target moves with it."""
        pose, ids = synthetic_pose_stream(SKEL, n_frames=160, n_ids=2, seed=12)
        c, s = np.cos(np.pi / 2), np.sin(np.pi / 2)
        R = np.asarray([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], np.float32)
        keys = ("x6d", "root", "x6d_enc", "root_enc")
        outs = []
        for p in (pose, pose @ R.T):
            store = build_frame_store(p, ids, SKEL, window=21, stride=3)
            outs.append(materialize(store, SKEL.tree, keys, "x360"))
        a, b = outs
        d = np.abs(a["x6d_enc"] - b["x6d_enc"])
        # exact in exact arithmetic; in f32 a handful of near-singular
        # qbetween frames (bone ~antiparallel to canonical offset) wobble
        assert float(d.mean()) < 1e-5, d.mean()
        assert float((d > 1e-3).mean()) < 1e-3, (d > 1e-3).mean()
        np.testing.assert_allclose(a["root_enc"], b["root_enc"], atol=1e-3)
        # the absolute target rotates with the stream
        assert np.abs(a["x6d"][..., 0, :] - b["x6d"][..., 0, :]).max() > 0.5

    def test_enc_view_reconstructs_aligned_pose(self):
        """FK of (x6d_enc, root_enc) reproduces the mid-frame-aligned pose:
        the enc view is a faithful representation, just in the aligned frame."""
        from scrubvae_tpu.ops import quaternion as q

        pose, ids = synthetic_pose_stream(SKEL, n_frames=120, n_ids=1, seed=14)
        store = build_frame_store(pose, ids, SKEL, window=21, stride=3)
        b = materialize(
            store, SKEL.tree, ("x6d_enc", "root_enc", "offsets", "heading"), "x360"
        )
        B, W, J = b["x6d_enc"].shape[:3]
        fk = kin.fwd_kin_cont6d(
            jnp.asarray(b["x6d_enc"].reshape(-1, J, 6)),
            SKEL.tree,
            jnp.asarray(b["offsets"].reshape(-1, J, 3)),
            root_pos=jnp.asarray(b["root_enc"].reshape(-1, 3)),
            do_root_R=True,
            eps=1e-8,
        ).reshape(B, W, J, 3)
        # mid-frame forward (kp0 -> kp1) points +x in the aligned frame
        fwd = np.asarray(fk)[:, W // 2, 1, :2] - np.asarray(fk)[:, W // 2, 0, :2]
        fwd = fwd / np.linalg.norm(fwd, axis=-1, keepdims=True)
        np.testing.assert_allclose(fwd[:, 0], 1.0, atol=1e-3)

    def test_encoder_consumes_enc_view(self):
        """ResVAE.encode reads x6d_enc/root_enc when present: perturbing the
        absolute target leaves mu unchanged; perturbing the enc view moves
        it. (Note: midfwd x6d is not *exactly* invariant under global yaw —
        the IK's minimal-rotation parametrization is not equivariant, a
        property shared with the reference inv_kin — so the exclusion
        guarantee is about what the encoder is fed, not bitwise z-equality
        across rotated streams.)"""
        import jax

        from scrubvae_tpu.models.residual import ResVAE

        pose, ids = synthetic_pose_stream(SKEL, n_frames=120, n_ids=1, seed=13)
        keys = ("x6d", "root", "x6d_enc", "root_enc")
        arena = np.asarray([[-300, -300, 0], [300, 300, 100]], np.float32)
        model = ResVAE(
            in_channels=18 * 6 + 3, ch=(8, 8, 16, 16, 32), z_dim=6,
            window=21, arena_size=arena,
        )
        store = build_frame_store(pose, ids, SKEL, window=21, stride=3)
        b = materialize(store, SKEL.tree, keys, "x360")
        data = {k: jnp.asarray(v[:4]) for k, v in b.items()}
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng}, data, rng=rng, train=False)

        def mu(d):
            return np.asarray(model.apply(d_vars, d, rng=None, train=False)["mu"])

        d_vars = variables
        base = mu(data)
        tgt_perturbed = dict(data)
        tgt_perturbed["x6d"] = data["x6d"] + 0.1
        tgt_perturbed["root"] = data["root"] + 5.0
        np.testing.assert_allclose(mu(tgt_perturbed), base, atol=1e-6)
        enc_perturbed = dict(data)
        enc_perturbed["x6d_enc"] = data["x6d_enc"] + 0.1
        assert np.abs(mu(enc_perturbed) - base).max() > 1e-4


class TestSaveSplitLayout:
    def test_fluorescence_squeezed_and_plain_named(self, tmp_path):
        """The per-key h5 layout stores fluorescence 1-D (reference
        get/data.py:89 keeps (N,)) under a direction-process-free name,
        even though this framework carries it (N, 1) internally."""
        import h5py

        from scrubvae_tpu.data.pose_io import save_split

        data = {
            "fluorescence": np.linspace(0, 1, 6, dtype=np.float32)[:, None],
            "pd_label": np.zeros((6, 1), np.int64),
            "heading": np.zeros((6, 2), np.float32),
            "x6d": np.zeros((6, 21, 18, 6), np.float32),
        }
        save_split(tmp_path, data, "midfwd")
        assert (tmp_path / "fluorescence.h5").exists()
        assert (tmp_path / "pd_label.h5").exists()
        assert (tmp_path / "x6d_midfwd.h5").exists()
        with h5py.File(tmp_path / "fluorescence.h5") as hf:
            arr = np.asarray(hf["fluorescence"])
        assert arr.shape == (6,)
        np.testing.assert_allclose(arr, data["fluorescence"][:, 0])

"""Integration tests: the BASELINE.json config ladder trains end-to-end with
finite decreasing losses, checkpoints save/restore, config reader parity."""

import copy
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from scrubvae_tpu import factory
from scrubvae_tpu.data.dataset import StreamDataset
from scrubvae_tpu.data.pipeline import build_frame_store
from scrubvae_tpu.data.skeleton import load_skeleton
from scrubvae_tpu.data.synthetic import synthetic_pose_stream
from scrubvae_tpu.params import read
from scrubvae_tpu.train.trainer import Trainer
from scrubvae_tpu.utils import checkpoint as ckpt

SKEL = load_skeleton("configs/mouse_skeleton.yaml")
ARENA = np.asarray([[-300, -300, 0], [300, 300, 100]], np.float32)


@pytest.fixture(scope="module")
def dataset():
    pose, ids = synthetic_pose_stream(SKEL, n_frames=400, n_ids=2, seed=0)
    store = build_frame_store(pose, ids, SKEL, window=31, stride=2)
    return StreamDataset(
        store,
        SKEL,
        ("x6d", "root", "offsets", "target_pose", "avg_speed_3d", "heading", "ids"),
        "midfwd",
        arena_size=ARENA,
        discrete_classes={"ids": np.unique(ids)},
    )


def base_config(tmp_path, **model_overrides):
    cfg = {
        "data": {
            "batch_size": 16,
            "dataset": "synthetic",
            "direction_process": "midfwd",
            "arena_size": ARENA.tolist(),
        },
        "disentangle": {
            "method": {},
            "features": [],
            "alpha": 1.0,
            "balance_loss": None,
            "bandwidth": 1.0,
            "polynomial": 1,
            "var_mode": "sphere",
            "l2_reg": 0.0,
            "n_iter": 2,
        },
        "model": {
            "type": "mlp",
            "z_dim": 8,
            "window": 31,
            "diag": True,
            "hidden": [32],
            "channel": [8, 8, 16, 16, 32],
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
            "num_epochs": 1,
            "beta_anneal": None,
            "minimal_test": True,
            "seed": 0,
            "eval_start_epoch": 999,
        },
        "loss": {"rotation": 1.0, "prior": 0.001, "root": 0.01, "jpe": 1.0},
        "out_path": str(tmp_path) + "/",
    }
    cfg["model"].update(model_overrides)
    for d in ("weights", "checkpoints", "latents"):
        pathlib.Path(cfg["out_path"], d).mkdir(parents=True, exist_ok=True)
    return cfg


def run_config(cfg, dataset, epochs=1):
    feats = sorted({f for v in cfg["disentangle"]["method"].values() for f in v})
    cfg["disentangle"]["features"] = [f for f in feats if f != "ids"] + (
        ["ids"] if "ids" in feats else []
    )
    model, info = factory.build_model(
        cfg["model"],
        cfg["disentangle"],
        n_keypts=18,
        direction_process="midfwd",
        arena_size=ARENA,
        discrete_classes=dataset.discrete_classes,
    )
    tr = Trainer(cfg, {"train": dataset, "val": dataset}, model, info)
    tr.fit(epochs)
    metrics = {k: v[-1] for k, v in tr.logger.history.items()}
    for k, v in metrics.items():
        if isinstance(v, float):
            assert np.isfinite(v), f"{k} is not finite"
    return tr, metrics


@pytest.mark.slow
class TestConfigLadder:
    def test_cfg1_vanilla_mlp(self, dataset, tmp_path):
        cfg = base_config(tmp_path)
        tr, m = run_config(cfg, dataset)
        assert "total_train" in m

    def test_cfg2_conditional(self, dataset, tmp_path):
        cfg = base_config(tmp_path)
        cfg["disentangle"]["method"] = {"conditional": ["avg_speed_3d", "heading"]}
        tr, m = run_config(cfg, dataset)
        assert tr.info["conditional_dim"] == 5

    def test_cfg3_mals_linear(self, dataset, tmp_path):
        cfg = base_config(tmp_path)
        cfg["disentangle"]["method"] = {
            "linear": ["avg_speed_3d"],
            "moving_avg_lsq": ["avg_speed_3d"],
        }
        cfg["loss"].update({"avg_speed_3d_mals": 0.1, "avg_speed_3d_lin": 1.0})
        tr, m = run_config(cfg, dataset)
        assert "avg_speed_3d_mals_train" in m
        assert "lambda_mals_avg_speed_3d" in m
        # MALS state must have moved from init
        st = tr.state.scrub_state["moving_avg_lsq"]["avg_speed_3d"]
        assert float(jnp.abs(st.Sxy0).sum()) > 0

    def test_cfg4_adversarial_full(self, dataset, tmp_path):
        cfg = base_config(tmp_path)
        cfg["disentangle"]["method"] = {
            "conditional": ["avg_speed_3d", "heading"],
            "grad_reversal": ["avg_speed_3d"],
            "adversarial_net": ["avg_speed_3d"],
            "qda": ["ids"],
            "moving_avg": ["ids"],
        }
        cfg["loss"].update(
            {
                "avg_speed_3d_gr": 1.0,
                "avg_speed_3d_an": 1.0,
                "ids_qda": 0.01,
                "ids_ma": 0.01,
                "mcmi": 0.1,
                "total_correlation": 0.1,
            }
        )
        cfg["train"]["beta_anneal"] = "cyclical"
        tr, m = run_config(cfg, dataset)
        for key in (
            "avg_speed_3d_gr_train",
            "avg_speed_3d_an_train",
            "ids_qda_train",
            "ids_ma_train",
            "mcmi_train",
            "total_correlation_train",
        ):
            assert key in m
        # MI estimator became valid after first refresh
        assert float(tr.state.mi_state.valid) == 1.0
        # QDA/MA streaming states updated
        assert float(jnp.abs(tr.state.scrub_state["moving_avg"]["ids"].m1).sum()) > 0

    def test_loss_decreases_over_epochs(self, dataset, tmp_path):
        cfg = base_config(tmp_path)
        cfg["train"]["num_epochs"] = 4
        tr, _ = run_config(cfg, dataset, epochs=4)
        totals = tr.logger.history["total_train"]
        assert totals[-1] < totals[0]


@pytest.mark.slow
class TestCheckpointing:
    def test_weights_saved_every_5_epochs(self, dataset, tmp_path):
        cfg = base_config(tmp_path)
        tr, _ = run_config(cfg, dataset, epochs=5)
        assert (tmp_path / "weights" / "epoch_5.msgpack").exists()
        assert factory.all_saved_epochs(str(tmp_path) + "/").tolist() == [5]

    def test_roundtrip_restores_exact_params(self, dataset, tmp_path):
        cfg = base_config(tmp_path)
        tr, _ = run_config(cfg, dataset, epochs=5)
        params, batch_stats = ckpt.load_weights(
            str(tmp_path), 5, tr.state.params, tr.state.batch_stats
        )
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(tr.state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_full_state_resume(self, dataset, tmp_path):
        cfg = base_config(tmp_path)
        cfg["train"]["num_epochs"] = 20
        tr, _ = run_config(cfg, dataset, epochs=20)
        assert (tmp_path / "checkpoints" / "epoch_20.msgpack").exists()
        restored = ckpt.load_train_state(str(tmp_path), 20, tr.state)
        assert int(restored.step) == int(tr.state.step)


class TestConfigReader:
    def test_schema_fill_and_feature_derivation(self, tmp_path):
        raw = {
            "data": {"batch_size": 4},
            "disentangle": {
                "method": {"linear": ["heading"], "conditional": ["avg_speed_3d"]}
            },
            "loss": {"rotation": 1},
            "out_path": "current",
        }
        p = tmp_path / "model_config.yaml"
        with open(p, "w") as f:
            yaml.dump(raw, f)
        cfg = read.config(p)
        assert cfg["model"]["z_dim"] is None  # default-filled
        assert set(cfg["disentangle"]["features"]) == {"heading", "avg_speed_3d"}
        assert cfg["out_path"] == str(tmp_path) + "/"
        assert (tmp_path / "weights").is_dir()
        assert (tmp_path / "model_config.yaml").exists()

    def test_param_keys_none_fill_keeps_default_on_flags(self, tmp_path, dataset):
        """PARAM_KEYS fill writes None for unset keys; the trainer must read
        None as "use the default", not as false — a None-filled scan_epoch
        used to silently disable the device-resident epoch loop (and donate
        likewise lost buffer donation) for every CLI run. Also: batch_size
        above len(train) clamps so epochs can't yield zero (drop_last)
        batches and log no train metrics."""
        from scrubvae_tpu.params.param_keys import PARAM_KEYS

        cfg = base_config(tmp_path)
        cfg["data"]["batch_size"] = len(dataset) + 7
        for section, keys in PARAM_KEYS.items():
            cfg.setdefault(section, {})
            for k in keys:
                cfg[section].setdefault(k, None)
        model, info = factory.build_model(
            cfg["model"],
            cfg["disentangle"],
            n_keypts=18,
            direction_process="midfwd",
            arena_size=ARENA,
            discrete_classes=dataset.discrete_classes,
        )
        tr = Trainer(cfg, {"train": dataset}, model, info)
        assert tr.use_scan_epoch is True
        assert tr.train_epoch_fn is not None
        assert tr.batch_size == len(dataset)

    @pytest.mark.slow
    def test_clamped_full_dataset_batch_epoch_logs_metrics(
        self, tmp_path, dataset
    ):
        """Executing an epoch whose batch clamped to len(train) must log
        finite train metrics (used to yield zero drop_last batches)."""
        cfg = base_config(tmp_path)
        cfg["data"]["batch_size"] = len(dataset) + 7
        model, info = factory.build_model(
            cfg["model"],
            cfg["disentangle"],
            n_keypts=18,
            direction_process="midfwd",
            arena_size=ARENA,
            discrete_classes=dataset.discrete_classes,
        )
        tr = Trainer(cfg, {"train": dataset}, model, info)
        m = tr.train_epoch(1)
        assert m and all(np.isfinite(v) for v in m.values())


@pytest.mark.slow
class TestScanEpochEquivalence:
    def test_scan_matches_per_step(self, dataset, tmp_path):
        """The device-resident lax.scan epoch and the host per-step loop
        produce the same final state and metrics for identical batch order
        (both paths consume the same (S, B) index schedule)."""
        cfg_a = base_config(tmp_path / "a")
        cfg_b = base_config(tmp_path / "b")
        cfg_b["train"]["scan_epoch"] = False
        # f32 moments: bf16-stored Adam EMAs quantize the (legitimate)
        # scan-vs-unrolled fusion noise differently per path, which the
        # rsqrt amplifies on near-zero params; the equivalence under test
        # is index-schedule threading, not moment storage.
        cfg_a["train"]["moment_dtype"] = "f32"
        cfg_b["train"]["moment_dtype"] = "f32"

        results = []
        for cfg in (cfg_a, cfg_b):
            model, info = factory.build_model(
                cfg["model"],
                cfg["disentangle"],
                n_keypts=18,
                direction_process="midfwd",
                arena_size=ARENA,
                discrete_classes=dataset.discrete_classes,
            )
            tr = Trainer(cfg, {"train": dataset}, model, info)
            loss_scale = tr.loss_scale_for_epoch(1)
            n = len(dataset)
            steps = 3
            idx = np.arange(steps * 16).reshape(steps, 16) % n
            if tr.use_scan_epoch:
                state, metrics = tr.train_epoch_fn(
                    tr.state, jnp.asarray(idx), loss_scale
                )
                m = {k: float(v) for k, v in metrics.items()}
            else:
                state = tr.state
                sums = {}
                for row in idx:
                    state, metrics = tr.train_step(
                        state, jnp.asarray(row), loss_scale
                    )
                    for k, v in metrics.items():
                        sums[k] = sums.get(k, 0.0) + float(v)
                m = {k: v / steps for k, v in sums.items()}
            results.append((state, m))

        (sa, ma), (sb, mb) = results
        assert set(ma) == set(mb)
        for k in ma:
            np.testing.assert_allclose(ma[k], mb[k], rtol=2e-4, err_msg=k)
        la = jax.tree.leaves(sa.params)
        lb = jax.tree.leaves(sb.params)
        # scan and unrolled compilations fuse differently; Adam's rsqrt
        # amplifies f32 reassociation noise (observed ~3e-4 worst-case on
        # CPU). A real threading/order bug diverges by orders of magnitude
        # more after 3 steps.
        for a, b in zip(la, lb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4
            )


@pytest.mark.slow
class TestScanEvalEquivalence:
    def test_scanned_test_epoch_matches_per_step(self, dataset, tmp_path):
        """The single-dispatch scanned validation epoch produces the same
        loss metrics, the same latent matrix, and the same restrictiveness
        R^2 as the per-batch host loop — including the tail batch (the val
        split here is ~170 windows with batch 16, NOT a batch multiple, so
        this also guards the r1-W3 wraparound/tail bias). The scanned epoch
        returns its final rng carry so the tail continues the identical
        random stream, making the factor injections match exactly."""
        cfg = base_config(tmp_path)
        cfg["disentangle"]["method"] = {
            "conditional": ["avg_speed_3d", "heading"]
        }
        cfg["disentangle"]["features"] = ["avg_speed_3d", "heading"]
        cfg["loss"]["jpe"] = 1.0

        model, info = factory.build_model(
            cfg["model"],
            cfg["disentangle"],
            n_keypts=18,
            direction_process="midfwd",
            arena_size=ARENA,
            discrete_classes=dataset.discrete_classes,
        )
        results = []
        for scan in (True, False):
            c = copy.deepcopy(cfg)
            c["train"]["scan_epoch"] = scan
            tr = Trainer(c, {"train": dataset, "val": dataset}, model, info)
            metrics, z = tr.test_epoch(epoch=5)
            results.append((metrics, z))
        (ma, za), (mb, zb) = results
        assert set(ma) == set(mb)
        # Both paths must cover the FULL val split (tail included).
        assert za.shape[0] == len(dataset)
        np.testing.assert_allclose(za, zb, rtol=1e-4, atol=1e-5)
        for k in ma:
            if k.startswith("r2_gen_restrict"):
                np.testing.assert_allclose(ma[k], mb[k], rtol=5e-3, err_msg=k)
            else:
                np.testing.assert_allclose(ma[k], mb[k], rtol=2e-4, err_msg=k)


class TestEvalMuOnlyFastPath:
    """VERDICT r3 #6: eval-time Cholesky-head elision. When no eval loss
    consumes L (no prior / total_correlation in the loss config) the eval
    step routes through the encoders' mu_only path BY CONSTRUCTION (the
    head is never traced, not merely DCE'd by XLA after the fact — measured
    finding, artifacts/profile/eval_mu_r4: XLA's dead-code elimination
    already strips an unconsumed head, so the flag pins the guarantee at
    the trace level). Against an L-consuming (prior-bearing) program the
    head is structurally required — that case must keep the full encode."""

    def _trainer(self, dataset, tmp_path, with_prior):
        cfg = base_config(tmp_path)
        if not with_prior:
            del cfg["loss"]["prior"]
        model, info = factory.build_model(
            cfg["model"],
            cfg["disentangle"],
            n_keypts=18,
            direction_process="midfwd",
            arena_size=ARENA,
            discrete_classes=dataset.discrete_classes,
        )
        return Trainer(cfg, {"train": dataset, "val": dataset}, model, info)

    def test_mu_only_engages_and_matches(self, dataset, tmp_path):
        from scrubvae_tpu.utils.hlo_flops import static_mxu_flops

        tr_fast = self._trainer(dataset, tmp_path / "fast", with_prior=False)
        tr_full = self._trainer(dataset, tmp_path / "full", with_prior=True)
        # same seed, loss config does not enter init -> identical params
        idx = jnp.arange(16)
        ls_fast = tr_fast.loss_scale_for_epoch(1)
        ls_full = tr_full.loss_scale_for_epoch(1)

        bl_fast, mu_fast = tr_fast.eval_step(tr_fast.state, idx, ls_fast)
        bl_full, mu_full = tr_full.eval_step(tr_full.state, idx, ls_full)
        np.testing.assert_allclose(
            np.asarray(mu_fast), np.asarray(mu_full), rtol=1e-6, atol=1e-7
        )
        for k in bl_fast:
            if k == "total":
                continue  # different loss sets -> different totals
            np.testing.assert_allclose(
                float(bl_fast[k]), float(bl_full[k]), rtol=1e-6, err_msg=k
            )
        # L-consuming program keeps the head and reports the prior metric
        assert "prior" in bl_full and np.isfinite(float(bl_full["prior"]))

        fast_flops = static_mxu_flops(
            tr_fast.eval_step.lower(tr_fast.state, idx, ls_fast)
            .compile().as_text()
        )
        full_flops = static_mxu_flops(
            tr_full.eval_step.lower(tr_full.state, idx, ls_full)
            .compile().as_text()
        )
        assert fast_flops < full_flops, (fast_flops, full_flops)

    def test_mu_only_never_traces_head(self, dataset, tmp_path):
        """The guarantee is at trace level: the UNOPTIMIZED jaxpr of the
        L-free eval step has strictly fewer dot_general equations than the
        prior-bearing one (the head matmul is never traced — XLA DCE is
        not what we rely on)."""
        tr_fast = self._trainer(dataset, tmp_path / "f", with_prior=False)
        tr_full = self._trainer(dataset, tmp_path / "g", with_prior=True)

        def n_dots(tr):
            jaxpr = jax.make_jaxpr(tr.eval_step.__wrapped__)(
                tr.state, jnp.arange(16), tr.loss_scale_for_epoch(1)
            )
            return str(jaxpr).count("dot_general")

        assert n_dots(tr_fast) < n_dots(tr_full)


class TestEvalMCMIRebuild:
    """VERDICT r3 #2: the reference's test_epoch rebuilds the MI estimator
    from a strided slice of the VAL split before the loop (reference
    trainer.py:228-252) and leaves it installed on the model — it must not
    reuse the train-carried KDE buffers, and the rebuilt estimator must
    carry into the next train epoch."""

    def _mcmi_trainer(self, dataset, tmp_path):
        cfg = base_config(tmp_path)
        cfg["disentangle"]["method"] = {
            "conditional": ["avg_speed_3d", "heading"]
        }
        cfg["disentangle"]["features"] = ["avg_speed_3d", "heading"]
        cfg["loss"]["mcmi"] = 0.1
        model, info = factory.build_model(
            cfg["model"],
            cfg["disentangle"],
            n_keypts=18,
            direction_process="midfwd",
            arena_size=ARENA,
            discrete_classes=dataset.discrete_classes,
        )
        return Trainer(cfg, {"train": dataset, "val": dataset}, model, info)

    def test_val_slice_estimator_installed_and_carried(self, dataset, tmp_path):
        tr = self._mcmi_trainer(dataset, tmp_path)
        tr.train_epoch(1)
        carried_x = np.asarray(tr.state.mi_state.x_s)
        assert float(tr.state.mi_state.valid) == 1.0

        metrics, _ = tr.test_epoch(epoch=1)
        assert "mcmi" in metrics

        # The installed buffers are the strided-val-slice encoding under the
        # current params (reference trainer.py:230-252), not the
        # train-carried batch encoding.
        n = len(dataset)
        B = tr.batch_size
        stride = max(n // B, 1)
        idx = jnp.asarray((np.arange(B) * stride) % n)
        data = dataset.batch(idx)
        enc = tr.model.apply(
            {"params": tr.state.params}, data, train=False,
            method=tr.model.encode,
        )
        np.testing.assert_allclose(
            np.asarray(tr.state.mi_state.x_s), np.asarray(enc["mu"]),
            rtol=1e-5, atol=1e-6,
        )
        var = np.concatenate(
            [np.asarray(data[k]) for k in tr.info["conditional_keys"]], axis=-1
        )
        np.testing.assert_allclose(
            np.asarray(tr.state.mi_state.y_s), var, rtol=1e-6, atol=1e-7
        )
        assert not np.allclose(np.asarray(tr.state.mi_state.x_s), carried_x)

        # Carry-over: the next train epoch starts from the val-built
        # estimator (shape-stable through the scanned epoch's carry) and
        # still refreshes per step afterwards.
        tr.train_epoch(2)
        assert tr.state.mi_state.x_s.shape == (B, tr.info["z_dim"])
        assert not np.allclose(
            np.asarray(tr.state.mi_state.x_s), np.asarray(enc["mu"])
        )

    def test_eval_metrics_use_val_estimator(self, dataset, tmp_path):
        """The mcmi_test metric must be computed against the val-slice
        estimator: manually installing a garbage train-carried buffer
        before test_epoch must NOT change the reported mcmi."""
        tr = self._mcmi_trainer(dataset, tmp_path)
        tr.train_epoch(1)
        m_a, _ = tr.test_epoch(epoch=1)

        import scrubvae_tpu.models.scrubbers as scr

        garbage = scr.mi_init(
            jnp.full_like(tr.state.mi_state.x_s, 37.0),
            jnp.full_like(tr.state.mi_state.y_s, -11.0),
            bandwidth=1.0,
            var_mode="sphere",
            valid=1.0,
        )
        tr.state = tr.state.replace(mi_state=garbage)
        m_b, _ = tr.test_epoch(epoch=1)
        np.testing.assert_allclose(m_a["mcmi"], m_b["mcmi"], rtol=1e-5)


class TestLowPrecisionAdam:
    """scale_by_adam_lowp: f32 storage matches optax exactly; bf16 storage
    tracks it closely (the default flagship configuration)."""

    def _run(self, tx, steps=20, seed=0):
        import optax as _optax

        from scrubvae_tpu.train import optim as _optim

        rng = np.random.default_rng(seed)
        params = {
            "w": jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32)),
            "b": jnp.asarray(rng.normal(size=(6,)).astype(np.float32)),
        }
        state = tx.init(params)
        for i in range(steps):
            grads = jax.tree.map(
                lambda p: jnp.asarray(
                    rng.normal(size=p.shape).astype(np.float32)
                ),
                params,
            )
            updates, state = tx.update(grads, state, params)
            params = _optax.apply_updates(params, updates)
        return params

    def test_f32_matches_optax_adam(self):
        import optax

        from scrubvae_tpu.train.optim import scale_by_adam_lowp

        ours = optax.chain(
            scale_by_adam_lowp(mu_dtype=jnp.float32, nu_dtype=jnp.float32),
            optax.scale_by_learning_rate(1e-2),
        )
        ref = optax.adam(1e-2)
        p1 = self._run(ours)
        p2 = self._run(ref)
        for k in p1:
            np.testing.assert_allclose(p1[k], p2[k], rtol=1e-6, atol=1e-7)

    def test_bf16_storage_tracks_f32(self):
        import optax

        from scrubvae_tpu.train.optim import scale_by_adam_lowp

        lowp = optax.chain(
            scale_by_adam_lowp(), optax.scale_by_learning_rate(1e-2)
        )
        full = optax.chain(
            scale_by_adam_lowp(mu_dtype=jnp.float32, nu_dtype=jnp.float32),
            optax.scale_by_learning_rate(1e-2),
        )
        p1 = self._run(lowp, steps=50)
        p2 = self._run(full, steps=50)
        for k in p1:
            np.testing.assert_allclose(p1[k], p2[k], rtol=0.05, atol=0.05)

    def test_bf16_nu_tracks_slow_scale_drift(self):
        """Long-horizon regression for the stochastically-rounded moment
        store (ADVICE r1): with a slowly decaying gradient scale the per-step
        nu increment ((1-b2)=1e-3 relative) is below bf16's ~4e-3 ulp, so a
        round-to-nearest bf16 store would absorb it and nu would stall at its
        early value. Stochastic rounding must keep nu tracking the f32
        trajectory over thousands of steps."""
        from scrubvae_tpu.train.optim import scale_by_adam_lowp

        g0 = jnp.linspace(0.5, 2.0, 64).astype(jnp.float32)
        steps = 3000
        decay = 1.0 - 4e-4  # gradient scale falls to ~30% over the run

        def final_nu(tx):
            params = {"w": jnp.zeros(64, jnp.float32)}
            state = tx.init(params)

            def body(state, t):
                g = {"w": g0 * decay**t}
                _, state = tx.update(g, state, params)
                return state, None

            state, _ = jax.jit(
                lambda s: jax.lax.scan(
                    body, s, jnp.arange(steps, dtype=jnp.float32)
                )
            )(state)
            return np.asarray(state.nu["w"], dtype=np.float32)

        nu_lowp = final_nu(scale_by_adam_lowp())
        nu_f32 = final_nu(
            scale_by_adam_lowp(mu_dtype=jnp.float32, nu_dtype=jnp.float32)
        )
        rel_err = np.abs(nu_lowp - nu_f32) / nu_f32
        # RTN bf16 stalls at ~3x the true value here; SR stays within a few %.
        assert np.median(rel_err) < 0.10, f"median rel err {np.median(rel_err)}"
        assert np.max(rel_err) < 0.25, f"max rel err {np.max(rel_err)}"

    def test_adamw_uses_torch_default_weight_decay(self):
        """Pure-decay check: with zero gradients after warmup, adamw shrinks
        weights by lr*0.01 per step (torch AdamW default, reference
        trainer.py:65)."""
        from scrubvae_tpu.train.optim import make_optimizer

        tx = make_optimizer(
            {"lr": 0.1, "optimizer": "adamw", "lr_schedule": None,
             "clip_norm": 0},
            steps_per_epoch=1,
        )
        params = {"w": jnp.ones((4,))}
        state = tx.init(params)
        import optax

        zero = {"w": jnp.zeros((4,))}
        if hasattr(tx, "update_and_apply"):  # fused default (optim.FusedAdamW)
            new, state = tx.update_and_apply(zero, state, params)
        else:
            updates, state = tx.update(zero, state, params)
            new = optax.apply_updates(params, updates)
        np.testing.assert_allclose(
            np.asarray(new["w"]), 1.0 - 0.1 * 0.01, rtol=1e-5
        )


class TestNonfiniteTripwire:
    def test_halts_with_diagnostic_state(self, dataset, tmp_path):
        """A NaN epoch loss raises (instead of training dead weights on)
        and leaves a diagnostic train-state checkpoint; the divergence
        tripwire is default-on under PARAM_KEYS None-fill and opt-out via
        train.halt_on_nonfinite: false."""
        cfg = base_config(tmp_path)
        model, info = factory.build_model(
            cfg["model"], cfg["disentangle"], n_keypts=dataset.n_keypts,
            direction_process="midfwd", arena_size=ARENA,
            discrete_classes=dataset.discrete_classes,
            loss_keys=cfg["loss"].keys(),
        )
        tr = Trainer(cfg, {"train": dataset}, model, info)
        tr.train_epoch = lambda epoch: {"total": float("nan"), "rotation": 1.0}
        with pytest.raises(FloatingPointError, match="non-finite"):
            tr.fit(num_epochs=1)
        assert (pathlib.Path(cfg["out_path"]) / "checkpoints" / "epoch_1.msgpack").exists()

        cfg2 = base_config(tmp_path / "optout")
        cfg2["train"]["halt_on_nonfinite"] = False
        tr2 = Trainer(cfg2, {"train": dataset}, model, info)
        tr2.train_epoch = lambda epoch: {"total": float("nan")}
        tr2.fit(num_epochs=1)  # trains through (reference behavior)

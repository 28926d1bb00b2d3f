"""Gradient-level differential parity against the reference (VERDICT r2 #2).

PARITY §1 compares multi-epoch loss *trajectories*, where optimizer chaos
compounds; nothing there localizes whether late-epoch drift is chaos or a
semantics gap. This file closes that: same initial weights (torch export →
utils.torch_import), same single batch, f32 end-to-end, deterministic
forward (reparameterization noise pinned to zero on both sides), then
``loss.backward()`` (reference train/trainer.py:150-165 semantics,
losses.py:182-322) vs ``jax.grad`` of our fused loss — compared per
parameter leaf by relative L2 error and cosine similarity.

Leaf alignment is free: the reference per-parameter gradients have the same
shapes/layouts as the parameters, so running the gradient state_dict through
``convert_resvae_state_dict`` (the weight importer) aligns them to our tree
with all transpose/flatten-order permutations applied — which is exactly the
orthogonal rearrangement that maps gradients too.

Determinism pins:
- ``torch.randn_like -> zeros``: reference z = L·0 + mu == mu, matching our
  ``train=True, rng=None`` forward (residual.py:297-302); dz/dL = eps = 0 on
  both sides, so gradients agree exactly, in train-mode BatchNorm.
- cfg4 (adversarial_net + mcmi): both MI estimators are seeded with the same
  canned (x_s, y_s) buffers; the adversarial shuffle permutation is pinned
  on both sides, and our feat_slices are set to the reference's
  single-column convention (disentangle.py:678-684 shuffles
  ``var[:, disentangle_keys.index(key)]``; SURVEY 3.6).

Documented deviations asserted to flip agreement exactly when toggled:
- ``disentangle.gr_legacy_norm`` (reference divides the accumulated GR
  ensemble loss inside the head loop, losses.py:279-284): cfg6 gradients
  match with the gate on and diverge on the GR head leaves with it off.
"""

import importlib.util
import pathlib
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = pathlib.Path("/root/reference/src")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not available"
)

torch = pytest.importorskip("torch")

HERE = pathlib.Path(__file__).resolve().parent.parent

from _ref_stubs import install_ref_stubs  # noqa: E402


def _load_rb():
    spec = importlib.util.spec_from_file_location(
        "ref_baseline_for_grad_tests", HERE / "tools" / "ref_baseline.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # small operating point: parity is architecture-independent and compile
    # time dominates this suite on the 1-core host
    mod.MODEL_CFG.update(z_dim=16, window=31, channel=[8, 8, 16, 16, 32])
    return mod


rb = _load_rb()

BATCH = 48
SEED = 0


@pytest.fixture(scope="module")
def ref():
    install_ref_stubs()
    r = rb.load_reference()
    rb.patch_cuda_ones(torch)
    return r


@pytest.fixture(scope="module")
def shared_data():
    datasets = rb.build_datasets(360, {})
    data_np, n = rb.materialize(datasets["train"])
    rows = np.arange(BATCH)
    batch_np = {k: v[rows] for k, v in data_np.items()}
    return datasets, batch_np


def _ref_config(cfg_id, n_iter=5):
    spec = rb.LADDER[cfg_id]
    dkeys = sorted({k for v in spec["methods"].values() for k in v})
    return {
        "loss": dict(spec["loss"]),
        "disentangle": {
            "method": spec["methods"],
            "features": dkeys,
            "n_iter": n_iter,
            "bandwidth": 1.0,
            "var_mode": "sphere",
            "alpha": 1.0,
            "polynomial": 1,
            "l2_reg": 0,
        },
        "model": dict(rb.MODEL_CFG),
    }


def _build_ours(cfg_id, datasets, tmp_path, gr_legacy_norm=False):
    """Our model + Trainer wired exactly like production (run_ours shape)."""
    from scrubvae_tpu import factory
    from scrubvae_tpu.train.trainer import Trainer

    spec = rb.LADDER[cfg_id]
    feats = sorted({k for v in spec["methods"].values() for k in v})
    cfg = {
        "data": {
            "batch_size": BATCH,
            "dataset": "synthetic",
            "direction_process": "midfwd",
            "arena_size": rb.ARENA.tolist(),
        },
        "disentangle": {
            "method": spec["methods"],
            "features": feats,
            "alpha": 1.0,
            "balance_loss": None,
            "bandwidth": 1.0,
            "polynomial": 1,
            "var_mode": "sphere",
            "l2_reg": 0.0,
            "n_iter": 5,
            "adv_fit": False,
            "gr_legacy_norm": gr_legacy_norm,
        },
        "model": dict(rb.MODEL_CFG),
        "train": {
            "lr": 1e-4,
            "optimizer": "adam",
            "lr_schedule": None,
            "num_epochs": 1,
            "beta_anneal": None,
            "minimal_test": False,
            "seed": SEED,
            "eval_start_epoch": 5,
            "moment_dtype": "f32",
        },
        "loss": dict(spec["loss"]),
        "out_path": str(tmp_path / f"ours{cfg_id}") + "/",
    }
    for d in ("weights", "checkpoints", "latents"):
        (tmp_path / f"ours{cfg_id}" / d).mkdir(parents=True, exist_ok=True)
    model, info = factory.build_model(
        cfg["model"],
        cfg["disentangle"],
        n_keypts=18,
        direction_process="midfwd",
        arena_size=rb.ARENA,
        discrete_classes=datasets["train"].discrete_classes,
    )
    trainer = Trainer(cfg, datasets, model, info)
    return trainer, cfg


def _import_shared_init(trainer, pth):
    from scrubvae_tpu.utils.torch_import import import_torch_weights

    template = {"params": trainer.state.params}
    if trainer.state.batch_stats is not None:
        template["batch_stats"] = trainer.state.batch_stats
    imported = import_torch_weights(pth, template, verbose=False)
    trainer.state = trainer.state.replace(
        params=imported["params"],
        batch_stats=imported.get("batch_stats", trainer.state.batch_stats),
    )


def _ref_grads(ref, model, batch_np, cfg_id, monkeypatch):
    """Forward (train mode, eps pinned to 0) + backward on one batch."""
    config = _ref_config(cfg_id)
    data_t = {k: torch.from_numpy(np.asarray(v)) for k, v in batch_np.items()}
    model.train()
    monkeypatch.setattr(torch, "randn_like", lambda t: torch.zeros_like(t))
    data_o = model(data_t)
    bl = ref.losses.get_batch_loss(
        model, data_t, data_o, config["loss"], config["disentangle"]
    )
    for p in model.parameters():
        p.grad = None
    bl["total"].backward()
    grads = {
        n: p.grad.detach().numpy().astype(np.float32)
        for n, p in model.named_parameters()
        if p.grad is not None
    }
    losses = {k: float(v) for k, v in bl.items()}
    return losses, grads


def _our_grads(trainer, batch_np, feat_slices_override=None):
    """jax.grad of the fused loss (same assembly as train/step.py:85-121)."""
    from scrubvae_tpu.train.losses import compute_batch_loss

    state = trainer.state
    data = {k: jnp.asarray(v) for k, v in batch_np.items()}
    loss_scale = {k: jnp.asarray(float(v)) for k, v in trainer.loss_cfg.items()}
    feat_slices = (
        feat_slices_override
        if feat_slices_override is not None
        else trainer.feat_slices
    )
    tree = trainer.train_ds.kinematic_tree
    model = trainer.model

    def loss_fn(params):
        variables = {"params": params}
        mutable = False
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
            mutable = ["batch_stats"]
        out = model.apply(
            variables,
            data,
            rng=None,  # z = mu (residual.py:297-302), matching eps = 0
            train=True,
            mutable=mutable,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        if mutable:
            out, _ = out
        bl, _ = compute_batch_loss(
            model,
            data,
            out,
            loss_scale,
            trainer.dis_cfg,
            tree,
            state.scrub_state,
            adv_bundle=trainer.adv_bundle,
            adv_states=state.adv_states,
            mi_state=state.mi_state,
            rng=jax.random.PRNGKey(2),
            disentangle_keys=tuple(trainer.info["disentangle_keys"]),
            conditional_keys=tuple(trainer.info["conditional_keys"]),
            feat_slices=feat_slices,
            static_loss_scale={k: float(v) for k, v in trainer.loss_cfg.items()},
        )
        return bl["total"], bl

    (_, bl), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
        state.params
    )
    losses = {k: float(v) for k, v in bl.items()}
    return losses, grads


def _align_ref_grads(grad_sd, our_grads):
    """Reference grad state_dict -> our tree via the weight importer's layout
    math; NaN sentinel marks leaves the importer did not fill."""
    from scrubvae_tpu.utils.torch_import import convert_resvae_state_dict

    template = {
        "params": jax.tree.map(
            lambda g: np.full(np.shape(g), np.nan, np.float32), our_grads
        )
    }
    converted, _, _ = convert_resvae_state_dict(grad_sd, template)
    return converted["params"]


def _compare(
    our_grads, ref_tree, *, rtol=2.5e-2, scalar_rtol=0.25, cos_tol=2e-4, label=""
):
    """Per-leaf gradient comparison with measured-noise-aware tolerances.

    Calibration (cfg1, this operating point, vs an f64 ground-truth gradient
    of our loss): torch's own f32 gradients sit a median 5.9e-3 relative from
    the f64 truth, ours 2.9e-3 — pure accumulation-ordering noise, so
    ref-vs-ours relative differences up to ~1e-2 carry no semantic signal.
    Conv biases that feed BatchNorm have mathematically zero gradient (BN
    subtracts the mean); both stacks produce ~1e-3-absolute f32 noise there
    (|g64| ~ 1e-12), so leaves below a global-scale noise floor are skipped.
    Size-1 leaves (shared PReLU alphas) sum B*C*T heavily-cancelling terms
    with no cross-element averaging: the reference's OWN f32 alpha gradients
    deviate from its f64 gradients by up to 17.3% relative (median 2.7e-3;
    measured on cfg4 by casting the torch model to double), so scalar leaves
    get scalar_rtol and a same-sign check instead of rtol.
    Real semantics gaps (e.g. the gr_legacy_norm toggle below) show up as
    rel >= O(0.1) on whole leaf groups, far above these tolerances.
    """
    import flax

    ours_flat = flax.traverse_util.flatten_dict(our_grads, sep="/")
    ref_flat = flax.traverse_util.flatten_dict(ref_tree, sep="/")
    gscale = max(
        np.linalg.norm(np.asarray(v, np.float32))
        for v in ref_flat.values()
        if not np.isnan(np.asarray(v)).all()
    )
    floor = 1e-6 * gscale
    compared, skipped, failures, rels = 0, [], [], []
    for path, g_ours in ours_flat.items():
        g_ref = np.asarray(ref_flat[path], np.float32)
        if np.isnan(g_ref).all():
            skipped.append(path)
            continue
        g_ours = np.asarray(g_ours, np.float32)
        compared += 1
        n_ref = np.linalg.norm(g_ref)
        n_ours = np.linalg.norm(g_ours)
        diff = np.linalg.norm(g_ours - g_ref)
        if max(n_ref, n_ours) < floor:
            continue  # zero-gradient leaf (bias into BN): both sides noise
        rel = diff / (n_ref + 1e-12)
        cos = float((g_ours * g_ref).sum() / ((n_ours * n_ref) + 1e-30))
        rels.append(rel)
        tol = scalar_rtol if g_ref.size == 1 else rtol
        if g_ref.size == 1 and diff <= 1e-3 * gscale and cos > 0:
            # Scalar leaves (PReLU alphas) are whole-tensor sum reductions
            # with heavy cancellation: their f32 value can be orders of
            # magnitude below their summands, so ordering noise produces
            # large RELATIVE error on a semantically-negligible ABSOLUTE
            # difference (hit when the reference-exact integer-truncated
            # offsets, PARITY.md r5, shifted one alpha grad to rel 0.29 at
            # |diff| ~1e-4 of the gradient scale). Same-sign + tiny vs the
            # global gradient scale = agreement.
            continue
        if rel > tol or cos < 1.0 - cos_tol:
            failures.append(
                f"{label}{path}: rel={rel:.3e} cos={cos:.8f} "
                f"diff/gscale={diff / gscale:.3e}"
            )
    assert compared > 0, "no leaves compared - importer mapping broke"
    assert not failures, (
        f"{len(failures)}/{compared} leaves diverged:\n" + "\n".join(failures[:20])
    )
    med = float(np.median(rels))
    assert med < 1e-2, f"{label}median rel grad error {med:.3e} >= 1e-2"
    return compared, skipped


def _loss_parity(our_losses, ref_losses, skip=(), atol=1e-4, rtol=1e-4):
    for k, v in ref_losses.items():
        if k in skip or k not in our_losses:
            continue
        np.testing.assert_allclose(
            our_losses[k], v, rtol=rtol, atol=atol, err_msg=f"loss {k}"
        )


def _run_config(cfg_id, ref, shared_data, tmp_path, monkeypatch, **ours_kwargs):
    datasets, batch_np = shared_data
    # full-dataset classes, NOT the batch's: the conditional one-hot width
    # (and so decoder fc_in) must match between the two models
    discrete = {
        k: np.asarray(v, np.float32)
        for k, v in datasets["train"].discrete_classes.items()
    }
    skel_tree = [list(map(int, c)) for c in datasets["train"].kinematic_tree.chains]
    ref_model, dkeys = rb.build_ref_model(
        ref, torch, cfg_id, discrete, skel_tree, SEED
    )
    pth = tmp_path / f"init{cfg_id}.pth"
    torch.save({k: v.cpu() for k, v in ref_model.state_dict().items()}, pth)

    trainer, _ = _build_ours(cfg_id, datasets, tmp_path, **ours_kwargs)
    _import_shared_init(trainer, pth)
    return ref_model, trainer, dkeys


class TestGradientParity:
    # cfg1 (vanilla) runs in the default tier as the canary; the scrubbed
    # configs and the adversarial/mcmi config are slow-tier (each costs
    # ~1-2 min of torch+XLA compile on the 1-core host; full file ~10 min)
    @pytest.mark.parametrize(
        "cfg_id",
        [
            1,
            pytest.param(2, marks=pytest.mark.slow),
            pytest.param(3, marks=pytest.mark.slow),
            pytest.param(5, marks=pytest.mark.slow),
        ],
    )
    def test_deterministic_configs(
        self, cfg_id, ref, shared_data, tmp_path, monkeypatch
    ):
        ref_model, trainer, _ = _run_config(
            cfg_id, ref, shared_data, tmp_path, monkeypatch
        )
        _, batch_np = shared_data
        ref_losses, ref_grads = _ref_grads(
            ref, ref_model, batch_np, cfg_id, monkeypatch
        )
        our_losses, our_grads = _our_grads(trainer, batch_np)
        _loss_parity(our_losses, ref_losses)
        ref_tree = _align_ref_grads(ref_grads, our_grads)
        compared, _ = _compare(our_grads, ref_tree, label=f"cfg{cfg_id} ")
        assert compared >= 50  # full encoder+decoder stack covered

    @pytest.mark.slow
    def test_cfg4_adv_mcmi(self, ref, shared_data, tmp_path, monkeypatch):
        """adversarial_net + mcmi: MI buffers seeded identically, shuffle
        permutation pinned, feat_slices per the reference's single-column
        convention."""
        from scrubvae_tpu.models import scrubbers as scr

        cfg_id = 4
        ref_model, trainer, dkeys = _run_config(
            cfg_id, ref, shared_data, tmp_path, monkeypatch
        )
        _, batch_np = shared_data

        rng = np.random.default_rng(11)
        z_dim = rb.MODEL_CFG["z_dim"]
        var_dim = 5  # avg_speed_3d(3) + heading(2)
        xs = rng.normal(size=(64, z_dim)).astype(np.float32)
        ys = rng.normal(size=(64, var_dim)).astype(np.float32)
        ref_model.mi_estimator = ref.dis.MutInfoEstimator(
            torch.from_numpy(xs),
            torch.from_numpy(ys),
            bandwidth=1.0,
            var_mode="sphere",
            device="cpu",
        )
        trainer.state = trainer.state.replace(
            mi_state=scr.mi_init(
                jnp.asarray(xs), jnp.asarray(ys), bandwidth=1.0, var_mode="sphere"
            )
        )

        # identical discriminator weights: reference AdvNetScrubber ensemble
        # -> our AdvNet params (Dense kernel = weight.T)
        import flax

        adv_key = "avg_speed_3d"
        ref_adv = ref_model.disentangle["adversarial_net"][adv_key]
        adv_state = trainer.state.adv_states[adv_key]
        flat = flax.traverse_util.flatten_dict(adv_state.params, sep="/")
        mapped = 0
        for name, p in ref_adv.named_parameters():
            m = re.match(r"ensemble\.(mlp\d)\.(\d+)\.(weight|bias)", name)
            assert m, name
            mlp, idx, wb = m.groups()
            path = f"params/MLPEnsemble_0/{mlp}_{int(idx) // 2}/" + (
                "kernel" if wb == "weight" else "bias"
            )
            v = p.detach().numpy().astype(np.float32)
            v = v.T if wb == "weight" else v
            assert flat[path].shape == v.shape, (path, flat[path].shape, v.shape)
            flat[path] = jnp.asarray(v)
            mapped += 1
        # 11 linears x (w, b): mlp1/3/4 have 3 each, mlp2 has 2
        # (reference disentangle.py:592-626)
        assert mapped == 22
        new_adv = adv_state.replace(
            params=flax.traverse_util.unflatten_dict(flat, sep="/")
        )
        trainer.state = trainer.state.replace(
            adv_states={adv_key: new_adv}
        )

        # pin the shuffle permutation on both sides
        perm = np.random.default_rng(12).permutation(BATCH)
        monkeypatch.setattr(
            torch, "randperm", lambda n, **kw: torch.from_numpy(perm[:n].copy())
        )
        monkeypatch.setattr(
            jax.random,
            "permutation",
            lambda key, n, **kw: jnp.asarray(perm[:n]),
        )

        ref_losses, ref_grads = _ref_grads(
            ref, ref_model, batch_np, cfg_id, monkeypatch
        )
        # reference shuffle convention: a single var column indexed by the
        # key's position in disentangle_keys (SURVEY 3.6)
        ref_slices = {adv_key: np.asarray([dkeys.index(adv_key)])}
        our_losses, our_grads = _our_grads(
            trainer, batch_np, feat_slices_override=ref_slices
        )
        _loss_parity(our_losses, ref_losses)
        ref_tree = _align_ref_grads(ref_grads, our_grads)
        _compare(our_grads, ref_tree, label="cfg4 ")

        # the intended-slices deviation is visible: shuffling the feature's
        # full column slice changes the _an loss
        our_losses_full, _ = _our_grads(trainer, batch_np)
        assert abs(
            our_losses_full[adv_key + "_an"] - ref_losses[adv_key + "_an"]
        ) > 1e-6

    def test_cfg6_gr_legacy_norm_toggle(
        self, ref, shared_data, tmp_path, monkeypatch
    ):
        """linear + grad_reversal: gradients match the reference exactly with
        disentangle.gr_legacy_norm on, and the GR head leaves diverge with
        the intended normalization (the gate flips agreement)."""
        cfg_id = 6
        ref_model, trainer, _ = _run_config(
            cfg_id, ref, shared_data, tmp_path, monkeypatch,
            gr_legacy_norm=True,
        )
        datasets, batch_np = shared_data
        ref_losses, ref_grads = _ref_grads(
            ref, ref_model, batch_np, cfg_id, monkeypatch
        )
        our_losses, our_grads = _our_grads(trainer, batch_np)
        _loss_parity(our_losses, ref_losses)
        ref_tree = _align_ref_grads(ref_grads, our_grads)
        compared, _ = _compare(our_grads, ref_tree, label="cfg6 legacy ")

        # scrubber-head leaves were actually part of the comparison
        import flax

        flat = flax.traverse_util.flatten_dict(ref_tree, sep="/")
        gr_leaves = [
            p for p in flat if "/gr_" in "/" + p and not np.isnan(flat[p]).all()
        ]
        lin_leaves = [
            p for p in flat if "linear_" in p and not np.isnan(flat[p]).all()
        ]
        # GR MLPEnsemble: 11 linears x (w, b) (reference disentangle.py:
        # 592-626); two LinearProjection kernels (no bias)
        assert len(gr_leaves) == 22 and len(lin_leaves) == 2

        # flip the gate off: intended normalization -> the _gr loss and the
        # GR-path gradients must now differ from the reference
        trainer_off, _ = _build_ours(cfg_id, datasets, tmp_path)
        pth = tmp_path / f"init{cfg_id}.pth"
        _import_shared_init(trainer_off, pth)
        our_losses_off, our_grads_off = _our_grads(trainer_off, batch_np)
        assert (
            abs(our_losses_off["avg_speed_3d_gr"] - ref_losses["avg_speed_3d_gr"])
            > 1e-6
        )
        flat_off = flax.traverse_util.flatten_dict(our_grads_off, sep="/")
        flat_ref = flax.traverse_util.flatten_dict(ref_tree, sep="/")
        diverged = [
            p
            for p in gr_leaves
            if np.linalg.norm(flat_off[p] - flat_ref[p])
            > 0.05 * (np.linalg.norm(flat_ref[p]) + 1e-12)
        ]
        assert diverged, "gr_legacy_norm off must change GR head gradients"

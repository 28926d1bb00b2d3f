"""Measure the reference implementation (torch, CPU) against this framework
on identical data, identical batch order, and identical initial weights.

This is the round-2 differential baseline (VERDICT r1 task 1): the reference
is CUDA-first but its train/eval math is device-parameterized
(/root/reference/src/scrubvae/train/trainer.py:102-213 ``train_test_epoch``,
``test_epoch``), so we drive those exact functions on CPU at smoke scale —
only library stubs (wandb/line_profiler/neuroposelib) and one documented
monkeypatch (torch.ones device="cuda" inside MovingAvgLeastSquares.update,
disentangle.py:494) are injected; no reference code is edited.

Both sides see:
- the same windowed tensors (materialized once from this framework's
  StreamDataset over a structured synthetic stream),
- the same per-epoch batch permutations (numpy default_rng(seed), the
  stream this framework's Trainer draws from),
- the same initial weights (reference torch init exported and imported
  through utils.torch_import).

Output: <out>/ref_metrics.json + <out>/ours_metrics.json with per-epoch loss
trajectories and throughput, plus <out>/weights/epoch_0.pth (the shared
init) for reuse.

Usage:
  python tools/ref_baseline.py --config 1 --epochs 20 --frames 6000 \
      --out /tmp/refbase [--side both|ref|ours]
"""

from __future__ import annotations

import argparse
import importlib
import json
import pathlib
import sys
import time
import types

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))
REF = pathlib.Path("/root/reference/src")

ARENA = np.asarray([[-290.0, -290.0, 0.0], [290.0, 290.0, 120.0]], np.float32)

LADDER = {
    1: dict(methods={}, loss={"rotation": 1.0, "prior": 0.001, "root": 0.01, "jpe": 1.0}),
    2: dict(
        methods={"conditional": ["avg_speed_3d", "heading"]},
        loss={"rotation": 1.0, "prior": 0.001, "root": 0.01, "jpe": 1.0},
    ),
    3: dict(
        methods={
            "conditional": ["avg_speed_3d", "heading"],
            "moving_avg_lsq": ["avg_speed_3d", "heading"],
        },
        loss={
            "rotation": 1.0,
            "prior": 0.001,
            "root": 0.01,
            "jpe": 1.0,
            "avg_speed_3d_mals": 100.0,
            "heading_mals": 100.0,
        },
    ),
    4: dict(
        methods={
            "conditional": ["avg_speed_3d", "heading"],
            "adversarial_net": ["avg_speed_3d"],
        },
        loss={
            "rotation": 1.0,
            "prior": 0.001,
            "root": 0.01,
            "jpe": 1.0,
            "mcmi": 2.0,
            "avg_speed_3d_an": 1.0,
        },
    ),
    5: dict(
        methods={
            "conditional": ["avg_speed_3d", "heading", "ids"],
            "moving_avg_lsq": ["avg_speed_3d", "heading"],
            "qda": ["ids"],
        },
        loss={
            "rotation": 1.0,
            "prior": 0.001,
            "root": 0.01,
            "jpe": 1.0,
            "avg_speed_3d_mals": 100.0,
            "heading_mals": 100.0,
            "ids_qda": 0.1,
        },
    ),
    # linear null-space projection + gradient-reversal ensemble (the two
    # trainable scrubber heads that live in the main parameter tree); used
    # by the gradient-level parity tests (tests/test_gradient_parity.py).
    # NOTE: once "linear" is present the reference loss loop resolves
    # z_null for EVERY disentangle key of EVERY method (losses.py:231-233),
    # so linear must cover all conditional keys or the reference crashes.
    6: dict(
        methods={
            "conditional": ["avg_speed_3d", "heading"],
            "linear": ["avg_speed_3d", "heading"],
            "grad_reversal": ["avg_speed_3d"],
        },
        loss={
            "rotation": 1.0,
            "prior": 0.001,
            "root": 0.01,
            "jpe": 1.0,
            "avg_speed_3d_lin": 1.0,
            "heading_lin": 1.0,
            "avg_speed_3d_gr": 1.0,
        },
    ),
}

MODEL_CFG = dict(
    type="rcnn",
    z_dim=32,
    window=51,
    channel=[16, 32, 32, 64, 64],
    kernel=5,
    diag=False,
    activation="prelu",
    init_dilation=None,
    prior="gaussian",
    start_epoch=0,
    load_model=None,
)


# ---------------------------------------------------------------------------
# Reference loading (stubs only; the checkout is read-only and unedited)
# ---------------------------------------------------------------------------


def load_reference():
    # library stubs for modules the smoke path never exercises
    if "wandb" not in sys.modules:
        wandb = types.ModuleType("wandb")
        wandb.log = lambda *a, **k: None
        sys.modules["wandb"] = wandb
    if "line_profiler" not in sys.modules:
        lp = types.ModuleType("line_profiler")
        lp.profile = lambda f: f
        sys.modules["line_profiler"] = lp
    if "neuroposelib" not in sys.modules:
        npl = types.ModuleType("neuroposelib")
        npl.read = types.SimpleNamespace()
        npl.visualization = types.SimpleNamespace()
        npl.DataStruct = object
        sys.modules["neuroposelib"] = npl

    for pkg in ("scrubvae", "scrubvae.model", "scrubvae.train", "scrubvae.data",
                "scrubvae.eval", "scrubvae.plot"):
        if pkg not in sys.modules:
            mod = types.ModuleType(pkg)
            mod.__path__ = [str(REF / pkg.replace(".", "/"))]
            sys.modules[pkg] = mod

    # scrubvae.get is only imported transitively (eval.metrics); stub it
    if "scrubvae.get" not in sys.modules:
        sys.modules["scrubvae.get"] = types.ModuleType("scrubvae.get")
        sys.modules["scrubvae"].get = sys.modules["scrubvae.get"]

    # the plot shell needs trace/PLANE attrs for eval.eval's import
    constants = importlib.import_module("scrubvae.plot.constants")
    plot_pkg = sys.modules["scrubvae.plot"]
    plot_pkg.trace = lambda *a, **k: None
    plot_pkg.PLANE = constants.PLANE
    plot_eval = importlib.import_module("scrubvae.plot.eval")
    plot_pkg.eval = plot_eval

    eval_eval = importlib.import_module("scrubvae.eval.eval")
    eval_pkg = sys.modules["scrubvae.eval"]
    eval_pkg.generative_restrictiveness = eval_eval.generative_restrictiveness
    eval_pkg.project_to_null = eval_eval.project_to_null
    eval_pkg.cluster = importlib.import_module("scrubvae.eval.cluster")

    res = importlib.import_module("scrubvae.model.residual")
    dis = importlib.import_module("scrubvae.model.disentangle")
    losses = importlib.import_module("scrubvae.train.losses")
    trainer = importlib.import_module("scrubvae.train.trainer")
    return types.SimpleNamespace(res=res, dis=dis, losses=losses, trainer=trainer)


def patch_cuda_ones(torch):
    """disentangle.py:494 hardcodes device="cuda" for the MALS bias column;
    route it to CPU without editing the read-only checkout."""
    real_ones = torch.ones

    def ones(*args, **kwargs):
        if kwargs.get("device") == "cuda" and not torch.cuda.is_available():
            kwargs["device"] = "cpu"
        return real_ones(*args, **kwargs)

    torch.ones = ones


# ---------------------------------------------------------------------------
# Shared data
# ---------------------------------------------------------------------------


def build_datasets(frames: int, methods: dict):
    from scrubvae_tpu.data.dataset import StreamDataset
    from scrubvae_tpu.data.pipeline import build_frame_store
    from scrubvae_tpu.data.skeleton import load_skeleton
    from scrubvae_tpu.data.synthetic import structured_pose_stream

    skel = load_skeleton(str(HERE / "configs" / "mouse_skeleton.yaml"))
    feats = ("x6d", "root", "offsets", "target_pose", "avg_speed_3d", "heading", "ids")
    out = {}
    for split, seed, n in (("train", 0, frames), ("val", 1, frames // 3)):
        pose, ids = structured_pose_stream(skel, n_frames=n, n_ids=4, seed=seed)
        store = build_frame_store(pose, ids, skel, window=MODEL_CFG["window"], stride=2)
        out[split] = StreamDataset(
            store,
            skel,
            feats,
            "midfwd",
            arena_size=ARENA,
            discrete_classes={"ids": np.unique(ids)},
        )
    return out


def materialize(ds):
    import jax.numpy as jnp

    n = len(ds)
    batch = ds.batch(jnp.arange(n))
    return {k: np.asarray(v) for k, v in batch.items()}, n


class ListLoader:
    """Reference train_test_epoch iterates a loader of dict batches and
    calls len(); a plain list of pre-built dicts satisfies both."""

    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def epoch_perms(seed: int, n: int, batch: int, epochs: int):
    """The exact permutation stream this framework's Trainer draws
    (trainer.py:167,207): numpy default_rng(seed), one permutation per
    epoch, truncated to full batches."""
    rng = np.random.default_rng(seed)
    steps = n // batch
    return [rng.permutation(n)[: steps * batch].reshape(steps, batch) for _ in range(epochs)]


# ---------------------------------------------------------------------------
# Reference side
# ---------------------------------------------------------------------------


def build_ref_model(ref, torch, cfg_id: int, discrete_classes, tree, seed: int):
    spec = LADDER[cfg_id]
    methods = spec["methods"]
    loss = spec["loss"]
    z = MODEL_CFG["z_dim"]
    fdims = {"avg_speed_3d": 3, "heading": 2, "ids": len(discrete_classes["ids"])}

    torch.manual_seed(seed)
    disentangle = {}
    if "linear" in methods:
        disentangle["linear"] = {
            k: ref.dis.LinearProjection(z, fdims[k], bias=False)
            for k in methods["linear"]
        }
    if "moving_avg_lsq" in methods:
        disentangle["moving_avg_lsq"] = {
            k: ref.dis.MovingAvgLeastSquares(
                z, fdims[k], bias=loss[k + "_mals"] < 0, polynomial_order=1, l2_reg=0
            )
            for k in methods["moving_avg_lsq"]
        }
    if "qda" in methods:
        disentangle["qda"] = {
            k: ref.dis.QuadraticDiscriminantFilter(
                z, torch.from_numpy(np.asarray(discrete_classes[k]))
            )
            for k in methods["qda"]
        }
    if "moving_avg" in methods:
        disentangle["moving_avg"] = {
            k: ref.dis.MovingAverageFilter(
                z, torch.from_numpy(np.asarray(discrete_classes[k]))
            )
            for k in methods["moving_avg"]
        }
    cond_keys = methods.get("conditional")
    cond_dim = sum(fdims[k] for k in (cond_keys or []))
    if "adversarial_net" in methods:
        disentangle["adversarial_net"] = {
            k: ref.dis.AdvNetScrubber(z + cond_dim)
            for k in methods["adversarial_net"]
        }
    if "grad_reversal" in methods:
        disentangle["grad_reversal"] = {
            k: ref.dis.GRScrubber(z, fdims[k], alpha=1.0)
            for k in methods["grad_reversal"]
        }

    dkeys = sorted({k for v in methods.values() for k in v})
    model = ref.res.ResVAE(
        in_channels=18 * 6 + 3,
        ch=MODEL_CFG["channel"],
        kernel=MODEL_CFG["kernel"],
        z_dim=z,
        window=MODEL_CFG["window"],
        activation=MODEL_CFG["activation"],
        is_diag=MODEL_CFG["diag"],
        conditional_dim=cond_dim,
        init_dilation=None,
        disentangle=disentangle or None,
        kinematic_tree=tree,
        arena_size=torch.from_numpy(ARENA),
        disentangle_keys=dkeys,
        conditional_keys=cond_keys,
        discrete_classes={
            k: torch.from_numpy(np.asarray(v)) for k, v in discrete_classes.items()
        },
        prior="gaussian",
    )
    return model, dkeys


def run_reference(cfg_id, epochs, data_train, data_val, perms, out_dir, seed, n_iter=5):
    import torch

    ref = load_reference()
    patch_cuda_ones(torch)
    spec = LADDER[cfg_id]

    tensors_tr = {k: torch.from_numpy(v) for k, v in data_train.items()}
    tensors_va = {k: torch.from_numpy(v) for k, v in data_val.items()}
    discrete = {"ids": np.unique(data_train["ids"]).astype(np.float32)}
    # reference kinematic_tree: list of chains of joint indices
    from scrubvae_tpu.data.skeleton import load_skeleton

    skel = load_skeleton(str(HERE / "configs" / "mouse_skeleton.yaml"))
    tree = [list(map(int, c)) for c in skel.tree.chains]

    model, dkeys = build_ref_model(ref, torch, cfg_id, discrete, tree, seed)
    (out_dir / "weights").mkdir(parents=True, exist_ok=True)
    torch.save(
        {k: v.cpu() for k, v in model.state_dict().items()},
        out_dir / "weights" / "epoch_0.pth",
    )

    config = {
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
        "data": {"batch_size": perms[0].shape[1]},
        "model": dict(MODEL_CFG),
        "train": {"optimizer": "adam", "lr": 1e-4, "lr_schedule": None},
    }

    optimizer = torch.optim.Adam(model.parameters(), lr=config["train"]["lr"])

    def batches_for(perm):
        return ListLoader(
            [{k: v[torch.from_numpy(rows.copy())] for k, v in tensors_tr.items()}
             for rows in perm]
        )

    # fixed sequential val batches (same as our test_epoch full-batch part)
    B = perms[0].shape[1]
    n_val = len(next(iter(tensors_va.values())))
    val_rows = [np.arange(i, i + B) for i in range(0, (n_val // B) * B, B)]
    val_loader = ListLoader(
        [{k: v[torch.from_numpy(r)] for k, v in tensors_va.items()} for r in val_rows]
    )

    class DictDataset:
        def __init__(self, tensors, tree):
            self.t = tensors
            self.kinematic_tree = tree

        def __len__(self):
            return len(next(iter(self.t.values())))

        def __getitem__(self, idx):
            return {k: v[idx] for k, v in self.t.items()}

    val_loader.dataset = DictDataset(tensors_va, tree)

    history = []
    t_total = 0.0
    samples_per_epoch = perms[0].size
    for epoch in range(1, epochs + 1):
        # reference trainer's adversarial fit is gated on mode == "Train",
        # which train_epoch never passes ("train") - i.e. dead code
        # (trainer.py:133-145). Run the fit here the way the reference
        # evidently intended, so config 4 compares the live path.
        loader = batches_for(perms[epoch - 1])
        t0 = time.time()
        m = ref.trainer.train_test_epoch(
            config=config,
            model=model,
            loader=loader,
            device="cpu",
            epoch=epoch,
            optimizer=optimizer,
            scheduler=None,
            mode="train",
        )
        dt = time.time() - t0
        t_total += dt
        m = {f"{k}_train": float(v) for k, v in m.items()}
        m["epoch"] = epoch
        m["time"] = dt
        history.append(m)
        print(f"[ref cfg{cfg_id}] epoch {epoch}: total={m['total_train']:.4f} ({dt:.1f}s)")

        if epoch % 5 == 0 or epoch == epochs:
            tm, _z = ref.trainer.test_epoch(
                config=config, model=model, loader=val_loader, device="cpu",
                epoch=epoch,
            )
            history[-1].update({f"{k}_test": float(v) for k, v in tm.items()})
            torch.save(
                {k: v.cpu() for k, v in model.state_dict().items()},
                out_dir / "weights" / f"epoch_{epoch}.pth",
            )

    result = {
        "side": "reference",
        "config": cfg_id,
        "epochs": epochs,
        "samples_per_epoch": samples_per_epoch,
        "samples_per_s": samples_per_epoch * epochs / t_total,
        "history": history,
    }
    (out_dir / "ref_metrics.json").write_text(json.dumps(result, indent=1))
    return result


# ---------------------------------------------------------------------------
# Our side
# ---------------------------------------------------------------------------


def run_ours(cfg_id, epochs, datasets, perms, out_dir, seed):
    import jax.numpy as jnp

    from scrubvae_tpu import factory
    from scrubvae_tpu.train.trainer import Trainer
    from scrubvae_tpu.utils.torch_import import import_torch_weights

    spec = LADDER[cfg_id]
    feats = sorted({k for v in spec["methods"].values() for k in v})
    cfg = {
        "data": {
            "batch_size": perms[0].shape[1],
            "dataset": "synthetic",
            "direction_process": "midfwd",
            "arena_size": ARENA.tolist(),
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
            # the reference's inner discriminator fit is dead code (gated on
            # mode == "Train", never passed - trainer.py:133-145), so for
            # trajectory parity the live fit is disabled here too
            "adv_fit": False,
        },
        "model": dict(MODEL_CFG),
        "train": {
            "lr": 1e-4,
            "optimizer": "adam",
            "lr_schedule": None,
            "num_epochs": epochs,
            "beta_anneal": None,
            "minimal_test": False,
            "seed": seed,
            "eval_start_epoch": 5,
            # f32 Adam moments: the reference comparison isolates model/loss
            # semantics from the bf16-store deviation
            "moment_dtype": "f32",
        },
        "loss": dict(spec["loss"]),
        "out_path": str(out_dir / "ours") + "/",
    }
    for d in ("weights", "checkpoints", "latents"):
        (out_dir / "ours" / d).mkdir(parents=True, exist_ok=True)

    model, info = factory.build_model(
        cfg["model"],
        cfg["disentangle"],
        n_keypts=18,
        direction_process="midfwd",
        arena_size=ARENA,
        discrete_classes=datasets["train"].discrete_classes,
    )
    tr = Trainer(cfg, datasets, model, info)

    # identical init: import the reference's exported epoch_0.pth
    template = {"params": tr.state.params}
    if tr.state.batch_stats is not None:
        template["batch_stats"] = tr.state.batch_stats
    imported = import_torch_weights(out_dir / "weights" / "epoch_0.pth", template)
    tr.state = tr.state.replace(
        params=imported["params"],
        batch_stats=imported.get("batch_stats", tr.state.batch_stats),
    )

    # identical batch order: replay the same permutation stream
    class Replay:
        def __init__(self, perms):
            self.perms = list(perms)
            self.i = 0

        def permutation(self, n):
            p = self.perms[self.i]
            self.i += 1
            return np.concatenate([p.reshape(-1), np.arange(p.size, n)])

    tr.np_rng = Replay(perms)

    history = []
    t_total = 0.0
    for epoch in range(1, epochs + 1):
        t0 = time.time()
        m = tr.train_epoch(epoch)
        dt = time.time() - t0
        t_total += dt
        m = {f"{k}_train": float(v) for k, v in m.items()}
        m["epoch"] = epoch
        m["time"] = dt
        history.append(m)
        print(f"[ours cfg{cfg_id}] epoch {epoch}: total={m['total_train']:.4f} ({dt:.1f}s)")
        if epoch % 5 == 0 or epoch == epochs:
            tm, z_val = tr.test_epoch(epoch)
            history[-1].update({f"{k}_test": float(v) for k, v in tm.items()})
        if hasattr(tr, "reset_gr"):
            tr.reset_gr(epoch)

    result = {
        "side": "ours",
        "config": cfg_id,
        "epochs": epochs,
        "samples_per_epoch": int(perms[0].size),
        "samples_per_s": perms[0].size * epochs / t_total,
        "history": history,
    }
    (out_dir / "ours_metrics.json").write_text(json.dumps(result, indent=1))
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=1, choices=sorted(LADDER))
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--frames", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=pathlib.Path, default=pathlib.Path("/tmp/refbase"))
    ap.add_argument("--side", choices=("both", "ref", "ours"), default="both")
    args = ap.parse_args()

    out_dir = args.out / f"cfg{args.config}"
    out_dir.mkdir(parents=True, exist_ok=True)

    datasets = build_datasets(args.frames, LADDER[args.config]["methods"])
    data_train, n_train = materialize(datasets["train"])
    data_val, _ = materialize(datasets["val"])
    perms = epoch_perms(args.seed, n_train, args.batch, args.epochs)
    print(f"cfg{args.config}: {n_train} train windows, {perms[0].shape[0]} steps/epoch")

    if args.side in ("both", "ref"):
        run_reference(
            args.config, args.epochs, data_train, data_val, perms, out_dir, args.seed
        )
    if args.side in ("both", "ours"):
        run_ours(args.config, args.epochs, datasets, perms, out_dir, args.seed)


if __name__ == "__main__":
    main()

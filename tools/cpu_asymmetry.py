"""Attribute the ours-vs-torch CPU throughput asymmetry (PARITY 1, W7 r2).

At the ref_baseline cfg1 operating point (window 51, ch [16,32,32,64,64],
z 32, f32, batch 64) the reference's eager torch loop runs ~420 samples/s on
this 1-core host while our scanned XLA:CPU epoch runs ~118 samples/s
steady-state. This script isolates where the difference comes from by
timing our epoch under targeted ablations ON THE SAME DATA:

  A. default      - StreamDataset: windows assembled INSIDE the step
                    (gather + midfwd alignment + target-FK per batch) -
                    the TPU-first design choice (SURVEY 5: trades a 25x
                    host-memory blowup + infeed stall for in-step VPU work)
  B. materialized - WindowDataset: windows precomputed once (what the
                    reference does at preprocess time), step consumes them
  C. assembly-only- the batch_fn alone (no model), bounding A-B from below

Run CPU-only: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tools/cpu_asymmetry.py [--epochs 3] [--frames 6000]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def build_point(frames):
    from tools.ref_baseline import ARENA, MODEL_CFG, build_datasets

    datasets = build_datasets(frames, {"conditional": []})
    return datasets["train"], MODEL_CFG, ARENA


def make_trainer(ds, model_cfg, arena, batch, donate=True):
    from scrubvae_tpu import factory
    from scrubvae_tpu.train.trainer import Trainer

    cfg = {
        "data": {
            "batch_size": batch,
            "dataset": "synthetic",
            "direction_process": "midfwd",
            "arena_size": np.asarray(arena).tolist(),
        },
        "disentangle": {"method": {}, "features": []},
        "model": dict(model_cfg),
        "train": {
            "lr": 1e-4,
            "optimizer": "adam",
            "lr_schedule": None,
            "num_epochs": 3,
            "seed": 0,
            "moment_dtype": "f32",
            "donate": donate,
        },
        "loss": {"rotation": 1.0, "prior": 0.001, "root": 0.01, "jpe": 0.5},
        "out_path": "/tmp/cpu_asym/",
    }
    for d in ("weights", "checkpoints", "latents"):
        pathlib.Path("/tmp/cpu_asym", d).mkdir(parents=True, exist_ok=True)
    model, info = factory.build_model(
        cfg["model"], cfg["disentangle"], n_keypts=18,
        direction_process="midfwd", arena_size=np.asarray(arena),
        discrete_classes=ds.discrete_classes,
    )
    return Trainer(cfg, {"train": ds}, model, info)


def time_epochs(trainer, epochs):
    times = []
    for e in range(1, epochs + 1):
        t0 = time.perf_counter()
        trainer.train_epoch(e)
        times.append(time.perf_counter() - t0)
    return times


def split_mode(args):
    """Forward-only vs full-step timing, ours AND the reference, on the
    same data at the cfg1 operating point. Ours: scanned epoch of the
    train-mode forward+loss (no grad) vs the full fused step. Reference:
    its own train_test_epoch with mode="test" (no_grad forward+loss) vs
    mode="train" (backward+clip+step) - trainer.py:102-199."""
    import jax
    import jax.numpy as jnp

    from scrubvae_tpu.train.losses import compute_batch_loss

    stream_ds, model_cfg, arena = build_point(args.frames)
    tr = make_trainer(stream_ds, model_cfg, arena, args.batch, donate=False)
    n = len(stream_ds)
    steps = n // args.batch
    results = {"n_windows": n, "batch": args.batch, "steps": steps,
               "backend": jax.default_backend()}

    idx = np.random.default_rng(0).permutation(n)[: steps * args.batch]
    idx = jnp.asarray(idx.reshape(steps, args.batch), jnp.int32)
    loss_scale = tr.loss_scale_for_epoch(1)
    batch_fn = tr._batch_fn(tr.train_ds)
    static_ls = {k: float(v) for k, v in tr.loss_cfg.items()}
    tree = tr.train_ds.kinematic_tree
    info = tr.info

    def fwd_loss(state, ix, ls):
        rng, r_sample, r_drop, r_adv = jax.random.split(state.rng, 4)
        data = batch_fn(ix)
        variables = {"params": state.params}
        mutable = False
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
            mutable = ["batch_stats"]
        out = tr.model.apply(variables, data, rng=r_sample, train=True,
                             mutable=mutable, rngs={"dropout": r_drop})
        if mutable:
            out, _ = out
        bl, _ = compute_batch_loss(
            tr.model, data, out, ls, tr.dis_cfg, tree, state.scrub_state,
            adv_bundle=tr.adv_bundle, adv_states=state.adv_states,
            mi_state=state.mi_state, rng=r_adv,
            disentangle_keys=tuple(info["disentangle_keys"]),
            conditional_keys=tuple(info["conditional_keys"]),
            feat_slices=tr.feat_slices, static_loss_scale=static_ls,
        )
        return bl["total"]

    @jax.jit
    def fwd_epoch(state, idx_matrix, ls):
        def body(c, ix):
            return c, fwd_loss(state, ix, ls)

        _, tot = jax.lax.scan(body, 0, idx_matrix)
        return tot.sum()

    for label, run in (
        ("ours_full", lambda: jax.block_until_ready(
            tr.train_epoch_fn(tr.state, idx, loss_scale))),
        ("ours_fwd_only", lambda: jax.block_until_ready(
            fwd_epoch(tr.state, idx, loss_scale))),
    ):
        run()  # compile + warm
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        results[label + "_epoch_s"] = dt
        results[label + "_samples_per_s"] = steps * args.batch / dt
        print(f"{label:16s}: {dt:6.2f} s/epoch  "
              f"{results[label + '_samples_per_s']:.0f} samples/s", flush=True)

    # --- reference side, same frames/shape, its own loop -----------------
    import torch

    from tools import ref_baseline as rb

    ref = rb.load_reference()
    rb.patch_cuda_ones(torch)
    data_train, _ = rb.materialize(stream_ds)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in data_train.items()}
    discrete = {"ids": np.unique(data_train["ids"]).astype(np.float32)}
    from scrubvae_tpu.data.skeleton import load_skeleton

    skel = load_skeleton(str(pathlib.Path(__file__).parent.parent
                             / "configs" / "mouse_skeleton.yaml"))
    ktree = [list(map(int, c)) for c in skel.tree.chains]
    model, dkeys = rb.build_ref_model(ref, torch, 1, discrete, ktree, 0)
    config = {
        "loss": dict(rb.LADDER[1]["loss"]),
        "disentangle": {"method": rb.LADDER[1]["methods"], "features": dkeys,
                        "n_iter": 5, "bandwidth": 1.0, "var_mode": "sphere",
                        "alpha": 1.0, "polynomial": 1, "l2_reg": 0},
        "data": {"batch_size": args.batch},
        "model": dict(rb.MODEL_CFG),
        "train": {"optimizer": "adam", "lr": 1e-4, "lr_schedule": None},
    }
    optimizer = torch.optim.Adam(model.parameters(), lr=1e-4)
    rows = np.asarray(idx).reshape(steps, args.batch)
    loader = rb.ListLoader(
        [{k: v[torch.from_numpy(r.copy())] for k, v in tensors.items()}
         for r in rows])

    for label, mode, opt in (("torch_full", "train", optimizer),
                             ("torch_fwd_only", "test", None)):
        ref.trainer.train_test_epoch(config=config, model=model,
                                     loader=loader, device="cpu", epoch=1,
                                     optimizer=opt, mode=mode)  # warm
        t0 = time.perf_counter()
        ref.trainer.train_test_epoch(config=config, model=model,
                                     loader=loader, device="cpu", epoch=2,
                                     optimizer=opt, mode=mode)
        dt = time.perf_counter() - t0
        results[label + "_epoch_s"] = dt
        results[label + "_samples_per_s"] = steps * args.batch / dt
        print(f"{label:16s}: {dt:6.2f} s/epoch  "
              f"{results[label + '_samples_per_s']:.0f} samples/s", flush=True)

    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(results, indent=1))
        print(f"wrote {args.out}")


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--frames", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--out", default=None)
    ap.add_argument("--split", action="store_true",
                    help="forward/backward split, ours vs the reference")
    args = ap.parse_args()

    if args.split:
        split_mode(args)
        return

    stream_ds, model_cfg, arena = build_point(args.frames)
    n = len(stream_ds)
    steady = lambda ts: ts[-1]  # last epoch: compile fully amortized
    results = {"n_windows": n, "batch": args.batch, "epochs": args.epochs,
               "backend": jax.default_backend()}

    # A. default in-step assembly
    tr = make_trainer(stream_ds, model_cfg, arena, args.batch)
    ts = time_epochs(tr, args.epochs)
    results["A_stream_epoch_s"] = ts
    results["A_steady_samples_per_s"] = n // args.batch * args.batch / steady(ts)
    print(f"A in-step assembly : epochs {['%.2f' % t for t in ts]}  "
          f"steady {results['A_steady_samples_per_s']:.0f} samples/s", flush=True)

    # B. materialized windows (reference-style preprocessing)
    from scrubvae_tpu.data.dataset import WindowDataset
    from scrubvae_tpu.data.pipeline import materialize

    mat = materialize(
        stream_ds.store, stream_ds.skeleton.tree,
        [k for k in stream_ds.data_keys], "midfwd",
    )
    win_ds = WindowDataset(
        data={k: jnp.asarray(v) for k, v in mat.items()},
        arena_size=stream_ds.arena_size, skeleton=stream_ds.skeleton,
        discrete_classes=stream_ds.discrete_classes,
        norm_params=stream_ds.norm_params,
    )
    tr = make_trainer(win_ds, model_cfg, arena, args.batch)
    ts = time_epochs(tr, args.epochs)
    results["B_materialized_epoch_s"] = ts
    results["B_steady_samples_per_s"] = n // args.batch * args.batch / steady(ts)
    print(f"B materialized     : epochs {['%.2f' % t for t in ts]}  "
          f"steady {results['B_steady_samples_per_s']:.0f} samples/s", flush=True)

    # C. assembly alone (scanned over the same number of batches)
    steps = n // args.batch
    idx = np.random.default_rng(0).permutation(n)[: steps * args.batch]
    idx = jnp.asarray(idx.reshape(steps, args.batch), jnp.int32)

    @jax.jit
    def assemble_epoch(idx_matrix):
        def body(c, ix):
            d = stream_ds.batch(ix)
            return c, sum(jnp.sum(v) for v in d.values() if v.dtype.kind == "f")

        _, s = jax.lax.scan(body, 0, idx_matrix)
        return s.sum()

    for rep in range(args.epochs):
        t0 = time.perf_counter()
        jax.block_until_ready(assemble_epoch(idx))
        dt = time.perf_counter() - t0
    results["C_assembly_epoch_s"] = dt
    print(f"C assembly only    : {dt:.2f} s/epoch "
          f"({100 * dt / steady(results['A_stream_epoch_s']):.0f}% of A)", flush=True)

    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(results, indent=1))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

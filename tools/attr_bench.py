"""Component attribution for the fused train step.

Times bench.py's flagship configuration with individual components toggled
off, to attribute per-sample cost (the step is per-sample-bound: throughput
is flat from batch 512 to 2048). One process, shared data; each variant is
its own jit.

Usage: python tools/attr_bench.py [--batch 512] [--steps 20]
"""

import argparse
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def run_variant(name, batch, steps, warmup, *, loss_del=(), methods_del=(),
                precision=None, data_keys=None, window=51, z_dim=128,
                ch=(64, 128, 256, 512, 1024), diag=False):
    from bench import build

    import bench as bench_mod

    trainer, ds = build(batch, window, z_dim, ch, False)
    cfg = trainer.config
    changed = False
    if loss_del or methods_del or precision or diag:
        import copy

        cfg = copy.deepcopy(cfg)
        for k in loss_del:
            cfg["loss"].pop(k, None)
        for m in methods_del:
            cfg["disentangle"]["method"].pop(m, None)
        if precision:
            cfg["model"]["precision"] = precision
        if diag:
            cfg["model"]["diag"] = True
        from scrubvae_tpu import factory
        from scrubvae_tpu.train.trainer import Trainer

        arena = np.asarray([[-290, -290, 0], [290, 290, 120]], np.float32)
        model, info = factory.build_model(
            cfg["model"],
            cfg["disentangle"],
            n_keypts=18,
            direction_process="midfwd",
            arena_size=arena,
            discrete_classes=ds.discrete_classes,
        )
        trainer = type(trainer)(cfg, {"train": ds}, model, info)

    loss_scale = trainer.loss_scale_for_epoch(1)
    n = len(ds)
    rng = np.random.default_rng(0)
    state = trainer.state
    for _ in range(warmup):
        idx = jnp.asarray(rng.integers(0, n, size=batch))
        state, metrics = trainer.train_step(state, idx, loss_scale)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(steps):
        idx = jnp.asarray(rng.integers(0, n, size=batch))
        state, metrics = trainer.train_step(state, idx, loss_scale)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    sps = batch * steps / dt
    ms = 1000 * dt / steps
    print(f"{name:34s} {ms:8.2f} ms/step  {sps:10.0f} samples/s", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()
    B, S, W = args.batch, args.steps, args.warmup

    run_variant("full (fp32)", B, S, W)
    run_variant("bf16", B, S, W, precision="bf16")
    run_variant("- jpe loss (no pred FK)", B, S, W, loss_del=("jpe",))
    run_variant("- rotation loss", B, S, W, loss_del=("rotation",))
    run_variant("- prior KL", B, S, W, loss_del=("prior",))
    run_variant("diag covariance", B, S, W, diag=True)
    run_variant(
        "- scrubbers (cond only)",
        B,
        S,
        W,
        loss_del=("avg_speed_3d_mals", "avg_speed_3d_lin", "avg_speed_3d_gr"),
        methods_del=("linear", "moving_avg_lsq", "grad_reversal"),
    )
    run_variant("bf16 + diag", B, S, W, precision="bf16", diag=True)


if __name__ == "__main__":
    main()

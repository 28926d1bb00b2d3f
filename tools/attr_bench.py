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
                ch=(64, 128, 256, 512, 1024), diag=False, scan=False):
    """Time one ablation variant.

    scan=False: per-step dispatch (one device call per step). Through the
    axon tunnel each dispatch costs a multi-ms host round-trip that SWAMPS
    component differences (measured r3: the no-scrubber variant moved from
    3.0 to 9.6 ms/step between two runs of identical code while the scanned
    bench held at ~6.7 ms/step) - per-step numbers attribute dispatch
    latency, not compute.

    scan=True: the scanned epoch (one dispatch per `steps` steps), the same
    program bench.py times and Trainer.train_epoch runs - per-step compute
    differences survive. Use this mode for attribution.
    """
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
    if scan:
        idx_matrix = jnp.asarray(
            rng.integers(0, n, size=(steps, batch)), dtype=jnp.int32
        )
        compiled = trainer.train_epoch_fn.lower(
            state, idx_matrix, loss_scale
        ).compile()
        state, metrics = compiled(state, idx_matrix, loss_scale)  # warm
        jax.block_until_ready(metrics)
        t0 = time.perf_counter()
        state, metrics = compiled(state, idx_matrix, loss_scale)
        jax.block_until_ready(metrics)
        dt = time.perf_counter() - t0
    else:
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
    ap.add_argument("--steps", type=int, default=None,
                    help="default 20 per-step / 100 scanned")
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--scan", action="store_true",
                    help="time the scanned epoch (dispatch-noise-immune;"
                    " use for attribution)")
    args = ap.parse_args()
    steps = args.steps or (100 if args.scan else 20)
    B, S, W = args.batch, steps, args.warmup
    kw = {"scan": args.scan}

    run_variant("full (fp32)", B, S, W, **kw)
    run_variant("bf16", B, S, W, precision="bf16", **kw)
    run_variant("- jpe loss (no pred FK)", B, S, W, loss_del=("jpe",), **kw)
    run_variant("- rotation loss", B, S, W, loss_del=("rotation",), **kw)
    run_variant("- prior KL", B, S, W, loss_del=("prior",), **kw)
    run_variant("diag covariance", B, S, W, diag=True, **kw)
    run_variant(
        "- scrubbers (cond only)",
        B,
        S,
        W,
        loss_del=("avg_speed_3d_mals", "avg_speed_3d_lin", "avg_speed_3d_gr"),
        methods_del=("linear", "moving_avg_lsq", "grad_reversal"),
        **kw,
    )
    # per-method scrubber attribution
    run_variant(
        "- linear only", B, S, W,
        loss_del=("avg_speed_3d_lin",), methods_del=("linear",), **kw,
    )
    run_variant(
        "- moving_avg_lsq only", B, S, W,
        loss_del=("avg_speed_3d_mals",), methods_del=("moving_avg_lsq",), **kw,
    )
    run_variant(
        "- grad_reversal only", B, S, W,
        loss_del=("avg_speed_3d_gr",), methods_del=("grad_reversal",), **kw,
    )
    run_variant("bf16 + diag", B, S, W, precision="bf16", diag=True, **kw)


if __name__ == "__main__":
    main()

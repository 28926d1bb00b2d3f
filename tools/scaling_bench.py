"""Multi-device throughput scaling of the flagship train step.

Weak scaling: fixed per-device batch, the global batch grows with the mesh.
For each device count D in the ladder, builds the flagship trainer on a
``{data: D}`` mesh (optionally ``{data: D/M, model: M}`` to include the
sigma-head tensor parallelism) and times the device-resident scanned epoch.

On real multi-chip hardware this produces the headline scaling table
(samples/s total and per chip, scaling efficiency vs the 1-device row). On
the virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu) the absolute numbers are meaningless, but the run still
validates that the SPMD program at every mesh size compiles, executes, and
produces finite losses — the structural half of the scaling story.

Usage:
  python tools/scaling_bench.py [--devices 1 2 4 8] [--batch-per-device 64]
      [--steps 20] [--model-parallel 2] [--small]

Prints one JSON line per mesh size plus a summary line.
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def run_one(n_dev: int, batch_per_dev: int, steps: int, small: bool,
            model_parallel: int, warmup: int = 2):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build

    batch = batch_per_dev * n_dev
    mesh = None
    if n_dev > 1:
        if model_parallel > 1 and n_dev % model_parallel == 0:
            mesh = {"data": n_dev // model_parallel, "model": model_parallel}
        else:
            mesh = {"data": n_dev}
    ch = (8, 8, 16, 16, 32) if small else (64, 128, 256, 512, 1024)
    trainer, ds = build(
        batch, 51, 16 if small else 128, ch, small,
        bf16_params=not small, mesh=mesh,
    )
    loss_scale = trainer.loss_scale_for_epoch(1)
    n = len(ds)
    rng = np.random.default_rng(0)
    state = trainer.state

    def idx_matrix():
        return trainer._device_idx(
            jnp.asarray(rng.integers(0, n, size=(steps, batch)), jnp.int32)
        )

    state, metrics = trainer.train_epoch_fn(state, idx_matrix(), loss_scale)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    state, metrics = trainer.train_epoch_fn(state, idx_matrix(), loss_scale)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    total = float(metrics["total"])
    assert np.isfinite(total), f"non-finite loss at {n_dev} devices: {total}"
    return {
        "devices": n_dev,
        "mesh": mesh or {"data": 1},
        "global_batch": batch,
        "samples_per_sec": round(batch * steps / dt, 2),
        "samples_per_sec_per_chip": round(batch * steps / dt / n_dev, 2),
        "step_ms": round(dt / steps * 1e3, 3),
        "total_loss": round(total, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None,
                    help="mesh sizes to sweep (default: 1,2,4,...,#visible)")
    ap.add_argument("--batch-per-device", type=int, default=None)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--model-parallel", type=int, default=1,
                    help="shard the sigma head over a model axis of this "
                    "size at mesh sizes it divides (train.mesh model axis)")
    ap.add_argument("--small", action="store_true", help="tiny model (CPU)")
    args = ap.parse_args()

    import jax

    n_vis = jax.device_count()
    ladder = args.devices
    if ladder is None:
        ladder, d = [], 1
        while d <= n_vis:
            ladder.append(d)
            d *= 2
    bpd = args.batch_per_device or (16 if args.small else 512)

    rows = []
    for n_dev in ladder:
        if n_dev > n_vis:
            print(json.dumps({"devices": n_dev, "skipped": f"only {n_vis} visible"}))
            continue
        row = run_one(n_dev, bpd, args.steps, args.small, args.model_parallel)
        rows.append(row)
        print(json.dumps(row))

    if rows:
        base = rows[0]["samples_per_sec_per_chip"]
        print(json.dumps({
            "metric": "weak_scaling_efficiency",
            "per_chip_vs_1dev": {
                str(r["devices"]): round(r["samples_per_sec_per_chip"] / base, 3)
                for r in rows
            },
            "device_kind": getattr(jax.devices()[0], "device_kind", ""),
        }))


if __name__ == "__main__":
    main()

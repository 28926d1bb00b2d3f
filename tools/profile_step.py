"""Capture a jax.profiler trace of the flagship train path.

Profiles either the per-step dispatch (--per-step) or the device-resident
scanned epoch that Trainer/bench actually run (default). Parse the captured
trace with tools/parse_trace.py (the tensorboard_plugin_profile converter in
this image is version-broken against its TF build, so we only capture here).

Usage: python tools/profile_step.py [--batch 512] [--steps 20]
       [--f32-params] [--no-fused] [--per-step] [--logdir DIR]
then:  python tools/parse_trace.py <logdir> [top_n]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--logdir", default="/tmp/scrubvae_profile")
    ap.add_argument("--f32-params", action="store_true",
                    help="f32 param storage (default matches bench: bf16+SR)")
    ap.add_argument("--no-fused", action="store_true",
                    help="disable the Pallas fused AdamW")
    ap.add_argument("--per-step", action="store_true",
                    help="profile per-step dispatch instead of the scanned epoch")
    args = ap.parse_args()

    from bench import build

    trainer, ds = build(
        args.batch, 51, 128, (64, 128, 256, 512, 1024), False,
        fused=not args.no_fused, bf16_params=not args.f32_params,
    )
    loss_scale = trainer.loss_scale_for_epoch(1)
    n = len(ds)
    rng = np.random.default_rng(0)
    state = trainer.state

    if args.per_step:
        def run(state, steps):
            for _ in range(steps):
                idx = jnp.asarray(rng.integers(0, n, size=args.batch))
                state, metrics = trainer.train_step(state, idx, loss_scale)
            jax.block_until_ready(metrics)
            return state
    else:
        def run(state, steps):
            idx = jnp.asarray(
                rng.integers(0, n, size=(steps, args.batch)), dtype=jnp.int32
            )
            state, metrics = trainer.train_epoch_fn(state, idx, loss_scale)
            jax.block_until_ready(metrics)
            return state

    state = run(state, 3)  # warmup/compile
    with jax.profiler.trace(args.logdir):
        state = run(state, args.steps)
    print(f"trace captured under {args.logdir}; "
          f"parse with: python tools/parse_trace.py {args.logdir}")


if __name__ == "__main__":
    main()

"""Validation-epoch Cholesky-head accounting (VERDICT r3 #6).

Round-4 measured finding: wherever L is not consumed, XLA's dead-code
elimination ALREADY strips the sigma head from the compiled program — the
jitted eval step / scanned eval epoch / encode_dataset all return only what
their outputs need, so an unconsumed fc_sigma matmul never executes. The
explicit ``mu_only`` flag added in round 4 (models' ``__call__`` +
``train/step.py``) pins that guarantee at trace level instead of relying on
the compiler. The remaining question is QUANTITATIVE: how much of the val
epoch does the head cost when it IS consumed (the flagship reports
``prior_test``, which needs L — reference trainer.py:254-289)?

This tool measures, on the current device:

  1. scanned val epoch, flagship losses WITH prior (head structurally
     required)           -> wall time + static MXU FLOPs
  2. scanned val epoch, prior-free losses (mu_only engaged by construction)
                         -> wall time + static MXU FLOPs
  3. encode_dataset (latent extraction, mu-only)   -> wall time
  4. encode variant that MATERIALIZES L (what a non-mu-only latent
     extraction would pay)                         -> wall time

(1)−(2) is the price of the prior metric's L dependency; (4)−(3) is the
head's cost on the extraction surface. Writes one JSON to
artifacts/profile/ (default) and prints it.

Usage: python tools/eval_mu_bench.py [--batch 512] [--steps 20] [--out FILE]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def time_call(fn, *args, iters=3, warmup=1):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=20,
                    help="val batches per scanned epoch call")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build
    from scrubvae_tpu.evals.latents import encode_dataset
    from scrubvae_tpu.train.trainer import Trainer
    from scrubvae_tpu.utils.hlo_flops import static_mxu_flops

    ch = (8, 8, 16, 16, 32) if args.small else (64, 128, 256, 512, 1024)
    batch = 16 if args.small else args.batch
    trainer, ds = build(batch, 51, 16 if args.small else 128, ch, args.small,
                        bf16_params=not args.small)

    results = {"batch": batch, "steps": args.steps,
               "device_kind": getattr(jax.devices()[0], "device_kind", "")}

    def val_epoch_stats(tag, drop_prior):
        cfg = {k: dict(v) if isinstance(v, dict) else v
               for k, v in trainer.config.items()}
        cfg["loss"] = dict(cfg["loss"])
        if drop_prior:
            del cfg["loss"]["prior"]
        tr = Trainer(cfg, {"train": ds, "val": ds}, trainer.model, trainer.info)
        fn = tr._get_eval_epoch_fn()
        idx = jnp.asarray(
            np.arange(args.steps * batch).reshape(args.steps, batch)
            % len(ds),
            jnp.int32,
        )
        ls = tr.loss_scale_for_epoch(1)
        rng = jax.random.PRNGKey(0)
        compiled = fn.lower(tr.state, idx, ls, rng).compile()
        flops = static_mxu_flops(compiled.as_text())
        dt = time_call(lambda: compiled(tr.state, idx, ls, rng))
        results[tag] = {
            "wall_s": round(dt, 4),
            "per_batch_ms": round(dt / args.steps * 1e3, 3),
            "static_mxu_gflops": round(flops / 1e9, 2),
            "loss_keys": sorted(cfg["loss"]),
        }
        return dt, flops

    t_full, f_full = val_epoch_stats("val_epoch_with_prior", drop_prior=False)
    t_fast, f_fast = val_epoch_stats("val_epoch_mu_only", drop_prior=True)
    results["head_share"] = {
        "wall_delta_pct": round((t_full - t_fast) / t_full * 100, 2),
        "static_flops_delta_pct": round((f_full - f_fast) / f_full * 100, 2),
        "note": "delta = price of the prior metric's L dependency; with "
                "prior in the loss config (the flagship default) the head "
                "is required for parity and cannot be elided",
    }

    # latent-extraction surface
    variables = {"params": trainer.state.params}
    if trainer.state.batch_stats is not None:
        variables["batch_stats"] = trainer.state.batch_stats
    dt_mu = time_call(
        lambda: encode_dataset(trainer.model, variables, ds, batch_size=batch),
        iters=2,
    )

    @jax.jit
    def enc_full(idx):
        data = ds.batch(idx)
        out = trainer.model.apply(
            variables, data, train=False, method=trainer.model.encode
        )
        # materialize the covariance output (sum forces L/Lp to be kept)
        extra = next(
            (out[k] for k in ("L", "Lp") if k in out), jnp.zeros(())
        )
        return out["mu"], jnp.sum(extra)

    def full_extract():
        # mirror encode_dataset's per-batch host transfer so the two
        # extraction timings compare like-for-like
        outs = []
        for lo in range(0, len(ds), batch):
            idx = jnp.arange(lo, min(lo + batch, len(ds)))
            outs.append(np.asarray(enc_full(idx)[0]))
        return np.concatenate(outs, axis=0)

    dt_full = time_call(full_extract, iters=2)
    results["latent_extraction"] = {
        "mu_only_s": round(dt_mu, 4),
        "with_L_materialized_s": round(dt_full, 4),
        "speedup": round(dt_full / dt_mu, 3),
        "n_samples": len(ds),
    }

    print(json.dumps(results, indent=1))
    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(results, indent=1))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

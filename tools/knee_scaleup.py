"""Knee validation: MFU vs operand size on the SAME fused train step.

README's performance section claims the flagship's 0.32 MFU-vs-datasheet is
the achievable knee for the reference architecture's operand sizes (batch
512, channels <=1024, z 128), not framework slack. This harness tests that
claim from the other side: it runs the *identical* fused train step (same
Trainer, same scrubber pipeline, same scanned epoch bench.py times) with the
channel stack / z_dim scaled up, and records TFLOP/s + MFU per point. If the
framework were the limiter, MFU would stay flat as operands grow; if the
shape-calibrated-ceiling story (artifacts/profile/mxu_ceiling_r3.txt) is
right, MFU climbs toward the large-operand ceilings.

Scaled models are NOT reference semantics (the reference pins ch and z,
model/residual.py:187) - this is a framework-capability measurement, not a
parity benchmark. bench.py's flagship number is unaffected.

Usage:
  python tools/knee_scaleup.py [--out artifacts/profile/knee_scaleup_r3.jsonl]
  python tools/knee_scaleup.py --small   # CPU smoke of the harness itself

Prints one JSON line per point and (with --out) appends them to a file.
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import bench  # repo-root bench: build(), peak_specs()


def run_point(label, batch, ch, z_dim, steps):
    import jax
    import jax.numpy as jnp
    import numpy as np

    trainer, ds = bench.build(
        batch, 51, z_dim, ch, small=False, fused=True, bf16_params=True
    )
    loss_scale = trainer.loss_scale_for_epoch(1)
    n = len(ds)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n, size=(steps, batch)), dtype=jnp.int32)

    lowered = trainer.train_epoch_fn.lower(trainer.state, idx, loss_scale)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    # scan body counted once = per-step (see bench.py note)
    flops_per_step = float(ca.get("flops", 0.0))

    state, metrics = compiled(trainer.state, idx, loss_scale)  # compile+warm
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    state, metrics = compiled(state, idx, loss_scale)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    assert np.isfinite(float(metrics["total"]))

    step_s = dt / steps
    kind, peak_flops, _ = bench.peak_specs(jax.devices()[0])
    row = {
        "point": label,
        "batch": batch,
        "channels": list(ch),
        "z_dim": z_dim,
        "step_ms": round(step_s * 1e3, 3),
        "samples_per_sec": round(batch / step_s, 1),
        "tflops_per_s": round(flops_per_step / step_s / 1e12, 2),
        "gflops_per_step": round(flops_per_step / 1e9, 1),
        "device_kind": kind,
    }
    if peak_flops:
        row["mfu"] = round(flops_per_step / step_s / peak_flops, 4)
    return row


FLAGSHIP_CH = (64, 128, 256, 512, 1024)
CH_X2 = (128, 256, 512, 1024, 2048)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--small", action="store_true",
                    help="harness smoke on CPU (tiny shapes, 2 points)")
    ap.add_argument("--points", nargs="+", default=None,
                    help="subset of point labels to run")
    args = ap.parse_args()

    if args.small:
        points = [
            ("tiny", 16, (8, 8, 16, 16, 32), 16),
            ("tiny_ch_x2", 16, (16, 16, 32, 32, 64), 16),
        ]
        steps = 4
    else:
        points = [
            # anchor: the reference operating point (= bench.py default)
            ("flagship", 512, FLAGSHIP_CH, 128),
            # grow the conv feature dims (the 75%-of-FLOPs class, N 256-1024
            # -> 512-2048)
            ("ch_x2", 512, CH_X2, 128),
            # grow the head (z 128 -> 256: sig_dim 8256 -> 32896; the
            # fc_sigma GEMM N dim x4)
            ("z_256", 512, FLAGSHIP_CH, 256),
            # both
            ("ch_x2_z256", 512, CH_X2, 256),
            # batch axis for the record (grows M only - measured ~flat
            # per-sample at flagship shapes)
            ("batch_1024", 1024, FLAGSHIP_CH, 128),
        ]
        steps = args.steps

    if args.points:
        points = [p for p in points if p[0] in args.points]

    out_path = pathlib.Path(args.out) if args.out else None
    for label, batch, ch, z in points:
        row = run_point(label, batch, ch, z, steps)
        print(json.dumps(row))
        if out_path:
            with out_path.open("a") as f:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()

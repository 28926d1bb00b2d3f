"""True-HBM-traffic lower bound for the flagship train step (VERDICT r2 W3).

XLA's ``bytes accessed`` counter includes fusion-internal operand reads that
never leave VMEM, so it over-counts HBM traffic (bench.py reports it as an
upper bound under its own name). This tool computes the opposite bound from
first principles — the bytes that MUST cross HBM in one optimizer step:

  * parameters: read once for forward+backward (one read covers both only
    if the kernel stays resident in VMEM across both uses; we count ONE
    read as the lower bound), written once by the optimizer
  * optimizer state (mu, nu per leaf): read + write once
  * gradients: materialized once between backward and the (fused) optimizer
    — counted read+write UNLESS the fused Pallas AdamW consumes them in the
    same pass as the moment update (it does: ops/fused_adamw.py is one RMW
    over grads/mu/nu/param), in which case one read
  * batch data: the window gather reads window*frame_bytes per sample once
  * batch-stats / scrubber moments: read + write once (small)

Everything below these numbers is physically impossible; the gap between
the bound and (measured step time x HBM peak) is the headroom a
bandwidth-bound hypothesis would have to explain.

Usage: python tools/hbm_bound.py [--batch 512] [--step-ms 6.7]
(runs on CPU; builds the flagship trainer only to read real dtypes/shapes)
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import numpy as np


def tree_bytes(tree) -> int:
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(tree)
        if hasattr(x, "size")
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--window", type=int, default=51)
    ap.add_argument("--z_dim", type=int, default=128)
    ap.add_argument("--step-ms", type=float, default=None,
                    help="measured step time (from bench.py) to convert the"
                    " bound into an implied-bandwidth fraction")
    ap.add_argument("--peak-gbs", type=float, default=819.0,
                    help="HBM peak for the target chip (v5e default)")
    args = ap.parse_args()

    from bench import build

    trainer, ds = build(
        args.batch, args.window, args.z_dim,
        (64, 128, 256, 512, 1024), False, bf16_params=True,
    )
    st = trainer.state

    p_bytes = tree_bytes(st.params)
    opt_bytes = tree_bytes(st.opt_state)
    bs_bytes = tree_bytes(st.batch_stats) if st.batch_stats is not None else 0
    scrub_bytes = tree_bytes(st.scrub_state) + tree_bytes(st.mi_state or ())

    # grads have param shapes but live f32 during backward (params may be
    # stored bf16; the fused optimizer reads the f32 grad once)
    g_bytes = sum(
        x.size * 4 for x in jax.tree.leaves(st.params) if hasattr(x, "size")
    )

    # per-sample input gather: pose window (W,18,3 f32) + per-frame
    # precomputes actually consumed by the step (x6d W*18*6, tpose W*18*3,
    # local_quat is not re-read when precompute=True; offsets W*18*3, yaw W)
    store = ds.store
    frame_bytes = 0
    for name in ("pose", "offsets", "yaw", "x6d", "tpose"):
        arr = getattr(store, name)
        if arr is None:
            continue
        frame_bytes += arr.size // arr.shape[0] * arr.dtype.itemsize
    data_bytes = args.batch * args.window * frame_bytes

    traffic = {
        "param_read": p_bytes,
        "param_write": p_bytes,
        "grad_read_once_fused": g_bytes,
        "opt_state_rw": 2 * opt_bytes,
        "batch_stats_rw": 2 * bs_bytes,
        "scrub_state_rw": 2 * scrub_bytes,
        "input_gather": data_bytes,
    }
    total = sum(traffic.values())

    print("per-step HBM traffic lower bound (flagship, batch "
          f"{args.batch}, window {args.window}):")
    for k, v in traffic.items():
        print(f"  {k:24s} {v / 1e6:10.2f} MB")
    print(f"  {'TOTAL':24s} {total / 1e6:10.2f} MB")

    if args.step_ms:
        gbs = total / (args.step_ms * 1e-3) / 1e9
        frac = gbs / args.peak_gbs
        print(f"\nimplied bandwidth at step {args.step_ms} ms: "
              f"{gbs:.1f} GB/s = {100 * frac:.1f}% of peak {args.peak_gbs}")
        print("=> if this fraction is <<100%, the step is NOT "
              "HBM-bandwidth-bound at the mandatory-traffic level; the "
              "residual time is compute (MXU/VPU) or pipeline overhead.")


if __name__ == "__main__":
    main()

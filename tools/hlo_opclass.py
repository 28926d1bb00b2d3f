"""Static op-class attribution of the flagship train step from optimized HLO.

The axon TPU tunnel does not stream device-side profiler events (a
jax.profiler capture of the flagship epoch records ~1M host events and
exactly 4 device events - see artifacts/profile/README.md), so a measured
per-op device timeline is unobtainable in this environment. This tool
provides the static half of the attribution instead: it compiles the fused
train step (the exact program bench.py times), walks the optimized HLO, and
aggregates

  - op counts per opcode (post-fusion: what the scheduler actually runs),
  - MXU FLOPs per convolution/dot (from operand/result shapes),
  - output bytes per op class (a proxy for the VPU/copy long tail).

Together with tools/attr_bench.py (measured component ablation on the real
chip) and tools/hbm_bound.py (first-principles traffic lower bound) this is
the evidence triangle for the MFU story in README.md.

Usage: python tools/hlo_opclass.py [--batch 512] [--top 25] [--out FILE]
"""

import argparse
import collections
import json
import math
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

from scrubvae_tpu.utils.hlo_flops import (
    build_symtab,
    conv_flops,
    dot_flops,
    parse_shape,
    shape_bytes,
)


def classify(opcode):
    if opcode in ("convolution",):
        return "conv (MXU)"
    if opcode in ("dot",):
        return "dot (MXU)"
    if opcode == "fusion":
        return "fusion (VPU/mixed)"
    if opcode in ("copy", "copy-start", "copy-done", "transpose", "bitcast",
                  "reshape", "all-gather", "all-reduce", "reduce-scatter"):
        return "copy/layout/comm"
    if opcode in ("custom-call",):
        return "custom-call (Pallas/cholesky/...)"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--out", default=None)
    ap.add_argument("--per-step", action="store_true",
                    help="analyze the single fused step (default: same)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build

    trainer, ds = build(args.batch, 51, 128, (64, 128, 256, 512, 1024), False,
                        fused=True, bf16_params=True)
    loss_scale = trainer.loss_scale_for_epoch(1)
    n = len(ds)
    idx = jnp.zeros((args.batch,), jnp.int32)
    lowered = trainer.train_step.lower(trainer.state, idx, loss_scale)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    hlo = compiled.as_text()

    symtab = build_symtab(hlo)
    counts = collections.Counter()
    flops = collections.Counter()
    out_bytes = collections.Counter()
    op_counts = collections.Counter()
    op_bytes = collections.Counter()
    rows = []
    for line in hlo.splitlines():
        m = re.match(r"\s+(?:ROOT )?%?[\w\.\-]+ = \S+ ([\w\-]+)\(", line)
        if not m:
            continue
        opcode = m.group(1)
        if opcode in ("parameter", "constant", "get-tuple-element", "tuple"):
            continue
        cls = classify(opcode)
        counts[cls] += 1
        b = shape_bytes(parse_shape(line))
        out_bytes[cls] += b
        op_counts[opcode] += 1
        op_bytes[opcode] += b
        f = 0
        if opcode == "convolution":
            f = conv_flops(line, symtab)
        elif opcode == "dot":
            f = dot_flops(line, symtab)
        flops[cls] += f
        if f or b > (1 << 22):
            rows.append((f, b, opcode, line.strip()[:160]))

    total_flops = sum(flops.values())
    print(f"XLA cost_analysis flops={ca.get('flops', float('nan')):.3e}  "
          f"bytes accessed={ca.get('bytes accessed', float('nan')):.3e}")
    print(f"static MXU flops counted from HLO: {total_flops:.3e} "
          f"({100 * total_flops / max(ca.get('flops', 1), 1):.1f}% of cost_analysis)")
    print()
    print(f"{'op class':28s} {'count':>7s} {'MXU GFLOP':>11s} {'out GiB':>9s}")
    for cls in counts:
        print(f"{cls:28s} {counts[cls]:7d} {flops[cls] / 1e9:11.2f} "
              f"{out_bytes[cls] / 2**30:9.3f}")
    print()
    print("top opcodes by output bytes (per-opcode breakdown):")
    for opcode, b in sorted(op_bytes.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {opcode:24s} {op_counts[opcode]:7d} ops {b / 2**30:9.3f} GiB")
    print()
    rows.sort(reverse=True)
    print(f"top {args.top} ops by static MXU FLOPs (then output bytes):")
    for f, b, opcode, line in rows[: args.top]:
        print(f"  {f / 1e9:9.2f} GF {b / 2**20:9.1f} MiB  {line}")

    if args.out:
        payload = {
            "batch": args.batch,
            "cost_analysis_flops": ca.get("flops"),
            "cost_analysis_bytes_accessed": ca.get("bytes accessed"),
            "op_class": {
                cls: {
                    "count": counts[cls],
                    "mxu_flops": flops[cls],
                    "out_bytes": out_bytes[cls],
                }
                for cls in counts
            },
            "top_ops": [
                {"flops": f, "out_bytes": b, "opcode": o, "hlo": l}
                for f, b, o, l in rows[: args.top]
            ],
        }
        pathlib.Path(args.out).write_text(json.dumps(payload, indent=1))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

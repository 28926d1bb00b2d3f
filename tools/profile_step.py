"""Capture a jax.profiler trace of the flagship train step and print the
top self-time HLO ops (via tensorboard_plugin_profile's xplane converter).

Usage: python tools/profile_step.py [--batch 512] [--precision bf16]
"""

import argparse
import glob
import gzip
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--logdir", default="/tmp/scrubvae_profile")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    from bench import build

    trainer, ds = build(args.batch, 51, 128, (64, 128, 256, 512, 1024), False)
    if args.precision != trainer.config["model"].get("precision"):
        pass  # bench default is bf16 already

    loss_scale = trainer.loss_scale_for_epoch(1)
    n = len(ds)
    rng = np.random.default_rng(0)
    state = trainer.state
    for _ in range(3):
        idx = jnp.asarray(rng.integers(0, n, size=args.batch))
        state, metrics = trainer.train_step(state, idx, loss_scale)
    jax.block_until_ready(metrics)

    with jax.profiler.trace(args.logdir):
        for _ in range(args.steps):
            idx = jnp.asarray(rng.integers(0, n, size=args.batch))
            state, metrics = trainer.train_step(state, idx, loss_scale)
        jax.block_until_ready(metrics)

    xplanes = sorted(glob.glob(args.logdir + "/**/*.xplane.pb", recursive=True))
    if not xplanes:
        print("no xplane captured")
        return
    xp = xplanes[-1]
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xp], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    # hlo_stats is a gviz JSON-ish table; fall back to op_profile if empty
    try:
        obj = json.loads(data)
        cols = [c["label"] for c in obj["cols"]]
        rows = obj["rows"]
        i_name = cols.index("HLO Expression") if "HLO Expression" in cols else 1
        time_keys = [i for i, c in enumerate(cols) if "Time" in c or "time" in c]
        print("columns:", cols)
        for r in rows[: args.top]:
            vals = [c["v"] for c in r["c"]]
            print(vals)
    except Exception as e:
        print("parse failed:", e)
        out = pathlib.Path(args.logdir) / "hlo_stats.raw"
        out.write_text(data if isinstance(data, str) else str(data))
        print("raw dumped to", out, "len", len(data))


if __name__ == "__main__":
    main()

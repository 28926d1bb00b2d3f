"""Serving latency/throughput of the exported encoder/decoder artifacts.

Measures what a deployment actually calls: the StableHLO artifacts from
``tools/export_model.py`` (``utils/export.py``), deserialized without the
model code and timed at serving batch sizes. Reports per-call latency (ms)
and samples/s for the encoder (pose window -> mu/L) and decoder
(z + conditionals -> pose representation).

Usage:
  python tools/serve_bench.py --run /runs/proj/name          # run's export/
  python tools/serve_bench.py --flagship [--batches 1 8 64 512]

--flagship builds the reference-operating-point ResVAE (window 51, ch
64-1024, z 128), exports it in memory, and benches that — no run directory
needed. Prints one JSON line per (artifact, batch).
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def _time_call(fn, args, iters=20, warmup=3):
    """Two latency views of the same artifact:

    - ``pipelined``: async dispatch loop, one sync at the end (the r3
      artifact's method) — amortizes the attachment's RPC round-trip, so it
      approximates on-chip step latency and is the number compute deltas
      (e.g. mu-only vs full encoder) show up in.
    - ``sync_min``/``sync_p50``: every call individually blocked — the
      latency a synchronous client actually observes. Through this
      environment's tunnel that is dominated by a ~25 ms RTT (measured:
      pipelined 2 ms vs per-call 28 ms for the identical program), so min/
      p50 are reported rather than a spike-ridden mean."""
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    pipelined = (time.perf_counter() - t0) / iters
    times = []
    for _ in range(min(iters, 30)):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "pipelined": pipelined,
        "sync_min": times[0],
        "sync_p50": times[len(times) // 2],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default=None, help="run dir containing export/")
    ap.add_argument("--flagship", action="store_true",
                    help="bench a freshly-exported flagship model")
    ap.add_argument("--batches", type=int, nargs="+", default=(1, 8, 64, 512))
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from scrubvae_tpu.utils.export import load_exported

    if args.run:
        out_dir = pathlib.Path(args.run) / "export"
        meta = json.loads((out_dir / "meta.json").read_text())
        enc = load_exported(out_dir / "encoder.shlo")
        enc_mu = (
            load_exported(out_dir / "encoder_mu.shlo")
            if (out_dir / "encoder_mu.shlo").exists()
            else None
        )
        dec = load_exported(out_dir / "decoder.shlo")
        enc_keys = meta["encoder_inputs"]
        cond_keys = meta["decoder_conditionals"]
        z_dim = meta["z_dim"]
        x6d_key = next(k for k in enc_keys if k.startswith("x6d"))
        shapes = meta.get("input_shapes")
        if shapes:
            window, n_joints = shapes[x6d_key][0], shapes[x6d_key][1]
        else:
            # older exports: the artifact's avals are flat (names dropped);
            # the x6d input is the unique rank-4 aval (B, W, J, 6)
            x6d_aval = next(
                a for a in jax.tree.leaves(enc.in_avals) if len(a.shape) == 4
            )
            window, n_joints = int(x6d_aval.shape[1]), int(x6d_aval.shape[2])
        cond_shapes = meta.get("conditional_shapes")
        if cond_shapes is None:
            # older exports: decoder avals flatten as (z, *sorted(cond));
            # map trailing avals back to the sorted conditional keys
            leaves = jax.tree.leaves(dec.in_avals)
            cond_shapes = {
                k: tuple(int(d) for d in a.shape[1:])
                for k, a in zip(sorted(cond_keys), leaves[1:])
            }
    elif args.flagship:
        from scrubvae_tpu.models.residual import ResVAE
        from scrubvae_tpu.utils.export import export_decoder, export_encoder

        window, n_joints, z_dim = 51, 18, 128
        model = ResVAE(
            in_channels=n_joints * 6 + 3,
            ch=(64, 128, 256, 512, 1024),
            kernel=5, z_dim=z_dim, window=window, is_diag=False,
            arena_size=((-290.0, -290.0, 0.0), (290.0, 290.0, 120.0)),
        )
        data0 = {
            "x6d": jnp.zeros((2, window, n_joints, 6)),
            "root": jnp.zeros((2, window, 3)),
        }
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, data0, train=False
        )
        enc = load_exported(export_encoder(model, variables, data0))
        enc_mu = load_exported(
            export_encoder(model, variables, data0, mu_only=True)
        )
        dec = load_exported(
            export_decoder(model, variables, data0, z_dim)
        )
        enc_keys, cond_keys, cond_shapes = ["x6d", "root"], [], {}
    else:
        ap.error("need --run or --flagship")

    rng = np.random.default_rng(0)
    device = jax.devices()[0]
    kind = getattr(device, "device_kind", "")

    for B in args.batches:
        data = {}
        for k in enc_keys:
            if k.startswith("x6d"):
                data[k] = jnp.asarray(
                    np.tanh(rng.normal(size=(B, window, n_joints, 6))),
                    jnp.float32,
                )
            else:
                data[k] = jnp.asarray(
                    rng.uniform(-200, 200, size=(B, window, 3)), jnp.float32
                )
        def emit(artifact, fn, call_args):
            st = _time_call(fn, call_args, iters=args.iters)
            print(json.dumps({
                "artifact": artifact, "batch": B,
                "latency_ms": round(st["pipelined"] * 1e3, 3),
                "latency_ms_sync_min": round(st["sync_min"] * 1e3, 3),
                "latency_ms_sync_p50": round(st["sync_p50"] * 1e3, 3),
                "samples_per_sec": round(B / st["pipelined"], 1),
                "device_kind": kind,
            }), flush=True)

        emit("encoder", lambda d: enc.call(d), (data,))
        if enc_mu is not None:
            emit("encoder_mu", lambda d: enc_mu.call(d), (data,))

        z = jnp.asarray(rng.normal(size=(B, z_dim)), jnp.float32)
        cond = {
            k: jnp.asarray(
                rng.normal(size=(B,) + tuple(cond_shapes[k])), jnp.float32
            )
            for k in cond_keys
        }
        emit("decoder", lambda a, c: dec.call(a, c), (z, cond))


if __name__ == "__main__":
    main()

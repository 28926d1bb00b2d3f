"""Benchmark: SC-VAE training throughput (samples/sec/chip).

Measures the steady-state fused train step of the flagship ResVAE
(reference operating point: window 51, ch 64-1024, z 128 - BASELINE.md row 3)
with the conditional + linear + MALS + gradient-reversal scrubber pipeline
and the on-device window-assembly data path, on synthetic pose streams.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: ratio against the recorded baseline in BENCH_BASELINE.json
(written on the first run of this benchmark on the target hardware, so later
rounds report speedup vs the round-1 TPU number). The reference itself
publishes no throughput numbers (BASELINE.md), and its CUDA-only PyTorch
implementation cannot run on this host - so the recorded round-1 TPU number
is the regression anchor.
"""

import argparse
import json
import os
import pathlib
import time

import jax

# Honor JAX_PLATFORMS at the *config* level: the host image's sitecustomize
# force-registers the axon (TPU) backend with jax_platforms='axon,cpu'
# regardless of the env var, so an explicit JAX_PLATFORMS=cpu request (e.g.
# the --small CPU smoke while the TPU tunnel is wedged) must be re-applied
# here or backend init hangs on the tunnel.
_env_platforms = os.environ.get("JAX_PLATFORMS", "")
if _env_platforms and "axon" not in _env_platforms:
    jax.config.update("jax_platforms", _env_platforms)

import jax.numpy as jnp
import numpy as np


def build(batch: int, window: int, z_dim: int, ch, small: bool, fused: bool = True,
          bf16_params: bool = False, sigma_rank: int = 0,
          host_stream: bool = False, mesh=None):
    from scrubvae_tpu import factory
    from scrubvae_tpu.data.dataset import StreamDataset
    from scrubvae_tpu.data.pipeline import build_frame_store
    from scrubvae_tpu.data.skeleton import load_skeleton
    from scrubvae_tpu.data.synthetic import synthetic_pose_stream
    from scrubvae_tpu.train.trainer import Trainer

    here = pathlib.Path(__file__).parent
    skel = load_skeleton(here / "configs" / "mouse_skeleton.yaml")
    n_frames = max(batch * 2 * 8, 4096)
    pose, ids = synthetic_pose_stream(skel, n_frames=n_frames, n_ids=4, seed=0)
    store = build_frame_store(pose, ids, skel, window=window, stride=2)
    arena = np.asarray([[-290, -290, 0], [290, 290, 120]], np.float32)
    ds = StreamDataset(
        store,
        skel,
        ("x6d", "root", "offsets", "target_pose", "avg_speed_3d", "heading", "ids"),
        "midfwd",
        arena_size=arena,
        discrete_classes={"ids": np.unique(ids)},
    )
    if host_stream:
        from scrubvae_tpu.data.hoststream import HostStreamDataset

        ds = HostStreamDataset.from_stream(ds)
    cfg = {
        "data": {
            "batch_size": batch,
            "dataset": "synthetic",
            "direction_process": "midfwd",
            "arena_size": arena.tolist(),
        },
        "disentangle": {
            "method": {
                "conditional": ["avg_speed_3d", "heading"],
                "linear": ["avg_speed_3d"],
                "moving_avg_lsq": ["avg_speed_3d"],
                "grad_reversal": ["avg_speed_3d"],
            },
            "features": ["avg_speed_3d", "heading"],
            "alpha": 1.0,
            "balance_loss": None,
            "bandwidth": 1.0,
            "polynomial": 1,
            "var_mode": "sphere",
            "l2_reg": 0.0,
            "n_iter": 2,
        },
        "model": {
            "type": "rcnn",
            "z_dim": z_dim,
            "window": window,
            "diag": False,
            "channel": list(ch),
            "kernel": 5,
            "start_epoch": 0,
            "load_model": None,
            "prior": "gaussian",
            "activation": "prelu",
            "init_dilation": None,
            "sigma_head_rank": sigma_rank or None,
            # bf16 conv/matmul compute, f32 params + losses (the TPU
            # mixed-precision recipe; parity test: TestMixedPrecision)
            "precision": "bf16",
        },
        "train": {
            "lr": 1e-4,
            "optimizer": "adamw",
            "lr_schedule": "cawr",
            "num_epochs": 1,
            "seed": 0,
            "mesh": mesh,
            "donate": True,
            # 1e6-clip is a no-op tripwire; skip the extra full-grad read
            "clip_norm": 0,
            "fused_optimizer": fused,
            "param_dtype": "bf16" if bf16_params else "f32",
        },
        "loss": {
            "rotation": 1.0,
            "prior": 0.001,
            "root": 0.01,
            "jpe": 1.0,
            "avg_speed_3d_mals": 0.1,
            "avg_speed_3d_lin": 1.0,
            "avg_speed_3d_gr": 1.0,
        },
        "out_path": "/tmp/scrubvae_bench/",
    }
    for d in ("weights", "checkpoints", "latents"):
        pathlib.Path(cfg["out_path"], d).mkdir(parents=True, exist_ok=True)
    model, info = factory.build_model(
        cfg["model"],
        cfg["disentangle"],
        n_keypts=18,
        direction_process="midfwd",
        arena_size=arena,
        discrete_classes=ds.discrete_classes,
        loss_keys=cfg["loss"].keys(),
    )
    return Trainer(cfg, {"train": ds}, model, info), ds


# Peak specs by TPU generation (bf16 matmul TFLOP/s, HBM GB/s per chip).
# Sources: published Google Cloud TPU system architecture tables.
_PEAKS = (
    ("v5 lite", 197e12, 819e9),
    ("v5e", 197e12, 819e9),
    ("v5p", 459e12, 2765e9),
    ("v6", 918e12, 1640e9),
    ("v4", 275e12, 1228e9),
    ("v3", 123e12, 900e9),
    ("v2", 45e12, 700e9),
)


def peak_specs(device) -> tuple:
    kind = getattr(device, "device_kind", "") or ""
    for tag, tflops, bw in _PEAKS:
        if tag in kind.lower():
            return kind, tflops, bw
    return kind, None, None


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--window", type=int, default=51)
    ap.add_argument("--z_dim", type=int, default=128)
    # one scanned-epoch call; large enough that the ~60ms per-dispatch
    # host overhead is amortized as in real epochs (hundreds of steps)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--small", action="store_true", help="tiny model (CPU smoke)")
    ap.add_argument(
        "--no-fused", action="store_true",
        help="disable the Pallas fused AdamW (A/B attribution)",
    )
    ap.add_argument(
        "--f32-params", action="store_true",
        help="f32 parameter storage (A/B; default is bf16 storage with"
        " stochastic rounding for the large kernels - the recommended"
        " TPU training config, train.param_dtype: bf16)",
    )
    ap.add_argument(
        "--sigma-rank", type=int, default=0,
        help="low-rank fc_sigma factorization (model.sigma_head_rank;"
        " config-gated deviation, 0 = reference-exact dense head)",
    )
    ap.add_argument(
        "--host-stream", action="store_true",
        help="host-RAM frame store + double-buffered slab prefetch"
        " (data.host_stream; measures the capacity-axis streaming path)",
    )
    return ap.parse_args()


def run(args) -> dict:
    """One full build+compile+measure pass; returns the result record.

    Kept as a self-contained body so the transient-failure retry in
    main() can re-run it from scratch after a backend reset (every live
    device array dies with the old client — VERDICT r4 #1/W1)."""
    ch = (8, 8, 16, 16, 32) if args.small else (64, 128, 256, 512, 1024)
    batch = 16 if args.small else args.batch

    # bf16 parameter storage (stochastically-rounded stores, f32 master
    # semantics preserved by SR unbiasedness) is the recommended TPU config
    # and the bench default; --f32-params measures the reference-exact
    # storage. Small models keep f32 (the win only exists at flagship size).
    bf16_params = not args.f32_params and not args.small
    trainer, ds = build(batch, args.window, 16 if args.small else args.z_dim, ch, args.small,
                        fused=not args.no_fused, bf16_params=bf16_params,
                        sigma_rank=args.sigma_rank, host_stream=args.host_stream)
    loss_scale = trainer.loss_scale_for_epoch(1)
    n = len(ds)
    rng = np.random.default_rng(0)

    state = trainer.state

    def idx_matrix(steps):
        return jnp.asarray(
            rng.integers(0, n, size=(steps, batch)), dtype=jnp.int32
        )

    if args.host_stream:
        # Capacity-axis path: per-step feed of prefetched host slabs
        # (data/hoststream.py). Measures the streaming overhead vs the
        # device-resident scanned epoch (the default measurement below).
        from scrubvae_tpu.data.hoststream import prefetch_to_device

        batches = [rng.integers(0, n, size=batch) for _ in range(args.steps)]

        def run_epoch(st):
            metrics = None
            for slab in prefetch_to_device(
                trainer.train_ds.epoch_slabs(batches), size=2
            ):
                st, metrics = trainer.train_step(st, slab, loss_scale)
            jax.block_until_ready(metrics)
            return st, metrics

        state, metrics = run_epoch(state)  # compile + warm
        t0 = time.perf_counter()
        state, metrics = run_epoch(state)
        dt = time.perf_counter() - t0
        total = float(metrics["total"])
        assert np.isfinite(total), f"non-finite loss in host-stream bench: {total}"
        sps_per_chip = batch * args.steps / dt / max(jax.device_count(), 1)
        out = {
            "metric": "train_samples_per_sec_per_chip",
            "value": round(sps_per_chip, 2),
            "unit": "samples/sec/chip",
            "host_stream": True,
            "step_ms": round(dt / args.steps * 1e3, 3),
            "device_kind": getattr(jax.devices()[0], "device_kind", ""),
        }
        baseline_path = pathlib.Path(__file__).parent / "BENCH_BASELINE.json"
        if baseline_path.exists():
            base = json.loads(baseline_path.read_text())
            out["vs_baseline"] = round(sps_per_chip / base["value"], 3)
        return out

    # Measure the real training path: the device-resident scanned epoch
    # (one dispatch per chunk of steps), as used by Trainer.train_epoch.
    # AOT lower/compile so the compiled program's own cost analysis (FLOPs,
    # HBM bytes) backs the roofline numbers below; the same executable is
    # then timed, so the analysis describes exactly what ran.
    from scrubvae_tpu.utils.retry import retry_compile

    lowered = trainer.train_epoch_fn.lower(state, idx_matrix(args.steps), loss_scale)
    # compile() is the exact call the r4 driver run died on (tunnel
    # remote-compile RPC drop): retry on the same client first
    compiled = retry_compile(lowered)
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        # XLA's cost analysis counts a lax.scan body ONCE regardless of
        # trip count (verified: a length-100 scanned matmul reports the
        # same flops as length-1), so the program analysis IS the per-step
        # cost of the scanned train step — no division by steps.
        flops_per_step = float(ca.get("flops", 0.0))
        bytes_per_step = float(ca.get("bytes accessed", 0.0))
    except Exception:
        flops_per_step = bytes_per_step = 0.0
    # Second, PINNED FLOP convention (VERDICT r3 W6): static 2MNK over the
    # optimized module's dot/convolution ops. cost_analysis and the static
    # count differ ~17% at the flagship point (remat/fusion elision); both
    # are reported under their own names so cross-round MFU deltas never
    # come from silently switching conventions.
    try:
        from scrubvae_tpu.utils.hlo_flops import static_mxu_flops

        static_flops_per_step = float(static_mxu_flops(compiled.as_text()))
    except Exception:
        static_flops_per_step = 0.0

    state, metrics = compiled(state, idx_matrix(args.steps), loss_scale)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    state, metrics = compiled(state, idx_matrix(args.steps), loss_scale)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    # a benchmark number from a numerically-dead run is meaningless
    total = float(metrics["total"])
    assert np.isfinite(total), f"non-finite training loss in bench run: {total}"

    sps = batch * args.steps / dt
    n_chips = jax.device_count()
    sps_per_chip = sps / max(n_chips, 1)

    baseline_path = pathlib.Path(__file__).parent / "BENCH_BASELINE.json"
    if baseline_path.exists():
        baseline = json.loads(baseline_path.read_text())
        vs = sps_per_chip / baseline["value"]
    else:
        if not args.small:
            baseline_path.write_text(
                json.dumps(
                    {
                        "metric": "train_samples_per_sec_per_chip",
                        "value": sps_per_chip,
                        "unit": "samples/sec/chip",
                        "platform": jax.devices()[0].platform,
                        "note": "round-1 anchor (reference publishes no numbers)",
                    }
                )
            )
        vs = 1.0

    # Roofline accounting (VERDICT r1 task 5): FLOPs and HBM bytes are the
    # compiled program's own cost analysis (checkable: XLA counts what it
    # executes, including remat); peaks are the published per-chip specs
    # for the detected device kind.
    step_s = dt / args.steps
    kind, peak_flops, peak_bw = peak_specs(jax.devices()[0])
    out = {
        "metric": "train_samples_per_sec_per_chip",
        "value": round(sps_per_chip, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(vs, 3),
        "step_ms": round(step_s * 1e3, 3),
        "device_kind": kind,
        "param_dtype": "bf16" if bf16_params else "f32",
        "sigma_head_rank": args.sigma_rank or None,
    }
    if flops_per_step:
        out["tflops_per_s"] = round(flops_per_step / step_s / 1e12, 2)
        # "bytes accessed" counts every buffer operand XLA touches,
        # including fusion-internal reads that never leave VMEM — it is an
        # UPPER bound on HBM traffic (can exceed the HBM peak), reported
        # under its own name rather than dressed up as measured bandwidth.
        out["bytes_accessed_gb_per_s"] = round(bytes_per_step / step_s / 1e9, 1)
        if peak_flops:
            # Both FLOP conventions, pinned by name (see the lowering block
            # above): "mfu" stays = mfu_cost_analysis for cross-round
            # comparability with BENCH_r01..r03.
            out["mfu"] = round(flops_per_step / step_s / peak_flops, 4)
            out["mfu_cost_analysis"] = out["mfu"]
            if static_flops_per_step:
                out["mfu_static_hlo"] = round(
                    static_flops_per_step / step_s / peak_flops, 4
                )
                out["static_hlo_gflops_per_step"] = round(
                    static_flops_per_step / 1e9, 1
                )
            out["peak_tflops"] = peak_flops / 1e12
            out["peak_hbm_gb_per_s"] = peak_bw / 1e9
    return out


def main():
    args = parse_args()
    from scrubvae_tpu.utils.retry import with_backend_retry

    # Outer retry: reconnect (backend reset) + full rebuild on transient
    # tunnel failures anywhere in the measurement body; exit nonzero only
    # after retries are exhausted (VERDICT r4 #1).
    out = with_backend_retry(
        lambda: run(args), retries=2, base_delay=30.0, reset_backend=True
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

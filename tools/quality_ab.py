"""Long-horizon quality-at-speed A/B (VERDICT r3 #3).

Runs the FLAGSHIP operating point (window 51, ch 64-1024, z 128, full
scrubber stack from configs/sane/4_full.yaml) on the structured synthetic
stream twice through the real CLI:

  - ``default``: the shipping bench configuration — bf16 compute, bf16
    parameter storage with stochastically-rounded stores, packed Cholesky
    head, Pallas fused AdamW;
  - ``ref_storage``: the reference-exact numerics configuration the
    gradient-parity evidence used — f32 parameter storage, unfused optax
    AdamW (``--f32-params --no-fused`` in bench.py terms).

and commits both metric CSVs plus an overlay summary: per-metric relative
differences of the train-loss curves (tail window) and of every eval metric
row (losses, generative-restrictiveness R^2, CV decodability). "Within
noise" is judged against the run-to-run differential spread measured in
PARITY.md §1 (a few % on losses, wider on CV metrics).

The reference has no counterpart (it publishes no numbers, SURVEY.md §6);
this closes the gap between "the bench default" and "the config the parity
evidence used" over a horizon where SR-rounding drift could compound.

Usage:
  python tools/quality_ab.py --epochs 300 --frames 24000 \
      --out /tmp/quality_ab --data /tmp/scrubvae_quality
  python tools/quality_ab.py --smoke          # tiny CPU harness check
"""

import argparse
import csv
import json
import pathlib
import subprocess
import sys
import time

HERE = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(HERE))
sys.path.insert(0, str(HERE / "tools"))

from run_ladder import gen_data  # noqa: E402  (tools/run_ladder.py)

ARMS = {
    "default": {"param_dtype": "bf16", "fused_optimizer": True},
    "ref_storage": {"param_dtype": "f32", "fused_optimizer": False},
    # Noise floors: identical numerics, different train.seed. Long-horizon
    # trajectories of the adversarial/annealed metrics are chaotic;
    # "within noise" is only judged against the spread runs of the SAME
    # numerics show (and the f32 pairs resolve whether a basin difference
    # tracks numerics or the attractor lottery). Three seeds per numerics
    # (VERDICT r4 #7): the floor is the max pairwise spread over n=3.
    "default_seed1": {"param_dtype": "bf16", "fused_optimizer": True,
                      "seed": 1},
    "ref_storage_seed1": {"param_dtype": "f32", "fused_optimizer": False,
                          "seed": 1},
    "default_seed2": {"param_dtype": "bf16", "fused_optimizer": True,
                      "seed": 2},
    "ref_storage_seed2": {"param_dtype": "f32", "fused_optimizer": False,
                          "seed": 2},
    # Opt-in perf deviations to certify against the seed floor (VERDICT
    # r4 #3): low-rank fc_sigma head (+6% measured r2) and diagonal
    # covariance (+25% measured). "model" keys land in cfg["model"];
    # everything else in cfg["train"]. Reference anchor for both: the
    # full-covariance CholeskyL head (model/residual.py:39-68).
    "sigma_rank256": {"param_dtype": "bf16", "fused_optimizer": True,
                      "model": {"sigma_head_rank": 256}},
    "sigma_rank256_seed1": {"param_dtype": "bf16", "fused_optimizer": True,
                            "seed": 1, "model": {"sigma_head_rank": 256}},
    "diag_cov": {"param_dtype": "bf16", "fused_optimizer": True,
                 "model": {"diag": True}},
}

# Seed-replicate families: arms whose pairwise spread defines the noise
# floor for their numerics. Deviation arms are judged against the
# DEFAULT-numerics floor (they share bf16+fused numerics with it).
SEED_FAMILIES = {
    "default": ["default", "default_seed1", "default_seed2"],
    "ref_storage": ["ref_storage", "ref_storage_seed1", "ref_storage_seed2"],
}
_SEED_ARMS = {a for fam in SEED_FAMILIES.values() for a in fam[1:]}


def build_config(args, arm: str):
    import yaml

    cfg = yaml.safe_load((HERE / "configs" / "sane" / "4_full.yaml").read_text())
    cfg["data"]["data_path"] = str(pathlib.Path(args.data).resolve()) + "/"
    cfg["data"]["batch_size"] = args.batch
    arm_cfg = dict(ARMS[arm])
    model_over = dict(arm_cfg.pop("model", {}))
    cfg["train"].update(
        num_epochs=args.epochs,
        eval_start_epoch=min(50, args.epochs),
        **arm_cfg,
    )
    if args.smoke:
        cfg["model"].update(z_dim=16, channel=[8, 8, 16, 16, 32])
        # smoke keeps f32 storage in BOTH arms (the bf16 win and its SR
        # machinery are flagship-size mechanisms; tiny leaves stay f32
        # under the MIN_PALLAS_ELEMS threshold anyway)
        cfg["train"]["param_dtype"] = "f32"
        if "sigma_head_rank" in model_over:
            model_over["sigma_head_rank"] = 8  # rank < z_dim at smoke size
    else:
        cfg["model"].update(z_dim=128, channel=[64, 128, 256, 512, 1024])
    cfg["model"].update(**model_over)
    cfg["out_path"] = "current"
    return cfg


def _arm_complete(run_dir: pathlib.Path, epochs: int) -> bool:
    """A metrics.csv one row short of num_epochs still counts: the final
    epoch's row is logged AFTER its checkpoint save (trainer.fit), so a
    crash between the two (e.g. ENOSPC on the epoch-300 full-state write,
    seen in the r5 stage-2 run) leaves epochs-1 faithful rows — the
    overlay compares common epochs, so the arm is usable as-is and
    retraining 299 epochs to recover one row is never worth it."""
    try:
        rows = list(csv.DictReader(open(run_dir / "metrics.csv")))
        return len(rows) >= epochs - 1 and int(rows[-1]["epoch"]) >= epochs - 1
    except (OSError, KeyError, ValueError):
        return False


def run_arm(args, arm: str) -> pathlib.Path:
    import yaml

    out_root = pathlib.Path(args.out)
    run_dir = out_root / "quality_ab" / arm
    if args.reuse and _arm_complete(run_dir, args.epochs):
        # staged invocations: later stages add arms without re-training
        # the ones already finished (the summary is only written at the
        # END of a run, so cumulative re-invocation is the recovery path
        # when a stage dies mid-set)
        print(f"{arm}: complete run found, reusing", flush=True)
        return run_dir
    run_dir.mkdir(parents=True, exist_ok=True)

    def latest_checkpoint_epoch() -> int:
        """Largest epoch with a FULL train-state checkpoint (optimizer +
        scrubber moments, saved every 20 epochs) — the only resume point
        that continues the trajectory rather than restarting Adam."""
        best = 0
        for f in (run_dir / "checkpoints").glob("epoch_*.msgpack"):
            try:
                best = max(best, int(f.stem.split("_")[1]))
            except ValueError:
                pass
        return best

    t0 = time.time()
    # Arms run for hours on a tunnel that wedges sporadically (CLAUDE.md):
    # on failure, resume from the latest full-state checkpoint instead of
    # losing the arm (the r4 ref_storage arm needed this done by hand).
    for attempt in range(args.max_attempts):
        cfg = build_config(args, arm)
        start = latest_checkpoint_epoch()
        if start:
            cfg["model"]["load_model"] = str(run_dir)
            cfg["model"]["start_epoch"] = start
            print(f"{arm}: resuming from epoch {start}", flush=True)
        (run_dir / "model_config.yaml").write_text(yaml.safe_dump(cfg))
        proc = subprocess.run(
            [
                sys.executable,
                str(HERE / "train_model.py"),
                "-o", str(out_root),
                "-p", "quality_ab",
                "-n", arm,
            ],
            capture_output=True,
            text=True,
            timeout=args.timeout,
        )
        if proc.returncode == 0:
            break
        print(proc.stdout[-2000:])
        print(proc.stderr[-4000:])
        if attempt + 1 >= args.max_attempts:
            raise RuntimeError(
                f"{arm} failed after {args.max_attempts} attempts "
                f"(rc {proc.returncode})"
            )
        made_progress = latest_checkpoint_epoch() > start
        print(
            f"{arm}: attempt {attempt + 1} failed (rc {proc.returncode}), "
            f"{'progress made, ' if made_progress else ''}retrying in 60s",
            flush=True,
        )
        time.sleep(60)
    wall = time.time() - t0
    print(f"{arm}: {args.epochs} epochs in {wall:.0f}s", flush=True)
    if not args.keep_run_state:
        # the harness consumes only metrics.csv; the per-arm weights +
        # full-state checkpoints are ~10-19 GB each at the flagship point
        # and filled the disk in the r5 stage-2 run (ENOSPC at the final
        # checkpoint write)
        import shutil

        for sub in ("weights", "checkpoints", "latents"):
            shutil.rmtree(run_dir / sub, ignore_errors=True)
    return run_dir


def read_metrics(run_dir: pathlib.Path):
    rows = list(csv.DictReader(open(run_dir / "metrics.csv")))
    out = {}
    for r in rows:
        for k, v in r.items():
            if v in ("", None) or k == "epoch":
                continue
            try:
                out.setdefault(k, []).append((int(r["epoch"]), float(v)))
            except ValueError:
                pass
    return out


def overlay(a: dict, b: dict, tail: int):
    """Per-metric relative difference between two runs' curves.

    Train curves: mean/max |rel diff| over the common tail window.
    Eval metrics (sparse rows): compared on common epochs."""
    summary = {}
    for k in sorted(set(a) & set(b)):
        ea = dict(a[k])
        eb = dict(b[k])
        common = sorted(set(ea) & set(eb))
        if not common:
            continue
        window = common[-tail:] if k.endswith("_train") else common
        diffs = []
        for e in window:
            va, vb = ea[e], eb[e]
            # NaN-in-both is agreement (e.g. the QDA decodability folds NaN
            # identically in each arm); NaN-in-one is maximal divergence
            if va != va or vb != vb:
                diffs.append(0.0 if (va != va and vb != vb) else 1.0)
                continue
            denom = max(abs(va), abs(vb), 1e-9)
            diffs.append(abs(va - vb) / denom)
        def _j(v):  # keep the summary strict JSON
            return None if v != v else v

        summary[k] = {
            "epochs_compared": len(window),
            "mean_rel_diff": sum(diffs) / len(diffs),
            "max_rel_diff": max(diffs),
            "last_a": _j(ea[window[-1]]),
            "last_b": _j(eb[window[-1]]),
        }
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--frames", type=int, default=24000)
    ap.add_argument("--val-frames", type=int, default=None)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--out", default="/tmp/quality_ab")
    ap.add_argument("--data", default="/tmp/scrubvae_quality")
    ap.add_argument("--tail", type=int, default=50,
                    help="train-curve comparison window (last N epochs)")
    ap.add_argument("--timeout", type=int, default=4 * 3600)
    ap.add_argument("--artifacts", default=str(HERE / "artifacts" / "quality_ab"))
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes + 6 epochs (CPU harness check)")
    ap.add_argument("--reuse", action="store_true",
                    help="skip arms whose run dir already holds a complete"
                    " metrics.csv (staged / resumed invocations)")
    ap.add_argument("--max-attempts", type=int, default=4,
                    help="per-arm launch attempts; failures resume from the"
                    " latest full-state checkpoint")
    ap.add_argument("--keep-run-state", action="store_true",
                    help="keep each arm's weights/checkpoints after it"
                    " completes (default: delete — ~10-19 GB per flagship"
                    " arm, and the harness only reads metrics.csv)")
    ap.add_argument("--arms", nargs="*",
                    default=[a for a in ARMS
                             if a not in ("sigma_rank256",
                                          "sigma_rank256_seed1", "diag_cov")])
    args = ap.parse_args()
    unknown = [a for a in args.arms if a not in ARMS]
    if unknown:
        # validate BEFORE hours of training (ADVICE r4): a typo'd arm
        # name must fail here, not in summarize() after all arms ran
        ap.error(f"unknown arm(s) {unknown}; choose from {list(ARMS)}")
    if args.smoke:
        args.epochs = min(args.epochs, 6)
        args.frames = min(args.frames, 1200)
        args.batch = min(args.batch, 32)

    gen_data(
        pathlib.Path(args.data),
        args.frames,
        args.val_frames or args.frames // 3,
        "structured",
    )

    runs = {}
    for arm in args.arms:
        runs[arm] = read_metrics(run_arm(args, arm))

    art = pathlib.Path(args.artifacts)
    art.mkdir(parents=True, exist_ok=True)
    for arm in runs:
        src = pathlib.Path(args.out) / "quality_ab" / arm / "metrics.csv"
        (art / f"{arm}{'_smoke' if args.smoke else ''}.csv").write_text(
            src.read_text()
        )

    if len(runs) >= 2:
        summary = summarize(runs, args.tail)
        payload = {
            "arms": {a: ARMS[a] for a in runs},
            "epochs": args.epochs,
            "frames": args.frames,
            "batch": args.batch,
            "smoke": bool(args.smoke),
            "tail_window": args.tail,
            **summary,
        }
        name = "summary_smoke.json" if args.smoke else "summary.json"
        (art / name).write_text(json.dumps(payload, indent=1))
        print_report(summary)
        print(f"wrote {art / name}")


def _seed_noise(runs: dict, family: list, tail: int):
    """Per-metric noise floor from every pairwise overlay of the seed
    replicates present (n=2 -> the single pair, n=3 -> max over 3 pairs;
    the max is the conservative floor VERDICT r4 #7 asked for)."""
    import itertools

    present = [a for a in family if a in runs]
    if len(present) < 2:
        return None, present
    pairs = [
        overlay(runs[a], runs[b], tail)
        for a, b in itertools.combinations(present, 2)
    ]
    noise = {}
    for k in sorted(set().union(*pairs)):
        vals = [p[k]["mean_rel_diff"] for p in pairs if k in p]
        maxes = [p[k]["max_rel_diff"] for p in pairs if k in p]
        noise[k] = {
            "mean_rel_diff": max(vals),
            "max_rel_diff": max(maxes),
            "n_pairs": len(vals),
        }
    return noise, present


def _verdict(ab: dict, noise: dict) -> dict:
    """Per-metric WITHIN NOISE call: the numerics divergence must not
    exceed the same-numerics seed spread (small floor added so near-zero
    noise metrics aren't flagged for sub-% deltas)."""
    verdict = {}
    for k, v in ab.items():
        n = noise.get(k)
        if n is None:
            continue
        bound = n["mean_rel_diff"] + 0.02
        verdict[k] = {
            "ab_mean_rel_diff": v["mean_rel_diff"],
            "seed_noise_mean_rel_diff": n["mean_rel_diff"],
            "within_noise": v["mean_rel_diff"] <= bound,
        }
    return verdict


def summarize(runs: dict, tail: int) -> dict:
    """A/B overlays of every deviation arm vs the baseline, plus (when
    seed-replicate arms ran) per-metric verdicts against the seed-spread
    noise floor. Robust to arbitrary --arms subsets (ADVICE r4): no arm
    name is required; with neither canonical arm present it falls back to
    a generic pairwise overlay of whatever ran."""
    out = {}
    baseline = "default" if "default" in runs else sorted(runs)[0]

    noise, noise_arms = _seed_noise(runs, SEED_FAMILIES["default"], tail)
    if noise is not None:
        out["seed_noise"] = noise
        out["seed_noise_arms"] = noise_arms
    f32_noise, f32_arms = _seed_noise(runs, SEED_FAMILIES["ref_storage"], tail)
    if f32_noise is not None:
        out["f32_seed_noise"] = f32_noise
        out["f32_seed_noise_arms"] = f32_arms

    comparisons = {
        arm: overlay(runs[baseline], runs[arm], tail)
        for arm in sorted(runs)
        if arm != baseline and arm not in _SEED_ARMS
    }
    if not comparisons and len(runs) >= 2:
        # seed-only subsets: overlay the first two arms so the artifact
        # still records SOMETHING comparable
        a, b = sorted(runs)[:2]
        comparisons = {b: overlay(runs[a], runs[b], tail)}
    out["baseline"] = baseline
    out["comparisons"] = comparisons
    # Back-compat view: "metrics"/"verdict" are the canonical
    # default-vs-ref_storage comparison when it ran, else the first one.
    canon = "ref_storage" if "ref_storage" in comparisons else (
        next(iter(comparisons), None)
    )
    out["metrics"] = comparisons.get(canon, {})

    if noise is not None:
        out["verdicts"] = {
            arm: _verdict(ab, noise) for arm, ab in comparisons.items()
        }
        if canon is not None:
            verdict = out["verdicts"][canon]
            out["verdict"] = verdict
            out["within_noise_count"] = sum(
                1 for v in verdict.values() if v["within_noise"]
            )
            out["metric_count"] = len(verdict)
    return out


def tail_stats(runs: dict, lo: int, hi: int) -> dict:
    """Per-arm per-metric mean±std over epochs in [lo, hi] (NaNs dropped;
    the complementary view to the pairwise overlay: shows each arm's own
    tail-window envelope so phase-offset oscillations don't read as
    divergence)."""
    import statistics

    out = {}
    for arm, run in runs.items():
        stats = {}
        for k, pts in run.items():
            vals = [v for e, v in pts if lo <= e <= hi and v == v]
            if not vals:
                continue
            stats[k] = {
                "mean": statistics.mean(vals),
                "std": statistics.stdev(vals) if len(vals) > 1 else 0.0,
                "n": len(vals),
            }
        out[arm] = stats
    return out


def print_report(summary: dict):
    noise = summary.get("seed_noise", {})
    baseline = summary.get("baseline", "default")
    for arm, metrics in summary.get("comparisons", {}).items():
        verdict = summary.get("verdicts", {}).get(arm, {})
        print(f"\n== {baseline} vs {arm} ==")
        print(f"{'metric':42s} {'ab_mean':>8s} {'noise_mean':>10s}  verdict")
        for k, v in sorted(metrics.items()):
            n = noise.get(k)
            if n is None or k not in verdict:
                print(f"{k:42s} {v['mean_rel_diff']*100:7.2f}%")
                continue
            ok = verdict[k]["within_noise"]
            print(
                f"{k:42s} {v['mean_rel_diff']*100:7.2f}% "
                f"{n['mean_rel_diff']*100:9.2f}%  "
                f"{'within noise' if ok else 'EXCEEDS noise'}"
            )
        if verdict:
            ok_n = sum(1 for v in verdict.values() if v["within_noise"])
            print(f"{ok_n}/{len(verdict)} metrics within seed-to-seed noise")


if __name__ == "__main__":
    main()

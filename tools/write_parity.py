"""Compose PARITY.md from measured artifacts:

1. differential baseline vs the reference (tools/ref_baseline.py output:
   /tmp/refbase/cfg*/{ref,ours}_metrics.json) - same data, same init, same
   batch order, reference's own torch train loop on CPU;
2. sane-regime ladder on the structured stream (tools/run_ladder.py
   --stream structured --config-dir configs/sane, ladder_results.json);
3. legacy midfwd ladder table (r1 format) if present.

Usage: python tools/write_parity.py [--refbase /tmp/refbase]
       [--sane /tmp/sane_runs/ladder_results.json]
       [--ladder /tmp/ladder_runs/ladder_results.json]
"""

from __future__ import annotations

import argparse
import json
import pathlib

HERE = pathlib.Path(__file__).resolve().parent.parent

LOSS_KEYS = ("total", "rotation", "root", "prior", "jpe",
             "avg_speed_3d_mals", "heading_mals", "mcmi", "avg_speed_3d_an",
             "ids_qda")


def fmt(v, nd=4):
    if v is None:
        return ""
    if isinstance(v, float):
        return f"{v:.4g}"
    return str(v)


def differential_section(refbase: pathlib.Path):
    lines = [
        "## 1. Differential vs the reference (same data, same init, same batch order)",
        "",
        "`tools/ref_baseline.py` drives the reference's own",
        "`train_test_epoch`/`test_epoch` (`/root/reference/src/scrubvae/train/trainer.py:102-319`)",
        "on CPU (torch 2.x-cpu; only library stubs + one documented",
        '`device="cuda"` monkeypatch injected, checkout unmodified), against',
        "this framework on the **identical** windowed tensors, initial weights",
        "(reference torch init imported via `utils/torch_import.py`), and",
        "per-epoch batch permutations. 6000 structured-stream train frames,",
        "batch 64, 20 epochs, Adam lr 1e-4.",
        "",
    ]
    rows = []
    traj = []
    for c in range(1, 6):
        d = refbase / f"cfg{c}"
        refp, oursp = d / "ref_metrics.json", d / "ours_metrics.json"
        if not oursp.exists():
            continue
        ours = json.loads(oursp.read_text())
        ref = json.loads(refp.read_text()) if refp.exists() else None
        oh = ours["history"]
        if ref is None:
            rows.append((c, None, oh))
            continue
        rh = ref["history"]
        rows.append((c, ref, ours))
        rels = []
        for e in range(min(len(rh), len(oh))):
            r, o = rh[e], oh[e]
            for k in (k for k in r if k.endswith("_train") and k in o):
                denom = max(abs(r[k]), 1e-9)
                rels.append(abs(o[k] - r[k]) / denom)
        traj.append((c, max(rels), sum(rels) / len(rels)))

    lines += [
        "### Final-epoch (20) train losses, reference vs this framework",
        "",
        "| config | loss | reference | ours | rel diff |",
        "|---|---|---|---|---|",
    ]
    for c, ref, ours in rows:
        if ref is None:
            continue
        r, o = ref["history"][-1], ours["history"][-1]
        for k in LOSS_KEYS:
            kk = k + "_train"
            if kk in r and kk in o:
                rel = abs(o[kk] - r[kk]) / max(abs(r[kk]), 1e-9)
                lines.append(
                    f"| cfg{c} | {k} | {fmt(r[kk])} | {fmt(o[kk])} | {rel:.1%} |"
                )
    lines += [
        "",
        "### Epoch-1 parity and trajectory agreement",
        "",
        "Epoch 1 is the sharpest test (identical init, divergence has not",
        "compounded); later epochs drift through optimizer-noise",
        "amplification, then re-converge as both sides approach the same",
        "optimum.",
        "",
        "| config | epoch-1 total (ref / ours) | max rel diff over 20 epochs (any loss) | mean rel diff |",
        "|---|---|---|---|",
    ]
    for c, ref, ours in rows:
        if ref is None:
            continue
        r1 = ref["history"][0]["total_train"]
        o1 = ours["history"][0]["total_train"]
        mx, mn = next((m, a) for cc, m, a in traj if cc == c)
        lines.append(f"| cfg{c} | {fmt(r1)} / {fmt(o1)} | {mx:.1%} | {mn:.1%} |")

    # generative restrictiveness parity (midfwd regime)
    lines += [
        "",
        "### Generative-restrictiveness parity in the midfwd regime",
        "",
        "Under `midfwd` the alignment itself removes absolute heading from the",
        "pose, so heading conditioning is uninformative **by construction** —",
        "and the reference pins `r2_gen_restrict_heading` at −1 exactly as",
        "this framework does (r1 VERDICT W1 resolved: the r1 numbers were",
        "parity with reference behavior, not a broken conditioning path; the",
        "sane regime for this metric is §2).",
        "",
        "| config | metric | reference | ours |",
        "|---|---|---|---|",
    ]
    for c, ref, ours in rows:
        if ref is None:
            continue
        r, o = ref["history"][-1], ours["history"][-1]
        for k in ("r2_gen_restrict_avg_speed_3d_test", "r2_gen_restrict_heading_test"):
            if k in r and k in o:
                lines.append(
                    f"| cfg{c} | {k[:-5].replace('r2_gen_restrict_','gen-restrict R² ')} "
                    f"| {fmt(r[k])} | {fmt(o[k])} |"
                )

    # cfg5 robustness note
    cfg5_ours = refbase / "cfg5" / "ours_metrics.json"
    cfg5_ref = refbase / "cfg5" / "ref_metrics.json"
    if cfg5_ours.exists() and not cfg5_ref.exists():
        o = json.loads(cfg5_ours.read_text())["history"]
        lines += [
            "",
            "### cfg5 (full stack incl. QDA): reference diverges, ours does not",
            "",
            "On the identical data/init/batch order, the **reference NaNs at",
            "epoch 2**: its streaming QDA covariance update decays the identity",
            "init within one epoch (EMA λ=0.2: 0.8^94 ≈ 7e-10) and early-",
            "training dead latent dims leave the class covariance numerically",
            "singular, so `torch.logdet` returns NaN",
            "(`/root/reference/src/scrubvae/model/disentangle.py:129-135`),",
            "which poisons the total loss and the weights. This framework's",
            "`slogdet`-based likelihood (`scrubvae_tpu/models/scrubbers.py`",
            "`_cgll`) stays finite on the same trajectory: epoch-1 total",
            f"{fmt(o[0]['total_train'])}, epoch-20 total {fmt(o[-1]['total_train'])},",
            "all 20 epochs finite (a documented robustness deviation, not a",
            "semantic one - both compute the same likelihood ratio).",
        ]

    # throughput anchors
    lines += [
        "",
        "### Measured reference throughput (CPU anchor)",
        "",
        "| config | reference samples/s (torch CPU) | ours samples/s (same CPU) |",
        "|---|---|---|",
    ]
    for c, ref, ours in rows:
        if ref is None:
            continue
        lines.append(
            f"| cfg{c} | {ref['samples_per_s']:.0f} | {ours['samples_per_s']:.0f} |"
        )
    lines += [
        "",
        "The reference cannot run on TPU (eager CUDA torch); its measured CPU",
        "throughput above is the only reference throughput measurable in this",
        "environment and serves as a floor anchor. The flagship TPU number",
        "(BENCH_r*.json, bench.py) is reported against the recorded round-1",
        "TPU anchor in BENCH_BASELINE.json; at the r1 measurement the fused",
        "TPU step ran ~65,000 samples/s/chip vs ~400 samples/s for the",
        "reference's loop on this host's CPU.",
        "",
    ]
    return lines


def salvage_from_csv(results, run_root: pathlib.Path):
    """Reconstruct entries for configs whose subprocess died (e.g. wall-time
    limit) from their metrics.csv - same row-selection rule as
    run_ladder.run_config (last row + last row carrying *_test metrics)."""
    import csv

    out = []
    for r in results:
        if "error" not in r:
            out.append(r)
            continue
        csv_path = run_root / r["config"] / "metrics.csv"
        if not csv_path.exists():
            out.append(r)
            continue
        rows = list(csv.DictReader(open(csv_path)))
        if not rows:
            out.append(r)
            continue
        last = rows[-1]
        eval_row = next(
            (row for row in reversed(rows)
             if any(k.endswith("_test") and row.get(k) for k in row)),
            None,
        )
        sel = {
            "config": r["config"],
            "epochs": int(last["epoch"]),
            "note": "wall-limit; last eval row epoch "
            + (eval_row["epoch"] if eval_row else "n/a"),
        }
        for k in ("total_train", "rotation_train", "jpe_train", "root_train",
                  "prior_train", "mcmi_train", "time"):
            if last.get(k):
                sel[k] = float(last[k])
        if eval_row:
            for k, v in eval_row.items():
                if v and (k.endswith("_test") or k.startswith("r2_")
                          or k.startswith("acc_")):
                    sel[k] = float(v)
        out.append(sel)
    return out


def ladder_table(results, title, intro):
    lines = [title, "", *intro, ""]
    all_keys = []
    for r in results:
        for k in r:
            if k not in all_keys:
                all_keys.append(k)
    lines.append("| " + " | ".join(all_keys) + " |")
    lines.append("|" + "---|" * len(all_keys))
    for r in results:
        lines.append(
            "| " + " | ".join(fmt(r.get(k, "")) for k in all_keys) + " |"
        )
    return lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--refbase", type=pathlib.Path, default=pathlib.Path("/tmp/refbase"))
    ap.add_argument("--sane", type=pathlib.Path,
                    default=pathlib.Path("/tmp/sane_runs/ladder_results.json"))
    ap.add_argument("--ladder", type=pathlib.Path,
                    default=pathlib.Path("/tmp/ladder_runs/ladder_results.json"))
    args = ap.parse_args()

    lines = [
        "# PARITY — differential evidence vs the reference",
        "",
        "Three measured artifacts (commands in each section; all runnable on",
        "this host):",
        "",
        "1. **Differential baseline**: the reference's own torch train loop on",
        "   CPU vs this framework, same data / same initial weights / same",
        "   batch order (`tools/ref_baseline.py`).",
        "2. **Sane-regime ladder**: structured synthetic stream with real",
        "   pose↔factor mutual information, `x360` representation, where",
        "   conditioning and scrubbing are demonstrably live",
        "   (`tools/run_ladder.py --stream structured --config-dir configs/sane`).",
        "3. **Legacy r1 ladder** (midfwd, random-walk stream) for continuity.",
        "",
        "Known, intentional deviations are collected at the end.",
        "",
    ]

    if args.refbase.exists():
        lines += differential_section(args.refbase)

    if args.sane.exists():
        results = json.loads(args.sane.read_text())
        results = salvage_from_csv(results, args.sane.parent / "ladder")
        lines += ladder_table(
            results,
            "## 2. Sane-regime ladder (structured stream, x360, TPU)",
            [
                "Structured stream: gait amplitude and cadence driven by speed,",
                "per-id body scale/phase signatures, smooth heading random walk",
                "(`scrubvae_tpu/data/synthetic.py::structured_pose_stream`).",
                "`direction_process: x360` keeps absolute heading in the pose, so",
                "the heading conditional is informative. Success criteria",
                "(VERDICT r1 task 3): positive `r2_gen_restrict_heading` once",
                "heading is scrubbed from z (decoder must obey the conditional),",
                "monotone vanilla→scrubbed decodability drop, non-nan",
                "`acc_ids_qda_*`.",
            ],
        )
        lines.append("")

    if args.ladder.exists():
        results = json.loads(args.ladder.read_text())
        lines += ladder_table(
            results,
            "## 3. Legacy r1 ladder (random-walk stream, midfwd, TPU)",
            [
                "Kept for continuity with round 1; §1 shows the reference",
                "produces the same metric regime on this kind of data.",
            ],
        )
        lines.append("")

    lines += [
        "## Documented deviations",
        "",
        "- **bf16-stored Adam moments with stochastic rounding** (default;",
        "  `train.moment_dtype: f32` opts out). The differential runs in §1",
        "  use f32 moments to isolate model/loss semantics.",
        "- **Fused Pallas AdamW** (default for adam/adamw on TPU;",
        "  `train.fused_optimizer: false` opts out): same torch-AdamW formula,",
        "  moment EMA + bias correction + decoupled decay + weight write in one",
        "  read-modify-write pass per leaf (`ops/fused_adamw.py`); contract",
        "  tests pin it to the optax chain (tests/test_fused_optim.py).",
        "- **QDA decodability fallback**: when posterior-collapsed latent dims",
        "  make a class covariance singular, `qda_rand_cv` retries with",
        "  `reg_param=1e-3` (modern sklearn raises where the reference's era",
        "  warned); fold-failure counts are reported as `*_nanfolds`.",
        "- **QDA likelihood via `slogdet` + f32 solve** stays finite where the",
        "  reference's `torch.logdet` NaNs on numerically singular streaming",
        "  covariances (§1 cfg5).",
        "- **`adversarial_net` inner fit** is config-gated (`disentangle.",
        "  adv_fit`); the reference's fit is dead code (`mode == \"Train\"` vs",
        "  `\"train\"`, trainer.py:133) so §1 compares with the fit disabled,",
        "  while the live default here trains the discriminator as intended.",
        "- **`fluorescence` is stored `(N, 1)` float32** (reference keeps it",
        "  1-D `(N,)`); squeeze at export boundaries when comparing artifacts.",
        "- **GR ensemble loss** is summed then divided once; the reference",
        "  divides inside the accumulation loop, geometrically down-weighting",
        "  earlier ensemble members (losses.py:279-284) - documented, tested",
        "  difference.",
        "",
    ]

    out = HERE / "PARITY.md"
    out.write_text("\n".join(lines))
    print(f"wrote {out} ({len(lines)} lines)")


if __name__ == "__main__":
    main()

"""One-shot assembly of the round-5 quality-A/B artifact set.

Collects whatever arms completed across the four concurrent harness
roots (/tmp/quality_ab{,2,3,4} — run in parallel because a flagship arm
is tunnel-RTT-bound, not chip-bound, so four arms share the chip at
~40% utilization each losing little wall), then writes the combined
artifacts exactly as tools/quality_ab.py main() would have: per-arm
CSVs, summary.json (n=3 seed floors + per-deviation verdicts), and
tail_stats.json (epochs 251-300 envelope per arm).
"""

import csv
import json
import pathlib
import sys

HERE = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(HERE))
sys.path.insert(0, str(HERE / "tools"))

from quality_ab import (  # noqa: E402
    ARMS,
    read_metrics,
    summarize,
    tail_stats,
    print_report,
)

ROOTS = [pathlib.Path(f"/tmp/quality_ab{s}") for s in ("", "2", "3", "4")]
EPOCHS = 300


def complete(run_dir: pathlib.Path) -> bool:
    try:
        rows = list(csv.DictReader(open(run_dir / "metrics.csv")))
        return len(rows) >= EPOCHS - 1 and int(rows[-1]["epoch"]) >= EPOCHS - 1
    except (OSError, KeyError, ValueError):
        return False


def main():
    art = HERE / "artifacts" / "quality_ab"
    runs, srcs = {}, {}
    for root in ROOTS:
        for d in sorted((root / "quality_ab").glob("*")):
            arm = d.name
            if arm in runs or arm not in ARMS or not complete(d):
                continue
            runs[arm] = read_metrics(d)
            srcs[arm] = d
    print("complete arms:", sorted(runs))
    for arm, d in srcs.items():
        (art / f"{arm}.csv").write_text((d / "metrics.csv").read_text())

    summary = summarize(runs, tail=50)
    payload = {
        "arms": {a: ARMS[a] for a in runs},
        "epochs": EPOCHS,
        "frames": 24000,
        "batch": 256,
        "smoke": False,
        "tail_window": 50,
        **summary,
    }
    (art / "summary.json").write_text(json.dumps(payload, indent=1))
    (art / "tail_stats.json").write_text(
        json.dumps(tail_stats(runs, 251, 300), indent=1)
    )
    print_report(summary)


if __name__ == "__main__":
    main()

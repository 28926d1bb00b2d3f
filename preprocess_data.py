"""Preprocess raw pose recordings into per-split h5 files.

Counterpart of the reference's offline preprocessing
(data/dataset.py:313-454 + the per-key h5 layout read by get/data.py:32-44).
The TPU pipeline normally skips this entirely (frame store + on-device
window assembly), but the materialized layout remains supported for
interchange with reference-produced data.

Usage:
  python preprocess_data.py --data_path DATA --dataset 4_mice \
      --splits train val test --window 51 --stride 2 \
      --direction_process midfwd
"""

import argparse
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--splits", nargs="+", default=["train", "val", "test"])
    ap.add_argument("--window", type=int, default=51)
    ap.add_argument("--stride", type=int, default=2)
    ap.add_argument("--direction_process", default="midfwd")
    ap.add_argument("--speed_threshold", type=float, default=2.25)
    ap.add_argument(
        "--keys",
        nargs="+",
        default=[
            "x6d", "root", "offsets", "target_pose",
            "avg_speed_3d", "heading", "ids",
        ],
    )
    ap.add_argument(
        "--exact-offsets", action="store_true",
        help="un-truncated scaled offsets (deviation; reference int-truncates"
        " via its integer skeleton yaml — PARITY.md)",
    )
    ap.add_argument(
        "--part-centered-speed", action="store_true",
        help="true part-root speed centering (deviation; reference's"
        " centering is a no-op — PARITY.md)",
    )
    args = ap.parse_args()

    from scrubvae_tpu.data.pipeline import build_frame_store, materialize
    from scrubvae_tpu.data.pose_io import read_pose_h5, save_split
    from scrubvae_tpu.data.skeleton import load_skeleton

    root = Path(args.data_path)
    skeleton = load_skeleton(root / "mouse_skeleton.yaml")

    for split in args.splits:
        split_dir = root / args.dataset / split
        pose_file = split_dir / "pose.h5"
        if not pose_file.exists():
            pose_file = root / args.dataset / "pose.h5"
            if not pose_file.exists():
                print(f"[{split}] no pose.h5 found, skipping")
                continue
        pose, ids = read_pose_h5(pose_file)
        # Identity speed normalization: the reference's preprocessed files
        # carry RAW avg_speed_3d - the hardcoded mean/std is applied by the
        # LOADER (reference get/data.py:57-66, factory.mouse_data), so
        # exporting normalized values would double-normalize on read.
        raw_norm = {
            "avg_speed_3d": {
                "mean": np.zeros(3, np.float32),
                "std": np.ones(3, np.float32),
            }
        }
        store = build_frame_store(
            pose,
            ids,
            skeleton,
            window=args.window,
            stride=args.stride,
            speed_threshold=args.speed_threshold,
            norm_params=raw_norm,
            exact_offsets=args.exact_offsets,
            part_centered_speed=args.part_centered_speed,
        )
        data = materialize(
            store, skeleton.tree, tuple(args.keys), args.direction_process
        )
        save_split(split_dir, data, args.direction_process)
        print(f"[{split}] wrote {len(next(iter(data.values())))} windows "
              f"({', '.join(data)}) to {split_dir}")


if __name__ == "__main__":
    main()

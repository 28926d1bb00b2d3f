"""Materialize a synthetic pose dataset in the on-disk layout the factory
reads ({data_path}/{dataset}/{split}/pose.h5 + {data_path}/mouse_skeleton.yaml).

Usage: python tools/make_synthetic_data.py [--out /tmp/scrubvae_data]
       [--frames 4096] [--ids 4]
"""

import argparse
import pathlib
import shutil
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scrubvae_data")
    ap.add_argument("--frames", type=int, default=4096)
    ap.add_argument("--ids", type=int, default=4)
    args = ap.parse_args()

    from scrubvae_tpu.data.pose_io import write_pose_h5
    from scrubvae_tpu.data.skeleton import load_skeleton
    from scrubvae_tpu.data.synthetic import synthetic_pose_stream

    here = pathlib.Path(__file__).parent.parent
    out = pathlib.Path(args.out)
    skel = load_skeleton(here / "configs" / "mouse_skeleton.yaml")
    out.mkdir(parents=True, exist_ok=True)
    shutil.copy(here / "configs" / "mouse_skeleton.yaml", out / "mouse_skeleton.yaml")
    for split, seed, n in [
        ("train", 0, args.frames),
        ("val", 1, max(args.frames // 4, 256)),
        ("test", 2, max(args.frames // 4, 256)),
    ]:
        d = out / "synthetic" / split
        d.mkdir(parents=True, exist_ok=True)
        pose, ids = synthetic_pose_stream(skel, n_frames=n, n_ids=args.ids, seed=seed)
        write_pose_h5(d / "pose.h5", pose, ids)
        print(f"wrote {d/'pose.h5'}: {pose.shape} frames, {args.ids} ids")


if __name__ == "__main__":
    main()

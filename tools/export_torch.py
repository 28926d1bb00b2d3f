"""Export a trained run's weights as a reference-layout torch ``.pth``.

Usage:
  python tools/export_torch.py --run /runs/proj/name --epoch 100 \
      [--out /runs/proj/name/weights/epoch_100.pth]

Reads ``weights/epoch_E.msgpack`` from the run directory (no model rebuild
needed — msgpack_restore recovers the raw tree) and writes the state_dict the
reference codebase loads with ``strict=False``
(/root/reference/src/scrubvae/get/model.py:141-149), so runs trained in this
framework plug into the reference's eval/plot tooling.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--epoch", type=int, required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import flax.serialization

    from scrubvae_tpu.utils.torch_export import export_torch_weights

    run = pathlib.Path(args.run)
    src = run / "weights" / f"epoch_{args.epoch}.msgpack"
    if not src.exists():
        sys.exit(f"no checkpoint at {src}")
    variables = flax.serialization.msgpack_restore(src.read_bytes())
    out = pathlib.Path(
        args.out or run / "weights" / f"epoch_{args.epoch}.pth"
    )
    unexported = export_torch_weights(variables, out)
    print(f"wrote {out} ({len(unexported)} flax-only leaves skipped)")


if __name__ == "__main__":
    main()

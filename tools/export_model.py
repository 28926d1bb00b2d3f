"""Export a trained run's encoder/decoder as StableHLO serving artifacts.

Usage:
  python tools/export_model.py --run /runs/proj/name [--epoch 100] \
      [--out /runs/proj/name/export]

Writes ``encoder.shlo`` / ``decoder.shlo`` (jax.export serialization,
batch-polymorphic) plus a tiny ``meta.json`` describing the input keys.
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from scrubvae_tpu import factory
    from scrubvae_tpu.params import read
    from scrubvae_tpu.train.trainer import Trainer
    from scrubvae_tpu.utils import checkpoint as ckpt
    from scrubvae_tpu.utils.export import export_decoder, export_encoder

    run = pathlib.Path(args.run)
    cfg = read.config(run / "model_config.yaml", make_dirs=False)
    cfg["out_path"] = str(run) + "/"
    datasets, model, info = factory.data_and_model(
        cfg, train_val_test=("train",),
        data_keys=("x6d", "root", "offsets", "target_pose",
                   "avg_speed_3d", "heading"),
    )
    tr = Trainer(cfg, datasets, model, info)
    epoch = args.epoch or max(
        int(p.stem.split("_")[1]) for p in (run / "weights").glob("epoch_*")
    )
    params, bs = ckpt.load_weights(
        str(run) + "/", epoch, tr.state.params, tr.state.batch_stats
    )
    variables = {"params": params}
    if bs is not None:
        variables["batch_stats"] = bs

    batch = datasets["train"].batch(jnp.arange(2))
    out_dir = pathlib.Path(args.out or run / "export")
    out_dir.mkdir(parents=True, exist_ok=True)
    export_encoder(model, variables, batch, out_dir / "encoder.shlo")
    export_encoder(
        model, variables, batch, out_dir / "encoder_mu.shlo", mu_only=True
    )
    cond = tuple(info.get("conditional_keys") or ())
    export_decoder(
        model, variables, batch, info["z_dim"], cond, out_dir / "decoder.shlo"
    )
    enc_keys = [k for k in ("x6d", "root", "x6d_enc", "root_enc") if k in batch]
    (out_dir / "meta.json").write_text(json.dumps({
        "epoch": epoch, "z_dim": info["z_dim"],
        "encoder_inputs": enc_keys, "decoder_conditionals": list(cond),
        # per-input trailing shapes (batch dim symbolic in the artifacts)
        "input_shapes": {k: list(batch[k].shape[1:]) for k in enc_keys},
        "conditional_shapes": {k: list(batch[k].shape[1:]) for k in cond},
    }, indent=1))
    print(f"exported epoch {epoch} -> {out_dir}")


if __name__ == "__main__":
    main()

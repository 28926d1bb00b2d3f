"""SC-VAE training entry point.

CLI parity with the reference train_model.py: --out_path/-o, --project/-p,
--name/-n, --job_id (SLURM-style array indexing into sorted run folders);
reads {out_path}/{project}/{name}/model_config.yaml, trains, logs metrics
(CSV always, wandb when --wandb and the package is available).
"""

import argparse
from pathlib import Path


def main():
    parser = argparse.ArgumentParser(
        prog="SC-VAE-TPU Train", description="Train SC-VAE models on TPU"
    )
    parser.add_argument("--out_path", "-o", type=str, dest="out_path")
    parser.add_argument("--job_id", type=int, dest="job_id", default=None)
    parser.add_argument("--project", "-p", type=str, dest="project")
    parser.add_argument("--name", "-n", type=str, dest="name", default=None)
    parser.add_argument("--wandb", action="store_true", dest="use_wandb")
    args = parser.parse_args()

    if args.job_id is not None:
        z_path = Path(args.out_path) / args.project
        folders = sorted(str(f.parts[-1]) for f in z_path.iterdir() if f.is_dir())
        name = folders[args.job_id]
    else:
        name = args.name

    from scrubvae_tpu.params import read

    config = read.config(Path(args.out_path) / args.project / name / "model_config.yaml")

    run = None
    if args.use_wandb:
        try:
            import wandb

            wandb.login()
            run = wandb.init(project=args.project, name=name, config=config)
        except Exception as e:  # hermetic environments have no wandb/network
            print(f"wandb unavailable ({e}); falling back to CSV metrics")

    from scrubvae_tpu.train.trainer import train

    train(config, run=run)

    if run is not None:
        run.finish()


if __name__ == "__main__":
    main()

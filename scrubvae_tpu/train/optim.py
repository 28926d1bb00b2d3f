"""Optimizers and schedules via optax.

Parity with the reference trainer's optimizer factory
(/root/reference/src/scrubvae/train/trainer.py:26-89): adam / adamw /
sgd(momentum .2, nesterov), cosine-annealing-with-warm-restarts stepped at
per-batch fractional-epoch granularity, and cyclical beta annealing for the
KL weight.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "cyclical_beta",
    "make_lr_schedule",
    "make_optimizer",
    "scale_by_adam_lowp",
]


def scale_by_adam_lowp(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype=jnp.bfloat16,
    nu_dtype=jnp.bfloat16,
) -> optax.GradientTransformation:
    """Adam scaling with reduced-precision moment storage.

    Both EMAs are *accumulated* in float32 and *stored* in ``mu_dtype`` /
    ``nu_dtype``. bf16's ~3 significant digits are ample for smoothing
    EMAs, and the storage dtype sets the HBM bill: the AdamW update of the
    fc_sigma head (a 4096x8256 matrix, ~70% of flagship params) is the
    hottest single op of the train step and is pure bandwidth — f32 mu+nu
    cost ~540MB of read+write there, bf16 halves it.
    """

    def init_fn(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(lambda p: jnp.zeros_like(p, dtype=mu_dtype), params),
            nu=jax.tree.map(lambda p: jnp.zeros_like(p, dtype=nu_dtype), params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree.map(
            lambda g, m: (b1 * m.astype(jnp.float32) + (1.0 - b1) * g).astype(
                mu_dtype
            ),
            updates,
            state.mu,
        )
        nu = jax.tree.map(
            lambda g, v: (
                b2 * v.astype(jnp.float32) + (1.0 - b2) * (g * g)
            ).astype(nu_dtype),
            updates,
            state.nu,
        )
        b1c = 1.0 - b1 ** count.astype(jnp.float32)
        b2c = 1.0 - b2 ** count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, v: (m.astype(jnp.float32) / b1c)
            / (jnp.sqrt(v.astype(jnp.float32) / b2c) + eps),
            mu,
            nu,
        )
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def cyclical_beta(
    epoch: int, beta_max: float = 1.0, len_cycle: int = 100, R: float = 0.5
) -> float:
    """Cyclical beta annealing (reference CyclicalBetaAnnealing,
    trainer.py:26-40)."""
    len_increasing = int(len_cycle * R)
    remainder = (epoch - 1) % len_cycle
    if remainder >= len_increasing:
        return float(beta_max)
    return float(beta_max) * remainder / len_increasing


def make_lr_schedule(
    lr: float, schedule: Optional[str], steps_per_epoch: int, T_0: int = 50
):
    """LR as a function of the global step. 'cawr' = cosine annealing with
    warm restarts, T_0 epochs per cycle, evaluated at fractional epochs like
    the reference's per-batch scheduler.step(epoch + i/len) (trainer.py:167).
    """
    if schedule is None:
        return lr
    if schedule == "cawr":

        def sched(step):
            e = step / steps_per_epoch
            t_cur = jnp.mod(e, T_0)
            return lr * 0.5 * (1.0 + jnp.cos(jnp.pi * t_cur / T_0))

        return sched
    raise ValueError(f"unknown lr_schedule {schedule!r}")


def make_optimizer(
    train_config: dict, steps_per_epoch: int, clip_norm: float = 1e6
) -> optax.GradientTransformation:
    lr = make_lr_schedule(
        float(train_config.get("lr") or 1e-4),
        train_config.get("lr_schedule"),
        steps_per_epoch,
    )
    name = train_config.get("optimizer") or "adam"
    # Moments stored in bf16 (accumulated in f32): Adam's mu/nu are
    # smoothing EMAs, bf16 is ample; it halves optimizer HBM traffic (the
    # AdamW update on the fc_sigma matrix is the single hottest op of the
    # flagship step - see tools/parse_trace.py). Opt out with
    # train.moment_dtype: f32.
    lowp = (train_config.get("moment_dtype") or "bf16") == "bf16"
    m_dtype = jnp.bfloat16 if lowp else jnp.float32
    if name in ("adam", "adamw"):
        parts = [scale_by_adam_lowp(mu_dtype=m_dtype, nu_dtype=m_dtype)]
        if name == "adamw":
            # torch.optim.AdamW default weight_decay (reference
            # trainer.py:65 uses torch defaults)
            parts.append(optax.add_decayed_weights(0.01))
        parts.append(optax.scale_by_learning_rate(lr))
        opt = optax.chain(*parts)
    elif name == "sgd":
        opt = optax.sgd(lr, momentum=0.2, nesterov=True)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    # Reference clips at max_norm=1e6 (trainer.py:164) - effectively a
    # NaN/blowup tripwire; kept for parity by default. Computing the global
    # norm re-reads every gradient (~0.3ms/step on the flagship), so
    # train.clip_norm: null disables it.
    # train.clip_norm: 0 disables; None/absent keeps the parity default.
    cn = train_config.get("clip_norm")
    if cn is not None:
        if float(cn) <= 0:
            return opt
        clip_norm = float(cn)
    return optax.chain(optax.clip_by_global_norm(clip_norm), opt)

"""Optimizers and schedules via optax.

Parity with the reference trainer's optimizer factory
(/root/reference/src/scrubvae/train/trainer.py:26-89): adam / adamw /
sgd(momentum .2, nesterov), cosine-annealing-with-warm-restarts stepped at
per-batch fractional-epoch granularity, and cyclical beta annealing for the
KL weight.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "cyclical_beta",
    "make_lr_schedule",
    "make_optimizer",
    "scale_by_adam_lowp",
    "FusedAdamW",
    "ScaleByAdamLowpState",
]


class ScaleByAdamLowpState(NamedTuple):
    count: jnp.ndarray
    mu: dict
    nu: dict
    key: jnp.ndarray  # rng for stochastic rounding of the moment stores


def _stochastic_round_bf16(x: jnp.ndarray, key: jnp.ndarray) -> jnp.ndarray:
    """f32 -> bf16 with stochastic rounding: add uniform noise over the 16
    truncated mantissa bits, then truncate. Unbiased in expectation, so EMA
    increments far below bf16's ~0.4% ulp still accumulate over steps
    (round-to-nearest would absorb them and stall the moment)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    noise = jax.random.randint(
        key, x.shape, 0, jnp.uint32(1 << 16), dtype=jnp.uint32
    )
    rounded = (bits + noise) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(jnp.bfloat16)


def _store(x: jnp.ndarray, dtype, key) -> jnp.ndarray:
    if dtype == jnp.bfloat16:
        return _stochastic_round_bf16(x, key)
    return x.astype(dtype)


def scale_by_adam_lowp(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype=jnp.bfloat16,
    nu_dtype=jnp.bfloat16,
    seed: int = 17,
    lowp_min_elems: int = 0,
) -> optax.GradientTransformation:
    """Adam scaling with reduced-precision, stochastically-rounded moment
    storage.

    Both EMAs are *accumulated* in float32 and *stored* in ``mu_dtype`` /
    ``nu_dtype``; bf16 stores use stochastic rounding so the per-step EMA
    increment ((1-b2)=1e-3 relative for nu, below bf16's ~4e-3 ulp) is
    preserved in expectation instead of being absorbed by round-to-nearest
    (a quantization stall that would stop nu tracking slow gradient-scale
    drift). The storage dtype sets the HBM bill: the AdamW update of the
    fc_sigma head (a 4096x8256 matrix, ~70% of flagship params) is the
    hottest single op of the train step and is pure bandwidth — f32 mu+nu
    cost ~540MB of read+write there, bf16 halves it. Deviation from the
    reference's f32 torch Adam documented in PARITY.md; long-horizon drift
    regression in tests/test_train.py.

    ``lowp_min_elems``: leaves below this element count store f32 regardless
    of ``mu_dtype``/``nu_dtype`` — their HBM traffic is negligible while the
    threefry stochastic-rounding draw is pure overhead (~30% of the flagship
    step when applied to every leaf; bench A/B, r2). Defaults to 0 (apply the
    dtypes everywhere) so unit tests can exercise SR on tiny leaves;
    ``make_optimizer`` passes the production threshold.
    """

    def _dtype_for(p, want):
        if want == jnp.bfloat16 and p.size < lowp_min_elems:
            return jnp.float32
        return want

    def init_fn(params):
        return ScaleByAdamLowpState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(
                lambda p: jnp.zeros_like(p, dtype=_dtype_for(p, mu_dtype)),
                params,
            ),
            nu=jax.tree.map(
                lambda p: jnp.zeros_like(p, dtype=_dtype_for(p, nu_dtype)),
                params,
            ),
            key=jax.random.PRNGKey(seed),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        key, sub = jax.random.split(state.key)
        leaves, treedef = jax.tree.flatten(updates)
        subkeys = jax.random.split(sub, 2 * max(len(leaves), 1))
        mu_keys = jax.tree.unflatten(treedef, list(subkeys[: len(leaves)]))
        nu_keys = jax.tree.unflatten(treedef, list(subkeys[len(leaves) :]))
        mu = jax.tree.map(
            lambda g, m, k: _store(
                b1 * m.astype(jnp.float32) + (1.0 - b1) * g,
                _dtype_for(g, mu_dtype), k,
            ),
            updates,
            state.mu,
            mu_keys,
        )
        nu = jax.tree.map(
            lambda g, v, k: _store(
                b2 * v.astype(jnp.float32) + (1.0 - b2) * (g * g),
                _dtype_for(g, nu_dtype), k,
            ),
            updates,
            state.nu,
            nu_keys,
        )
        b1c = 1.0 - b1 ** count.astype(jnp.float32)
        b2c = 1.0 - b2 ** count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, v: (m.astype(jnp.float32) / b1c)
            / (jnp.sqrt(jnp.maximum(v.astype(jnp.float32), 0.0) / b2c) + eps),
            mu,
            nu,
        )
        return out, ScaleByAdamLowpState(count=count, mu=mu, nu=nu, key=key)

    return optax.GradientTransformation(init_fn, update_fn)


class FusedAdamW:
    """AdamW with the whole update as ONE Pallas read-modify-write pass per
    leaf (ops/fused_adamw.py): no separate threefry pass, no re-reads of
    intermediates between fusions, moment stores in bf16 with hardware-PRNG
    stochastic rounding, buffers updated in place.

    Same contract as the ``scale_by_adam_lowp`` optax chain (torch-AdamW
    semantics, reference trainer.py:54-89) but exposed as
    ``update_and_apply(grads, state, params) -> (new_params, new_state)`` so
    the weight write fuses into the kernel instead of a separate
    ``optax.apply_updates`` pass. Used automatically by the train step when
    present (train/step.py).

    Falls back to the pure-jnp same-formula path off-TPU, so CPU tests and
    the virtual-mesh dryrun run the identical contract.
    """

    # leaves smaller than this skip Pallas (launch bookkeeping exceeds the
    # bandwidth saved; PReLU slopes, BN scales, biases...). The SAME
    # threshold gates bf16 moment storage: below it the HBM saving is
    # negligible while the stochastic-rounding PRNG is pure overhead — on
    # the XLA fallback path a threefry draw per moment element per step
    # measured ~30% of the whole flagship train step (bench A/B, r2), so
    # small leaves keep f32 moments (exact, key-free) and only the large
    # leaves — which on TPU run through the Pallas kernel with its nearly
    # free hardware PRNG — store bf16.
    MIN_PALLAS_ELEMS = 1 << 16

    def __init__(
        self,
        lr,
        *,
        b1: float = 0.9,
        b2: float = 0.999,
        eps: float = 1e-8,
        weight_decay: float = 0.0,
        moment_dtype=jnp.bfloat16,
        clip_norm: Optional[float] = None,
        seed: int = 17,
        use_pallas: Optional[bool] = None,
    ):
        self.lr = lr
        self.b1, self.b2, self.eps = b1, b2, eps
        self.wd = weight_decay
        self.m_dtype = moment_dtype
        self.clip_norm = clip_norm
        self.seed = seed
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        # Bool pytree (params treedef) marking tensor-parallel-sharded
        # leaves (parallel/mesh.py tp_mask): those run the plain-XLA
        # elementwise update, which GSPMD partitions shard-locally; a
        # Pallas custom call on a sharded operand would force an
        # all-gather. Set by the Trainer when a model mesh axis is active.
        self.tp_mask = None

    def _leaf_lowp(self, p) -> bool:
        """Per-leaf moment storage: bf16 only where it pays (see
        MIN_PALLAS_ELEMS comment); backend-independent so checkpointed
        optimizer state has the same dtypes on CPU and TPU."""
        return self.m_dtype == jnp.bfloat16 and p.size >= self.MIN_PALLAS_ELEMS

    def _leaf_m_dtype(self, p):
        return jnp.bfloat16 if self._leaf_lowp(p) else jnp.float32

    def init(self, params) -> ScaleByAdamLowpState:
        return ScaleByAdamLowpState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(
                lambda p: jnp.zeros_like(p, dtype=self._leaf_m_dtype(p)), params
            ),
            nu=jax.tree.map(
                lambda p: jnp.zeros_like(p, dtype=self._leaf_m_dtype(p)), params
            ),
            key=jax.random.PRNGKey(self.seed),
        )

    def update_and_apply(self, grads, state: ScaleByAdamLowpState, params):
        from scrubvae_tpu.ops.fused_adamw import (
            fused_adamw_leaf,
            leaf_update_reference,
        )

        count = state.count + 1
        t = count.astype(jnp.float32)
        b1c = 1.0 - self.b1**t
        b2c = 1.0 - self.b2**t
        lr = self.lr(count - 1) if callable(self.lr) else jnp.float32(self.lr)
        if self.clip_norm and self.clip_norm > 0:
            gn = optax.global_norm(grads)
            gscale = jnp.minimum(1.0, self.clip_norm / jnp.maximum(gn, 1e-30))
        else:
            gscale = jnp.float32(1.0)
        g_leaves, treedef = jax.tree.flatten(grads)
        w_leaves = treedef.flatten_up_to(params)
        mu_leaves = treedef.flatten_up_to(state.mu)
        nu_leaves = treedef.flatten_up_to(state.nu)
        tp_leaves = (
            treedef.flatten_up_to(self.tp_mask)
            if self.tp_mask is not None
            else [False] * len(g_leaves)
        )

        key, sub = jax.random.split(state.key)
        # int32 per-leaf seed base for the hardware PRNG, fresh each step
        seed_base = jax.random.randint(
            sub, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        )
        leaf_keys = jax.random.split(sub, max(len(g_leaves), 1))

        new_w, new_mu, new_nu = [], [], []
        for i, (w, g, m, n) in enumerate(
            zip(w_leaves, g_leaves, mu_leaves, nu_leaves)
        ):
            lowp = self._leaf_lowp(w)
            if (
                self.use_pallas
                and not tp_leaves[i]
                and w.size >= self.MIN_PALLAS_ELEMS
                and w.dtype in (jnp.float32, jnp.bfloat16)
            ):
                nw, nm, nn = fused_adamw_leaf(
                    w, g, m, n,
                    lr=lr, b1c=b1c, b2c=b2c, gscale=gscale,
                    seed=seed_base + i,
                    b1=self.b1, b2=self.b2, eps=self.eps, wd=self.wd,
                    lowp=lowp,
                )
            else:
                need_key = lowp or w.dtype == jnp.bfloat16
                nw, nm, nn = leaf_update_reference(
                    w, g, m, n,
                    lr=lr, b1c=b1c, b2c=b2c, gscale=gscale,
                    key=leaf_keys[i] if need_key else None,
                    b1=self.b1, b2=self.b2, eps=self.eps, wd=self.wd,
                    lowp=lowp,
                )
            new_w.append(nw.astype(w.dtype))
            new_mu.append(nm)
            new_nu.append(nn)

        new_state = ScaleByAdamLowpState(
            count=count,
            mu=jax.tree.unflatten(treedef, new_mu),
            nu=jax.tree.unflatten(treedef, new_nu),
            key=key,
        )
        return jax.tree.unflatten(treedef, new_w), new_state


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


def _want_fused(train_config: dict) -> bool:
    """Fused Pallas AdamW is the default on TPU (train.fused_optimizer:
    false opts out); off-TPU the pure-jnp fallback runs the identical
    contract, so the flag only changes which backend executes the math."""
    v = train_config.get("fused_optimizer")
    return True if v is None else bool(v)


def make_optimizer(
    train_config: dict, steps_per_epoch: int, clip_norm: float = 1e6
):
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
    if name in ("adam", "adamw") and _want_fused(train_config):
        cn = train_config.get("clip_norm")
        if cn is None:
            cn = clip_norm  # parity default: the reference's 1e6 tripwire
        return FusedAdamW(
            lr,
            weight_decay=0.01 if name == "adamw" else 0.0,
            moment_dtype=m_dtype,
            clip_norm=float(cn) if cn and float(cn) > 0 else None,
        )
    if name in ("adam", "adamw"):
        parts = [scale_by_adam_lowp(
            mu_dtype=m_dtype, nu_dtype=m_dtype,
            lowp_min_elems=FusedAdamW.MIN_PALLAS_ELEMS,
        )]
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

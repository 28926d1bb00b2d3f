"""Disentanglement ("scrubber") modules with explicit functional state.

Semantics parity with /root/reference/src/scrubvae/model/disentangle.py, but
re-designed for JAX: the reference hides streaming statistics in nn.Module
buffers mutated mid-step; here every scrubber is a pytree state plus pure
``forward`` / ``loss`` / ``update`` functions threaded through the jitted
train step. Data-dependent forgetting-factor auto-tuning (reference Python
``if`` branches, disentangle.py:57-62, 215-223, 527-535) becomes ``jnp.where``
so the whole step stays a single compiled program. Under data-parallel pjit,
the batch moments (x^T x etc.) are computed on the *global* batch, so replica
state stays bitwise identical without any explicit collectives (SURVEY.md
section 5: the one genuinely distributed design problem).

Gradient-reversal and MLP-ensemble heads are flax modules whose params live
in the main parameter tree (single outer optimizer, as in the reference);
the adversarial discriminator keeps its own params + inner AdamW state.
"""

from __future__ import annotations

import itertools
from typing import Sequence

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array

from scrubvae_tpu.ops.smallsolve import spd_slogdet, spd_solve

__all__ = [
    "grad_reverse",
    "MLP",
    "MLPEnsemble",
    "LinearProjection",
    "GRScrubber",
    "polynomial_indices",
    "polynomial_expand",
    "MALSState",
    "mals_init",
    "mals_forward",
    "mals_loss",
    "mals_update",
    "RLSState",
    "rls_init",
    "rls_forward",
    "rls_update",
    "MAFilterState",
    "ma_init",
    "ma_loss",
    "ma_update",
    "QDAState",
    "qda_init",
    "qda_loss",
    "qda_update",
    "AdvNet",
    "adv_init",
    "adv_forward",
    "adv_shuffle",
    "adv_fit",
    "adv_generator_loss",
    "MIState",
    "mi_init",
    "mi_score",
]


# ---------------------------------------------------------------------------
# Gradient reversal
# ---------------------------------------------------------------------------


@jax.custom_vjp
def grad_reverse(x: Array, alpha: float) -> Array:
    return x


def _gr_fwd(x, alpha):
    return x, alpha


def _gr_bwd(alpha, g):
    return (-alpha * g, None)


grad_reverse.defvjp(_gr_fwd, _gr_bwd)


# ---------------------------------------------------------------------------
# MLP heads (reference disentangle.py:568-632)
# ---------------------------------------------------------------------------


class MLP(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, z: Array) -> Array:
        d = z.shape[-1]
        h = nn.relu(nn.Dense(d)(z))
        h = nn.relu(nn.Dense(d)(h))
        return nn.Dense(self.out_dim)(h)


class MLPEnsemble(nn.Module):
    """Four differently-shaped MLP heads; returns their list of outputs."""

    out_dim: int

    @nn.compact
    def __call__(self, z: Array) -> list:
        d = z.shape[-1]
        h1 = nn.relu(nn.Dense(d, name="mlp1_0")(z))
        h1 = nn.relu(nn.Dense(d, name="mlp1_1")(h1))
        a = nn.Dense(self.out_dim, name="mlp1_2")(h1)

        h2 = nn.relu(nn.Dense(d, name="mlp2_0")(z))
        b = nn.Dense(self.out_dim, name="mlp2_1")(h2)

        h3 = nn.relu(nn.Dense(d, name="mlp3_0")(z))
        h3 = nn.relu(nn.Dense(d // 2, name="mlp3_1")(h3))
        c = nn.Dense(self.out_dim, name="mlp3_2")(h3)

        h4 = nn.relu(nn.Dense(d * 2, name="mlp4_0")(z))
        h4 = nn.relu(nn.Dense(d * 2, name="mlp4_1")(h4))
        e = nn.Dense(self.out_dim, name="mlp4_2")(h4)
        return [a, b, c, e]


class LinearProjection(nn.Module):
    """Trainable linear decoder z -> v plus null-space projection of z onto
    the decoder's kernel (reference disentangle.py:717-734)."""

    out_dim: int

    @nn.compact
    def __call__(self, z: Array) -> dict:
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.out_dim, z.shape[-1])
        )
        v = z @ w.T
        nrm = w @ w.T
        # (out_dim, out_dim) SPD system: unrolled solve (a jnp.linalg.solve
        # here is a sequential LU while-loop costing ~2 ms/step on TPU)
        z_null = z - spd_solve(nrm, v.T).T @ w
        return {"v": v, "z_null": z_null}


class GRScrubber(nn.Module):
    """Gradient reversal -> MLP ensemble (reference disentangle.py:635-660)."""

    out_dim: int
    alpha: float = 1.0

    @nn.compact
    def __call__(self, z: Array) -> list:
        return MLPEnsemble(self.out_dim, name="ensemble")(grad_reverse(z, self.alpha))


# ---------------------------------------------------------------------------
# Polynomial feature expansion (reference disentangle.py:438-464)
# ---------------------------------------------------------------------------


def polynomial_indices(nx: int, order: int):
    """Static index combinations (with replacement) per degree 2..order."""
    combos = []
    for deg in range(2, order + 1):
        idx = np.asarray(
            list(itertools.combinations_with_replacement(range(nx), deg)),
            dtype=np.int32,
        )
        combos.append(idx)
    return combos


def polynomial_expand(x: Array, order: int, combos=None) -> Array:
    if order <= 1:
        return x
    if combos is None:
        combos = polynomial_indices(x.shape[-1], order)
    n_features = x.shape[-1]
    feats = [x]
    for idx in combos:
        terms = jnp.prod(x[:, idx], axis=-1) / idx.shape[0] * n_features
        feats.append(terms)
    return jnp.concatenate(feats, axis=-1)


def poly_dim(nx: int, order: int) -> int:
    total = 0
    for deg in range(1, order + 1):
        total += int(
            np.prod(np.arange(nx, nx + deg)) // np.prod(np.arange(1, deg + 1))
        )
    return total


# ---------------------------------------------------------------------------
# Moving-average least squares (reference disentangle.py:393-538)
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class MALSState:
    Sxx0: Array
    Sxy0: Array
    Sxx1: Array
    Sxy1: Array
    lam0: Array
    lam1: Array
    bias: bool = flax.struct.field(pytree_node=False, default=False)
    polynomial_order: int = flax.struct.field(pytree_node=False, default=1)
    l2_reg: float = flax.struct.field(pytree_node=False, default=0.0)
    lamdiff: float = flax.struct.field(pytree_node=False, default=1e-1)
    delta: float = flax.struct.field(pytree_node=False, default=1e-4)


def mals_init(
    nx: int,
    ny: int,
    lamdiff: float = 1e-1,
    delta: float = 1e-4,
    bias: bool = False,
    polynomial_order: int = 1,
    l2_reg: float = 0.0,
) -> MALSState:
    n = poly_dim(nx, polynomial_order) + int(bias)
    return MALSState(
        Sxx0=jnp.eye(n),
        Sxy0=jnp.zeros((n, ny)),
        Sxx1=jnp.eye(n),
        Sxy1=jnp.zeros((n, ny)),
        lam0=jnp.asarray(0.9),
        lam1=jnp.asarray(0.9 + lamdiff),
        bias=bias,
        polynomial_order=polynomial_order,
        l2_reg=float(l2_reg or 0.0),
        lamdiff=lamdiff,
        delta=delta,
    )


def _mals_features(state: MALSState, x: Array) -> Array:
    x = polynomial_expand(x, state.polynomial_order)
    if state.bias:
        x = jnp.concatenate([x, jnp.ones((x.shape[0], 1), dtype=x.dtype)], axis=-1)
    return x


def mals_forward(state: MALSState, x: Array):
    """Solve the two normal-equation decoders and predict y."""
    x = _mals_features(state, x)
    l2 = jnp.full((x.shape[1],), state.l2_reg, dtype=x.dtype)
    if state.bias:
        l2 = l2.at[-1].set(0.0)
    ar = jnp.arange(x.shape[1])
    A0 = state.Sxx0.at[ar, ar].add(l2)
    A1 = state.Sxx1.at[ar, ar].add(l2)
    W0 = spd_solve(A0, state.Sxy0)
    W1 = spd_solve(A1, state.Sxy1)
    return x @ W0, x @ W1


def mals_loss(state: MALSState, yhat0: Array, yhat1: Array, y: Array):
    """Sum-MSE of the two decoders; auto-tunes the forgetting factors
    (reference evaluate_loss, disentangle.py:505-538). Returns (loss,
    new_state)."""
    l0 = jnp.sum((y - yhat0) ** 2)
    l1 = jnp.sum((y - yhat1) ** 2)
    better0 = l0 < l1
    lam0 = jnp.where(
        better0,
        jnp.clip(state.lam0 - state.delta, 0.0, 1.0),
        jnp.clip(state.lam1 + state.delta, 0.0, 1.0) - state.lamdiff,
    )
    lam1 = jnp.where(
        better0,
        jnp.clip(state.lam0 - state.delta, 0.0, 1.0) + state.lamdiff,
        jnp.clip(state.lam1 + state.delta, 0.0, 1.0),
    )
    new_state = state.replace(lam0=lam0, lam1=lam1)
    return 0.5 * (l0 + l1), new_state


def mals_update(state: MALSState, x: Array, y: Array) -> MALSState:
    """EMA-accumulate the normal equations with the current batch. Under
    data-parallel pjit, x/y are globally sharded so xx/xy are global sums."""
    x = _mals_features(state, jax.lax.stop_gradient(x))
    y = jax.lax.stop_gradient(y)
    xx = x.T @ x
    xy = x.T @ y
    return state.replace(
        Sxx0=state.lam0 * state.Sxx0 + xx,
        Sxy0=state.lam0 * state.Sxy0 + xy,
        Sxx1=state.lam1 * state.Sxx1 + xx,
        Sxy1=state.lam1 * state.Sxy1 + xy,
    )


# ---------------------------------------------------------------------------
# Recursive least squares (reference disentangle.py:320-390)
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class RLSState:
    theta: Array
    P: Array
    lam: Array
    bias: bool = flax.struct.field(pytree_node=False, default=False)
    polynomial_order: int = flax.struct.field(pytree_node=False, default=1)


def rls_init(nx: int, ny: int, bias: bool = False, polynomial_order: int = 1):
    n = poly_dim(nx, polynomial_order) + int(bias)
    return RLSState(
        theta=jnp.zeros((n, ny)),
        P=jnp.eye(n),
        lam=jnp.asarray(0.9),
        bias=bias,
        polynomial_order=polynomial_order,
    )


def _rls_features(state, x):
    x = polynomial_expand(x, state.polynomial_order)
    if state.bias:
        x = jnp.concatenate([x, jnp.ones((x.shape[0], 1), dtype=x.dtype)], axis=-1)
    return x


def rls_forward(state: RLSState, x: Array) -> Array:
    return _rls_features(state, x) @ state.theta


def rls_update(state: RLSState, x: Array, y: Array) -> RLSState:
    x = _rls_features(state, jax.lax.stop_gradient(x))
    y = jax.lax.stop_gradient(y)
    A = x @ state.P @ x.T
    ar = jnp.arange(A.shape[0])
    A = A.at[ar, ar].add(state.lam)
    P = state.P - state.P @ x.T @ jnp.linalg.solve(A, x @ state.P)
    P = P / state.lam
    theta = state.theta + P @ x.T @ (y - x @ state.theta)
    return state.replace(P=P, theta=theta)


# ---------------------------------------------------------------------------
# Moving-average per-class mean filter (reference disentangle.py:9-87)
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class MAFilterState:
    classes: Array  # (C,) class label values
    m1: Array  # (C, nx)
    m2: Array
    lam1: Array  # (C,)
    lam2: Array
    lamdiff: float = flax.struct.field(pytree_node=False, default=1e-2)
    delta: float = flax.struct.field(pytree_node=False, default=1e-3)


def ma_init(nx: int, classes, lamdiff: float = 1e-2, delta: float = 1e-3):
    classes = jnp.asarray(classes)
    C = classes.shape[0]
    return MAFilterState(
        classes=classes,
        m1=jnp.zeros((C, nx)),
        m2=jnp.zeros((C, nx)),
        lam1=jnp.full((C,), 0.5),
        lam2=jnp.full((C,), 0.5 + lamdiff),
        lamdiff=lamdiff,
        delta=delta,
    )


def _class_means(x: Array, y: Array, classes: Array) -> Array:
    """Per-class masked batch means, (C, nx). Empty classes yield zeros."""
    mask = (y.reshape(1, -1) == classes.reshape(-1, 1)).astype(x.dtype)  # (C, B)
    counts = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    return (mask @ x) / counts


def ma_loss(state: MAFilterState, x: Array, y: Array):
    """Pairwise distance between EMA-estimated class means; tunes lams.
    Returns (loss, new_state) - reference evaluate_loss mutates lams only
    (disentangle.py:34-74)."""
    xbar = _class_means(x, y, state.classes)
    d1 = jnp.linalg.norm(xbar - jax.lax.stop_gradient(state.m1), axis=-1)
    d2 = jnp.linalg.norm(xbar - jax.lax.stop_gradient(state.m2), axis=-1)
    closer1 = d1 < d2
    lam1 = jnp.where(
        closer1,
        jnp.clip(state.lam1 - state.delta, 0.0, 1.0),
        jnp.clip(state.lam2 + state.delta, 0.0, 1.0) - state.lamdiff,
    )
    lam2 = jnp.where(
        closer1,
        jnp.clip(state.lam1 - state.delta, 0.0, 1.0) + state.lamdiff,
        jnp.clip(state.lam2 + state.delta, 0.0, 1.0),
    )
    m1 = (1 - lam1[:, None]) * xbar + lam1[:, None] * jax.lax.stop_gradient(state.m1)
    m2 = (1 - lam2[:, None]) * xbar + lam2[:, None] * jax.lax.stop_gradient(state.m2)
    mean_est = 0.5 * (m1 + m2)
    diff = mean_est.T[..., None] - mean_est.T[..., None, :]
    triu = jnp.triu(diff, k=1)
    # smooth norm: jnp.linalg.norm's gradient is nan at exactly-coincident
    # class means (always the case for a single-class feature, and at the
    # zero-initialized means on step one)
    loss = jnp.sqrt(jnp.sum(triu * triu) + 1e-12)
    return loss, state.replace(lam1=lam1, lam2=lam2)


def ma_update(state: MAFilterState, x: Array, y: Array) -> MAFilterState:
    xbar = _class_means(jax.lax.stop_gradient(x), y, state.classes)
    m1 = (1 - state.lam1[:, None]) * xbar + state.lam1[:, None] * state.m1
    m2 = (1 - state.lam2[:, None]) * xbar + state.lam2[:, None] * state.m2
    return state.replace(m1=m1, m2=m2)


# ---------------------------------------------------------------------------
# Quadratic discriminant filter (reference disentangle.py:90-232)
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class QDAState:
    classes: Array
    m0a: Array
    m1a: Array
    m0b: Array
    m1b: Array
    S0a: Array
    S1a: Array
    S0b: Array
    S1b: Array
    lama: Array
    lamb: Array
    lamdiff: float = flax.struct.field(pytree_node=False, default=1e-2)
    delta: float = flax.struct.field(pytree_node=False, default=1e-3)


def qda_init(nx: int, classes, lamdiff: float = 1e-2, delta: float = 1e-3):
    classes = jnp.asarray(classes)
    C = classes.shape[0]
    # Distinct buffers per field: sharing one array across fields breaks
    # buffer donation in the jitted step (same buffer donated twice).
    eye = lambda: jnp.tile(jnp.eye(nx), (C, 1, 1))
    zeros = lambda: jnp.zeros((C, nx))
    return QDAState(
        classes=classes,
        m0a=zeros(),
        m1a=zeros(),
        m0b=zeros(),
        m1b=zeros(),
        S0a=eye(),
        S1a=eye(),
        S0b=eye(),
        S1b=eye(),
        lama=jnp.full((C,), 0.2),
        lamb=jnp.full((C,), 0.2 + lamdiff),
        lamdiff=lamdiff,
        delta=delta,
    )


def _cgll(x: Array, m: Array, S: Array) -> Array:
    """Gaussian log-likelihood up to constants (disentangle.py:129-134),
    vectorized over classes: x (B,D), m (C,D), S (C,D,D) -> (C,B)."""
    diff = x[None, :, :] - m[:, None, :]  # (C, B, D)
    sol = spd_solve(S, jnp.swapaxes(diff, -1, -2))  # (C, D, B)
    resids = jnp.einsum("cbd,cdb->cb", diff, sol)
    logdet = spd_slogdet(S)
    return -0.5 * (logdet[:, None] + resids)


def _masked_moments(x: Array, mask: Array):
    """Masked mean and covariance (correction=0) over the batch."""
    cnt = jnp.maximum(mask.sum(), 1.0)
    mean = (mask[:, None] * x).sum(axis=0) / cnt
    centered = (x - mean) * mask[:, None]
    cov = centered.T @ centered / cnt
    return mean, cov


def qda_loss(state: QDAState, x: Array, y: Array, update: bool = True):
    """Label-weighted log-likelihood-ratio of the two streaming QDA
    classifiers (disentangle.py:165-232). Returns (loss, new_state)."""
    y = y.reshape(-1)
    i1 = (y[None, :] == state.classes[:, None]).astype(x.dtype)  # (C, B)
    i0 = 1.0 - i1

    sg = jax.lax.stop_gradient
    lla0 = _cgll(x, sg(state.m0a), sg(state.S0a))
    lla1 = _cgll(x, sg(state.m1a), sg(state.S1a))
    llb0 = _cgll(x, sg(state.m0b), sg(state.S0b))
    llb1 = _cgll(x, sg(state.m1b), sg(state.S1b))

    lla = jnp.sum(i0 * lla0 + i1 * lla1, axis=1)  # (C,)
    llb = jnp.sum(i0 * llb0 + i1 * llb1, axis=1)

    batch_y = i1 * 2.0 - 1.0
    llra = jnp.einsum("cb,cb->c", batch_y, lla1 - lla0)
    llrb = jnp.einsum("cb,cb->c", batch_y, llb1 - llb0)
    loss = jnp.sum((llra + llrb) * 0.5) / state.classes.shape[0]

    if update:
        a_better = lla > llb
        lama = jnp.where(
            a_better,
            jnp.clip(state.lama - state.delta, 0.0, 1.0),
            jnp.clip(state.lamb + state.delta, 0.0, 1.0) - state.lamdiff,
        )
        lamb = jnp.where(
            a_better,
            jnp.clip(state.lama - state.delta, 0.0, 1.0) + state.lamdiff,
            jnp.clip(state.lamb + state.delta, 0.0, 1.0),
        )
        state = state.replace(lama=lama, lamb=lamb)
    return loss, state


def qda_update(state: QDAState, x: Array, y: Array) -> QDAState:
    x = jax.lax.stop_gradient(x)
    y = y.reshape(-1)
    i1 = (y[None, :] == state.classes[:, None]).astype(x.dtype)

    def per_class(mask1):
        m1, S1 = _masked_moments(x, mask1)
        m0, S0 = _masked_moments(x, 1.0 - mask1)
        return m0, m1, S0, S1

    x0m, x1m, x0S, x1S = jax.vmap(per_class)(i1)

    la = state.lama[:, None]
    lb = state.lamb[:, None]
    laS = state.lama[:, None, None]
    lbS = state.lamb[:, None, None]
    return state.replace(
        m0a=(1 - la) * state.m0a + la * x0m,
        m1a=(1 - la) * state.m1a + la * x1m,
        S0a=(1 - laS) * state.S0a + laS * x0S,
        S1a=(1 - laS) * state.S1a + laS * x1S,
        m0b=(1 - lb) * state.m0b + lb * x0m,
        m1b=(1 - lb) * state.m1b + lb * x1m,
        S0b=(1 - lbS) * state.S0b + lbS * x0S,
        S1b=(1 - lbS) * state.S1b + lbS * x1S,
    )


# ---------------------------------------------------------------------------
# Adversarial discriminator net (reference disentangle.py:663-714)
# ---------------------------------------------------------------------------


class AdvNet(nn.Module):
    """Softmaxed MLP ensemble discriminating real vs shuffled conditionals."""

    @nn.compact
    def __call__(self, z: Array, v: Array) -> list:
        zv = jnp.concatenate([z, v], axis=-1)
        return [jax.nn.softmax(o, axis=-1) for o in MLPEnsemble(2)(zv)]


@flax.struct.dataclass
class AdvState:
    params: dict
    opt_state: optax.OptState


def adv_init(rng: Array, in_dim: int, lr: float = 0.1):
    model = AdvNet()
    params = model.init(rng, jnp.zeros((1, in_dim)), jnp.zeros((1, 0)))
    tx = optax.adamw(lr)
    return AdvState(params=params, opt_state=tx.init(params)), model, tx


def adv_forward(model: AdvNet, params, z: Array, v: Array) -> list:
    return model.apply(params, z, v)


def adv_shuffle(rng: Array, z: Array, v: Array, v_ind) -> tuple:
    """Real/permuted-variable pairs (disentangle.py:678-684). v_ind is a
    static index array of the columns belonging to the scrubbed feature."""
    perm = jax.random.permutation(rng, z.shape[0])
    v_shuffle = v.at[:, v_ind].set(v[perm][:, v_ind])
    v_aug = jnp.concatenate([v, v_shuffle], axis=0)
    z_aug = jnp.concatenate([z, z], axis=0)
    return z_aug, v_aug


def _adv_labels(batch: int) -> Array:
    y = jnp.concatenate([jnp.zeros(batch, jnp.int32), jnp.ones(batch, jnp.int32)])
    return jax.nn.one_hot(y, 2)


def _softmax_ce(pred_probs: Array, y_onehot: Array) -> Array:
    """torch CrossEntropyLoss(softmax_probs, onehot) parity: the reference
    applies CE on already-softmaxed outputs, i.e. log_softmax(probs)."""
    return -jnp.sum(y_onehot * jax.nn.log_softmax(pred_probs, axis=-1))


def adv_fit(
    model: AdvNet,
    tx,
    state: AdvState,
    rng: Array,
    z: Array,
    v: Array,
    v_ind,
    n_iter: int = 5,
):
    """Inner discriminator training loop as lax.scan of n_iter AdamW steps
    (reference fit, disentangle.py:686-714)."""
    z = jax.lax.stop_gradient(z)
    v = jax.lax.stop_gradient(v)
    y = _adv_labels(z.shape[0])

    def one_step(carry, step_rng):
        params, opt_state = carry
        z_aug, v_aug = adv_shuffle(step_rng, z, v, v_ind)

        def loss_fn(p):
            preds = model.apply(p, z_aug, v_aug)
            total = sum(_softmax_ce(yp, y) for yp in preds)
            return total / len(preds) / z.shape[0]

        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), None

    rngs = jax.random.split(rng, n_iter)
    (params, opt_state), _ = jax.lax.scan(
        one_step, (state.params, state.opt_state), rngs
    )
    return AdvState(params=params, opt_state=opt_state)


def adv_generator_loss(
    model: AdvNet, state: AdvState, rng: Array, mu: Array, var: Array, v_ind
) -> Array:
    """Generator-side loss: negative mean CE of the (frozen) discriminator
    on real/shuffled pairs (losses.py:291-309)."""
    batch = mu.shape[0]
    z_aug, v_aug = adv_shuffle(rng, mu, var, v_ind)
    preds = model.apply(jax.lax.stop_gradient(state.params), z_aug, v_aug)
    y = _adv_labels(batch)
    total = sum(_softmax_ce(yp, y) for yp in preds)
    return total / (-(len(preds) * batch))


# ---------------------------------------------------------------------------
# Mutual-information (MCMI) kernel estimator (reference disentangle.py:234-317)
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class MIState:
    x_s: Array  # (num_s, x_dim)
    y_s: Array  # (num_s, y_dim)
    var_s: Array  # scalar (sphere) or (num_s, x_dim) (diagonal)
    logA_x: Array
    logA_y: Array
    valid: Array  # 0.0 until first refresh (reference: mi_estimator=None)
    gamma: float = flax.struct.field(pytree_node=False, default=1.0)
    var_mode: str = flax.struct.field(pytree_node=False, default="sphere")


def mi_init(
    x_s: Array,
    y_s: Array,
    bandwidth: float,
    var_mode: str = "sphere",
    model_L: Array | None = None,
    valid: float = 1.0,
    model_diag: Array | None = None,
) -> MIState:
    """model_diag: diag(L) directly (e.g. from the packed-sigma path);
    overrides model_L, of which only the diagonal is used anyway."""
    log2pi = jnp.log(2.0 * jnp.pi)
    x_dim = x_s.shape[1]
    y_dim = y_s.shape[1]
    if var_mode == "sphere":
        var_s = jnp.asarray(bandwidth)
        logA_x = jnp.asarray(x_dim * (log2pi + jnp.log(bandwidth)))
    elif var_mode == "diagonal":
        if model_diag is None:
            model_diag = jnp.diagonal(model_L, axis1=-2, axis2=-1)
        diag = model_diag**2 + bandwidth
        var_s = diag
        logA_x = x_dim * log2pi + jnp.sum(jnp.log(diag), axis=-1)
    else:
        raise ValueError(f"unknown var_mode {var_mode!r}")
    logA_y = jnp.asarray(y_dim * (log2pi + jnp.log(bandwidth)))
    return MIState(
        x_s=jax.lax.stop_gradient(x_s),
        y_s=jax.lax.stop_gradient(y_s),
        var_s=jax.lax.stop_gradient(var_s),
        logA_x=logA_x,
        logA_y=logA_y,
        valid=jnp.asarray(valid),
        gamma=float(bandwidth),
        var_mode=var_mode,
    )


def mi_score(state: MIState, x: Array, y: Array) -> Array:
    """KDE estimate of I(x; y): mean[log p(x,y) - log p(x) - log p(y)].

    O(batch * num_s * dim) pairwise kernel - a fused VPU kernel on TPU.
    """
    dx = x[:, None, :] - state.x_s[None, :, :]
    dy = y[:, None, :] - state.y_s[None, :, :]
    sdx = jnp.sum((dx / state.var_s) * dx, axis=-1)
    sdy = jnp.sum((dy / state.gamma) * dy, axis=-1)
    lse = jax.scipy.special.logsumexp
    log_pxy = -0.5 * (state.logA_x + state.logA_y + sdx + sdy)
    log_px = -0.5 * (state.logA_x + sdx)
    log_py = -0.5 * (state.logA_y + sdy)
    return jnp.mean(lse(log_pxy, axis=-1) - lse(log_px, axis=-1) - lse(log_py, axis=-1))

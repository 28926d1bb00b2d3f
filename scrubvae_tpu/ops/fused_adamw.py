"""Pallas fused AdamW update: one read-modify-write pass per parameter.

Motivation (VERDICT r1 task 5): the flagship step is HBM-bandwidth bound and
its single hottest op is the AdamW update of the 4096x8256 ``fc_sigma``
kernel (~70% of params). The stock path (optax chain + ``apply_updates``)
costs, per leaf, in separate fusions: a threefry noise pass for the
stochastic rounding of the bf16 moment stores (pure VPU burn - counter-based
RNG is ~50 ALU ops per word), then the elementwise Adam chain, then the
weight write. This kernel does the whole update in ONE pass over HBM with
the on-core hardware PRNG:

    read  w(f32), g(f32), mu(bf16), nu(bf16)
    write w(f32),          mu(bf16), nu(bf16)

i.e. 12 bytes/param each way instead of re-reading intermediates between
fusions, and zero threefry work. Buffers are aliased in-place
(``input_output_aliases``) so XLA neither copies nor double-allocates.

The moment EMAs are *accumulated* in f32 and *stored* in bf16 with
stochastic rounding - bit-identical semantics to
``optim._stochastic_round_bf16`` (add uniform 16-bit noise to the f32 word,
truncate the low mantissa bits): unbiased in expectation so EMA increments
below bf16's ~0.4% ulp still integrate instead of stalling (ADVICE r1).

Semantics parity: equivalent to torch ``AdamW(lr, betas=(b1,b2), eps,
weight_decay)`` (decoupled decay, bias-corrected moments), the reference's
optimizer factory (/root/reference/src/scrubvae/train/trainer.py:54-89),
with the f32 master weights kept (only the moment *stores* are bf16).

Non-TPU backends fall back to a pure-jnp implementation with the same
formula (threefry noise), so tests and CPU smoke runs are exact-contract.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array

__all__ = ["fused_adamw_leaf", "leaf_update_reference"]

# Grid block: sized by VMEM byte budget, not a fixed shape. Pallas double-
# buffers every in/out block, so the working set is 2 * sum(block bytes
# per buffer); the scoped-vmem limit is 16MB. 512x512 f32 blocks fit the
# default dtype mix (w,g f32 + mu,nu bf16 in; w,mu,nu out ~ 5MB -> 10MB
# double-buffered) but OOM at 17MB when the moments are f32
# (train.moment_dtype: f32), so the row count shrinks with the actual
# bytes-per-element of the leaf's buffers.
_BLOCK_C = 512
_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16MB limit


def _block_rows(w_bytes: int, m_bytes: int) -> int:
    """Rows per 512-lane block so 2x(4 in + 3 out blocks) fits the budget.

    Per row of 512 lanes: in = w + g(f32) + 2 moments; out = w + 2 moments.
    """
    per_row = _BLOCK_C * (2 * w_bytes + 4 + 4 * m_bytes)
    rows = _VMEM_BUDGET // (2 * per_row)
    return max(64, min(512, int(rows) & ~7))  # multiple of 8 sublanes


def _sround_bits(x: Array, noise16: Array) -> Array:
    """f32 -> bf16 stochastic rounding via 16-bit mantissa noise + truncate.

    Same formula as optim._stochastic_round_bf16 so the fused and stock
    optimizers are statistically interchangeable.
    """
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    rounded = (bits + noise16) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(jnp.bfloat16)


def _kernel(lowp: bool, w_lowp: bool):
    from jax.experimental.pallas import tpu as pltpu

    def kernel(scal_ref, seed_ref, w_ref, g_ref, mu_ref, nu_ref,
               w_out, mu_out, nu_out):
        import jax.experimental.pallas as pl

        b1 = scal_ref[0]
        b2 = scal_ref[1]
        eps = scal_ref[2]
        lr = scal_ref[3]
        wd = scal_ref[4]
        b1c = scal_ref[5]  # 1 - b1**t
        b2c = scal_ref[6]
        gscale = scal_ref[7]  # global-norm clip factor (1.0 when off)

        if lowp or w_lowp:
            # one hardware-PRNG stream per grid cell
            pltpu.prng_seed(
                seed_ref[0]
                + pl.program_id(0) * pl.num_programs(1)
                + pl.program_id(1)
            )

        g = g_ref[:].astype(jnp.float32) * gscale
        m = b1 * mu_ref[:].astype(jnp.float32) + (1.0 - b1) * g
        n = b2 * nu_ref[:].astype(jnp.float32) + (1.0 - b2) * (g * g)
        upd = (m / b1c) / (jnp.sqrt(jnp.maximum(n, 0.0) / b2c) + eps)
        w = w_ref[:].astype(jnp.float32)
        new_w = w - lr * (upd + wd * w)
        if w_lowp:
            # bf16 parameter store: the per-step increment (lr*update, ~1e-4
            # of |w|) is far below bf16's ulp, so round-to-nearest would
            # freeze the weights - stochastic rounding keeps them integrating
            wbits = pltpu.bitcast(pltpu.prng_random_bits(w.shape), jnp.uint32)
            w_out[:] = _sround_bits(new_w, wbits & jnp.uint32(0xFFFF))
        else:
            w_out[:] = new_w
        if lowp:
            mbits = pltpu.bitcast(pltpu.prng_random_bits(m.shape), jnp.uint32)
            nbits = pltpu.bitcast(pltpu.prng_random_bits(n.shape), jnp.uint32)
            mu_out[:] = _sround_bits(m, mbits & jnp.uint32(0xFFFF))
            nu_out[:] = _sround_bits(n, nbits & jnp.uint32(0xFFFF))
        else:
            mu_out[:] = m
            nu_out[:] = n

    return kernel


@functools.partial(
    jax.jit, static_argnames=("b1", "b2", "eps", "wd", "lowp", "interpret")
)
def fused_adamw_leaf(
    w: Array,
    g: Array,
    mu: Array,
    nu: Array,
    *,
    lr: Array,
    b1c: Array,
    b2c: Array,
    gscale: Array,
    seed: Array,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    wd: float = 0.0,
    lowp: bool = True,
    interpret: bool = False,
):
    """One fused AdamW step on a single parameter leaf.

    Returns ``(new_w, new_mu, new_nu)``. ``lr/b1c/b2c/gscale`` are traced
    scalars (schedule + bias correction computed by the caller); ``seed`` is
    an int32 scalar varied per step for the stochastic-rounding PRNG.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape, dtype = w.shape, w.dtype
    m_dtype = mu.dtype
    w_lowp = dtype == jnp.bfloat16

    # Normalize to 2-D. 1-D leaves become a single row; ≥3-D leaves (conv
    # kernels) collapse leading dims. 2-D (dense) leaves are fed as their
    # TRANSPOSED view: Mosaic custom calls pin row-major {1,0} operand
    # layouts, while XLA assigns dense kernels the contracting-minor {0,1}
    # boundary layout (the forward matmul's preference, propagated to the
    # donated train-state tuple) - so the straight view costs a layout
    # copy in AND out for w/mu/nu (6 x 68MB/step on the 4096x8256 fc_sigma
    # leaf alone, ~13% of the step in the profile). The transposed view's
    # pinned {1,0} layout is byte-identical to {0,1} on the logical shape,
    # so the copies become bitcasts. Elementwise kernel: orientation is
    # semantically irrelevant.
    if w.ndim == 1:
        w2, g2, mu2, nu2 = (a.reshape(1, -1) for a in (w, g, mu, nu))
    elif w.ndim == 2:
        w2, g2, mu2, nu2 = (a.T for a in (w, g, mu, nu))
    else:
        w2, g2, mu2, nu2 = (
            a.reshape(-1, a.shape[-1]) for a in (w, g, mu, nu)
        )

    R, C = w2.shape
    br = min(_block_rows(w2.dtype.itemsize, mu2.dtype.itemsize), R)
    bc = min(_BLOCK_C, C)
    grid = (pl.cdiv(R, br), pl.cdiv(C, bc))
    scal = jnp.stack(
        [
            jnp.float32(b1),
            jnp.float32(b2),
            jnp.float32(eps),
            jnp.asarray(lr, jnp.float32),
            jnp.float32(wd),
            jnp.asarray(b1c, jnp.float32),
            jnp.asarray(b2c, jnp.float32),
            jnp.asarray(gscale, jnp.float32),
        ]
    )
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    # index_map receives (grid indices..., *scalar-prefetch refs)
    block = lambda: pl.BlockSpec(
        (br, bc), lambda i, j, *_refs: (i, j), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel(lowp, w_lowp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[block(), block(), block(), block()],
            out_specs=[block(), block(), block()],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((R, C), dtype),
            jax.ShapeDtypeStruct((R, C), m_dtype),
            jax.ShapeDtypeStruct((R, C), m_dtype),
        ],
        # in-place: w, mu, nu (operand indices count the scalar-prefetch
        # args first: scal=0, seed=1, w=2, g=3, mu=4, nu=5)
        input_output_aliases={2: 0, 4: 1, 5: 2},
        # InterpretParams (not plain interpret=True): the TPU-interpret mode
        # implements pltpu.prng_seed/prng_random_bits on CPU
        interpret=pltpu.InterpretParams() if interpret else False,
    )(scal, seed_arr, w2, g2, mu2, nu2)
    new_w, new_mu, new_nu = out
    if w.ndim == 2:
        new_w, new_mu, new_nu = new_w.T, new_mu.T, new_nu.T
    return (
        new_w.reshape(shape).astype(dtype),
        new_mu.reshape(shape),
        new_nu.reshape(shape),
    )


def leaf_update_reference(
    w, g, mu, nu, *, lr, b1c, b2c, gscale, key: Optional[Array],
    b1=0.9, b2=0.999, eps=1e-8, wd=0.0, lowp=True,
):
    """Pure-jnp same-formula fallback (CPU backends / contract tests).

    Uses threefry noise instead of the TPU hardware PRNG; statistically
    identical, bitwise different streams.
    """
    w_lowp = w.dtype == jnp.bfloat16
    g = g.astype(jnp.float32) * gscale
    m = b1 * mu.astype(jnp.float32) + (1.0 - b1) * g
    n = b2 * nu.astype(jnp.float32) + (1.0 - b2) * (g * g)
    upd = (m / b1c) / (jnp.sqrt(jnp.maximum(n, 0.0) / b2c) + eps)
    wf = w.astype(jnp.float32)
    new_w = wf - lr * (upd + wd * wf)
    if not (lowp or w_lowp):
        return new_w, m, n
    km, kn, kw = jax.random.split(key, 3)

    def noise(k, shape):
        return jax.random.randint(
            k, shape, 0, jnp.uint32(1 << 16), dtype=jnp.uint32
        )

    if w_lowp:
        new_w = _sround_bits(new_w, noise(kw, new_w.shape))
    if lowp:
        return new_w, _sround_bits(m, noise(km, m.shape)), _sround_bits(
            n, noise(kn, n.shape)
        )
    return new_w, m, n

"""Fused Pallas AdamW (ops/fused_adamw.py, optim.FusedAdamW) contract tests.

The fused path must be a drop-in for the optax chain the trainer used
before (scale_by_adam_lowp + add_decayed_weights + scale_by_learning_rate +
apply_updates), i.e. torch-AdamW semantics per the reference optimizer
factory (/root/reference/src/scrubvae/train/trainer.py:54-89).

On CPU these tests exercise the pure-jnp fallback and the Pallas kernel in
interpreter mode; the real-TPU lowering is covered by bench.py and the
trainer integration tests when a TPU is attached.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from scrubvae_tpu.ops.fused_adamw import fused_adamw_leaf, leaf_update_reference
from scrubvae_tpu.train import optim


def _optax_adamw(lr, wd=0.01, m_dtype=jnp.float32):
    return optax.chain(
        optim.scale_by_adam_lowp(mu_dtype=m_dtype, nu_dtype=m_dtype),
        optax.add_decayed_weights(wd),
        optax.scale_by_learning_rate(lr),
    )


def test_fallback_matches_optax_f32_multistep():
    """f32-moment fallback == the optax chain, step for step (no rounding
    noise in the f32 path, so this is near-bitwise)."""
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (24, 33)) * 0.3
    tx = _optax_adamw(1e-3)
    opt_state = tx.init({"w": w})

    mu = jnp.zeros_like(w)
    nu = jnp.zeros_like(w)
    w_f = w
    w_o = w
    for t in range(1, 6):
        g = jax.random.normal(jax.random.PRNGKey(t), w.shape)
        upd, opt_state = tx.update({"w": g}, opt_state, {"w": w_o})
        w_o = optax.apply_updates({"w": w_o}, upd)["w"]
        b1c = 1.0 - 0.9**t
        b2c = 1.0 - 0.999**t
        w_f, mu, nu = leaf_update_reference(
            w_f, g, mu, nu,
            lr=jnp.float32(1e-3), b1c=b1c, b2c=b2c, gscale=jnp.float32(1.0),
            key=None, wd=0.01, lowp=False,
        )
        np.testing.assert_allclose(w_f, w_o, rtol=1e-6, atol=1e-7)


def test_pallas_interpret_matches_fallback_f32():
    """The kernel math (interpret mode, deterministic f32-moment path) ==
    the jnp fallback, including grad clipping and a non-128-multiple
    shape (block padding must not leak into results)."""
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (130, 200))
    g = jax.random.normal(jax.random.PRNGKey(2), w.shape) * 3.0
    mu = jax.random.normal(jax.random.PRNGKey(3), w.shape) * 0.1
    nu = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), w.shape)) * 0.01
    kw = dict(lr=jnp.float32(3e-4), b1c=0.19, b2c=0.002,
              gscale=jnp.float32(0.5), wd=0.01, lowp=False)
    w_k, mu_k, nu_k = fused_adamw_leaf(
        w, g, mu, nu, seed=jnp.int32(5), interpret=True, **kw
    )
    w_r, mu_r, nu_r = leaf_update_reference(w, g, mu, nu, key=None, **kw)
    # fma/ordering differences between the kernel and the jnp fallback
    np.testing.assert_allclose(w_k, w_r, rtol=5e-5, atol=1e-7)
    np.testing.assert_allclose(mu_k, mu_r, rtol=5e-5, atol=1e-7)
    np.testing.assert_allclose(nu_k, nu_r, rtol=5e-5, atol=1e-7)


def test_stochastic_rounding_unbiased():
    """bf16 moment stores use stochastic rounding: the mean over many
    rounded copies must approach the unrounded f32 value (round-to-nearest
    would pin it to the nearest bf16, ADVICE r1)."""
    x = jnp.full((4096,), 1.0 + 1e-3, jnp.float32)  # 1e-3 << bf16 ulp (~8e-3)
    acc = 0.0
    for s in range(16):
        _, m, _ = leaf_update_reference(
            jnp.zeros_like(x), jnp.zeros_like(x), x, jnp.zeros_like(x),
            lr=jnp.float32(0.0), b1c=1.0, b2c=1.0, gscale=jnp.float32(1.0),
            key=jax.random.PRNGKey(s), b1=1.0, b2=1.0, wd=0.0, lowp=True,
        )
        acc += float(m.astype(jnp.float32).mean())
    mean = acc / 16
    assert abs(mean - 1.001) < 2e-4, mean


def test_fused_adamw_class_matches_optax_tree():
    """FusedAdamW.update_and_apply over a realistic nested tree (mixed
    leaf sizes) == the optax chain with the same schedule + clip."""
    sched = optim.make_lr_schedule(1e-3, "cawr", steps_per_epoch=4)
    params = {
        "dense": {"kernel": jax.random.normal(jax.random.PRNGKey(0), (64, 96)),
                  "bias": jnp.zeros((96,))},
        "prelu": jnp.full((1,), 0.25),
    }
    fused = optim.FusedAdamW(
        sched, weight_decay=0.01, moment_dtype=jnp.float32,
        clip_norm=1e6, use_pallas=False,
    )
    ref = optax.chain(
        optax.clip_by_global_norm(1e6),
        optim.scale_by_adam_lowp(mu_dtype=jnp.float32, nu_dtype=jnp.float32),
        optax.add_decayed_weights(0.01),
        optax.scale_by_learning_rate(sched),
    )
    fs = fused.init(params)
    rs = ref.init(params)
    p_f, p_r = params, params
    for t in range(1, 5):
        g = jax.tree.map(
            lambda p: jax.random.normal(jax.random.PRNGKey(100 + t), p.shape),
            p_f,
        )
        p_f, fs = fused.update_and_apply(g, fs, p_f)
        upd, rs = ref.update(g, rs, p_r)
        p_r = optax.apply_updates(p_r, upd)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
            p_f, p_r,
        )
    assert int(fs.count) == 4


def test_make_optimizer_returns_fused_by_default():
    tx = optim.make_optimizer({"optimizer": "adamw", "lr": 1e-4}, 10)
    assert isinstance(tx, optim.FusedAdamW)
    assert tx.clip_norm == 1e6  # parity tripwire kept by default
    tx2 = optim.make_optimizer(
        {"optimizer": "adamw", "lr": 1e-4, "fused_optimizer": False}, 10
    )
    assert not isinstance(tx2, optim.FusedAdamW)
    tx3 = optim.make_optimizer(
        {"optimizer": "adamw", "lr": 1e-4, "clip_norm": 0}, 10
    )
    assert isinstance(tx3, optim.FusedAdamW) and tx3.clip_norm is None


def test_bf16_param_store_integrates_small_updates():
    """With bf16 weight storage, per-step increments far below bf16's ulp
    must still integrate via stochastic rounding (round-to-nearest would
    freeze the weights entirely)."""
    w = jnp.full((512,), 1.0, jnp.bfloat16)
    mu = jnp.zeros((512,), jnp.float32)
    nu = jnp.zeros((512,), jnp.float32)
    g = jnp.full((512,), 1.0, jnp.float32)
    # lr 1e-4 -> per-step weight delta ~1e-4, bf16 ulp at 1.0 is ~7.8e-3
    for t in range(1, 201):
        w, mu, nu = leaf_update_reference(
            w, g, mu, nu,
            lr=jnp.float32(1e-4), b1c=1.0 - 0.9**t, b2c=1.0 - 0.999**t,
            gscale=jnp.float32(1.0), key=jax.random.PRNGKey(t), lowp=False,
        )
    drift = 1.0 - float(w.astype(jnp.float32).mean())
    # Adam with constant grad moves ~lr per step -> ~0.02 over 200 steps
    assert 0.01 < drift < 0.04, drift


def test_pallas_interpret_bf16_weight_path():
    """Kernel w_lowp path (interpret mode): output dtype bf16 and the mean
    update matches the f32 math to within SR noise."""
    w = jnp.full((8, 128), 0.5, jnp.bfloat16)
    g = jnp.full((8, 128), 2.0, jnp.float32)
    mu = jnp.full((8, 128), 2.0, jnp.float32)
    nu = jnp.full((8, 128), 4.0, jnp.float32)
    kw = dict(lr=jnp.float32(1e-2), b1c=1.0, b2c=1.0,
              gscale=jnp.float32(1.0), wd=0.0, lowp=False)
    w_k, _, _ = fused_adamw_leaf(
        w, g, mu, nu, seed=jnp.int32(11), interpret=True, **kw
    )
    assert w_k.dtype == jnp.bfloat16
    # update = (2/1)/(sqrt(4/1)+eps) = 1.0 -> w = 0.5 - 1e-2 = 0.49.
    # Interpret-mode prng_random_bits yields zero noise (rounds toward
    # zero), so allow one bf16 ulp (~2e-3 at 0.5); the real-TPU SR
    # statistics are checked in the hardware smoke (see commit log).
    got = float(w_k.astype(jnp.float32).mean())
    assert abs(got - 0.49) < 4e-3, got


@pytest.mark.slow
def test_trainer_bf16_param_dtype(tmp_path, monkeypatch):
    """train.param_dtype: bf16 converts only the large kernels and trains
    finitely end-to-end through the fused optimizer fallback."""
    from tests.test_train import ARENA, SKEL, base_config, run_config
    from scrubvae_tpu.data.dataset import StreamDataset
    from scrubvae_tpu.data.pipeline import build_frame_store
    from scrubvae_tpu.data.synthetic import synthetic_pose_stream

    # the smoke model's leaves are all tiny; lower the big-leaf threshold
    # so the conversion path (and its small-leaf exclusion) is exercised
    monkeypatch.setattr(optim.FusedAdamW, "MIN_PALLAS_ELEMS", 1 << 8)

    pose, ids = synthetic_pose_stream(SKEL, n_frames=300, n_ids=2, seed=0)
    store = build_frame_store(pose, ids, SKEL, window=31, stride=2)
    ds = StreamDataset(
        store, SKEL,
        ("x6d", "root", "offsets", "target_pose", "avg_speed_3d", "heading",
         "ids"),
        "midfwd", arena_size=ARENA,
        discrete_classes={"ids": np.unique(ids)},
    )
    cfg = base_config(tmp_path)
    cfg["train"]["optimizer"] = "adamw"
    cfg["train"]["param_dtype"] = "bf16"
    tr, metrics = run_config(cfg, ds, epochs=1)
    assert np.isfinite(metrics["total_train"])
    dtypes = {str(p.dtype) for p in jax.tree.leaves(tr.state.params)}
    assert "bfloat16" in dtypes and "float32" in dtypes


@pytest.mark.slow
def test_trainer_step_with_fused_optimizer(tmp_path):
    """A real jitted train epoch drives FusedAdamW end-to-end (jnp fallback
    on CPU): loss finite, opt count advances, checkpoint state round-trips."""
    from tests.test_train import SKEL, ARENA, base_config, run_config
    from scrubvae_tpu.data.dataset import StreamDataset
    from scrubvae_tpu.data.pipeline import build_frame_store
    from scrubvae_tpu.data.synthetic import synthetic_pose_stream

    pose, ids = synthetic_pose_stream(SKEL, n_frames=300, n_ids=2, seed=0)
    store = build_frame_store(pose, ids, SKEL, window=31, stride=2)
    ds = StreamDataset(
        store, SKEL,
        ("x6d", "root", "offsets", "target_pose", "avg_speed_3d", "heading",
         "ids"),
        "midfwd", arena_size=ARENA,
        discrete_classes={"ids": np.unique(ids)},
    )
    cfg = base_config(tmp_path)
    cfg["train"]["optimizer"] = "adamw"
    tr, metrics = run_config(cfg, ds, epochs=1)
    assert isinstance(tr.tx, optim.FusedAdamW)
    assert np.isfinite(metrics["total_train"])
    assert int(tr.state.opt_state.count) == tr.steps_per_epoch


def test_block_rows_fit_vmem_budget():
    """Pallas double-buffers each in/out block: 2x(4 in + 3 out) block bytes
    must stay under the ~16MB scoped-vmem limit for every dtype mix. The
    512x512 fixed block OOM'd at 17MB with f32 moments (w,g,mu,nu all f32)."""
    from scrubvae_tpu.ops.fused_adamw import _BLOCK_C, _block_rows

    for w_b, m_b in [(4, 2), (4, 4), (2, 2), (2, 4)]:
        rows = _block_rows(w_b, m_b)
        per_row = _BLOCK_C * (2 * w_b + 4 + 4 * m_b)
        assert 2 * rows * per_row <= 16 * 1024 * 1024, (w_b, m_b, rows)
        assert rows % 8 == 0 and rows >= 64

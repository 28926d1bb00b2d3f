"""2-virtual-device SPMD smoke — the DEFAULT-gate multi-device coverage.

VERDICT r4 W4/#5: the 8-device sharding tier is opt-in and slow, so plain
``pytest -q`` used to exercise ZERO multi-device code. This file holds a
single cheap MALS-equivalence smoke that
``test_sharding_subprocess.py::test_two_device_smoke_default_gate`` runs
in a fresh 2-virtual-device XLA:CPU process on every default-tier run.
It self-skips below 2 devices (i.e. when collected directly in the
default single-device process)."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.device_count() < 2,
    reason="needs SCRUBVAE_TEST_DEVICES>=2 (virtual multi-device backend)",
)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def test_mals_step_two_device_equivalence(tmp_path):
    """One fused train step, single-device vs sharded over a {data: 2}
    mesh from identical init: loss metrics, post-step params, and the
    MALS streaming moments (which must accumulate the GLOBAL batch
    statistic, not a per-shard fraction) all agree."""
    from test_sharding import make_trainer

    from scrubvae_tpu.parallel import make_mesh, replicate

    tr, _ = make_trainer(tmp_path)
    idx = jnp.arange(16)
    loss_scale = tr.loss_scale_for_epoch(1)
    state_a, metrics_a = tr.train_step(tr.state, idx, loss_scale)

    tr2, _ = make_trainer(tmp_path / "b")
    mesh = make_mesh(2)
    state_sharded = replicate(tr2.state, mesh)
    idx_sharded = jax.device_put(idx, NamedSharding(mesh, P("data")))
    state_b, metrics_b = tr2.train_step(state_sharded, idx_sharded, loss_scale)

    for k in metrics_a:
        a, b = float(metrics_a[k]), float(metrics_b[k])
        assert abs(a - b) <= 1e-3 * max(1.0, abs(a)), (k, a, b)
    for pa, pb in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=2e-3, atol=2e-5
        )
    st_a = state_a.scrub_state["moving_avg_lsq"]["avg_speed_3d"]
    st_b = state_b.scrub_state["moving_avg_lsq"]["avg_speed_3d"]
    np.testing.assert_allclose(
        np.asarray(st_a.Sxx0), np.asarray(st_b.Sxx0), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(st_a.Sxy0), np.asarray(st_b.Sxy0), rtol=1e-3, atol=1e-4
    )

"""Wrapper that runs the multi-device sharding tests in a fresh process.

tests/test_sharding.py needs an 8-virtual-device XLA:CPU backend
(SCRUBVAE_TEST_DEVICES=8), which is a process-global jax config — it cannot
be flipped inside an already-initialized test process. This wrapper spawns a
fresh interpreter so the SPMD replica-invariance checks run without opt-in
env vars (VERDICT r1 task 8 / W7).

Slow tier (VERDICT r2 W2): the 8-virtual-device backend costs ~12 min CPU on
the 1-core host, which blew the default tier's <10 min budget. The default
tier still exercises the multi-chip path every round via
__graft_entry__.dryrun_multichip (driver-run, both {data:4,model:2} and
{data:8} meshes); run this wrapper with ``-m "slow or not slow"``.
"""

import os
import pathlib
import re
import subprocess
import sys

import pytest

HERE = pathlib.Path(__file__).resolve().parent


def _spmd_env(n_devices: int) -> dict:
    env = dict(os.environ)
    # The container sitecustomize force-registers the axon TPU PJRT plugin
    # keyed off this var; drop it so a wedged tunnel can't hang a CPU-only
    # subprocess (see tests/conftest.py).
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["SCRUBVAE_TEST_DEVICES"] = str(n_devices)
    env["JAX_PLATFORMS"] = "cpu"
    # These tests check SPMD *semantics* (replica invariance), not codegen
    # quality: skip XLA:CPU's expensive backend passes to keep wall time
    # down on a 1-core host.
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_backend_optimization_level=0"
    ).strip()
    return env


def test_two_device_smoke_default_gate():
    """DEFAULT-tier multi-device coverage (VERDICT r4 W4/#5): a cheap
    2-virtual-device MALS-equivalence step runs on every plain
    ``pytest -q`` invocation, so the SPMD contract is exercised on every
    builder iteration — not only when someone opts into the 8-device
    tier or the driver dryrun runs."""
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
         str(HERE / "test_sharding2.py")],
        env=_spmd_env(2),
        cwd=str(HERE.parent),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"2-device smoke failed\n--- stdout ---\n{proc.stdout[-4000:]}"
        f"\n--- stderr ---\n{proc.stderr[-4000:]}"
    )
    m = re.search(r"(\d+) passed", proc.stdout)
    assert m and int(m.group(1)) >= 1, proc.stdout[-2000:]
    assert "skipped" not in proc.stdout, proc.stdout[-2000:]


@pytest.mark.slow
def test_sharding_suite_under_8_virtual_devices():
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
         str(HERE / "test_sharding.py")],
        env=_spmd_env(8),
        cwd=str(HERE.parent),
        capture_output=True,
        text=True,
        # r4: the full-stack equivalence test (5 trainer compiles) plus the
        # TP checkpoint round-trip roughly tripled this file's wall time
        timeout=2700,
    )
    assert proc.returncode == 0, (
        f"sharding tests failed\n--- stdout ---\n{proc.stdout[-4000:]}"
        f"\n--- stderr ---\n{proc.stderr[-4000:]}"
    )
    # the tests must actually have run (not self-skipped)
    m = re.search(r"(\d+) passed", proc.stdout)
    assert m and int(m.group(1)) >= 7, proc.stdout[-2000:]
    assert "skipped" not in proc.stdout, proc.stdout[-2000:]

"""Default-tier wrapper that runs the multi-device sharding tests.

tests/test_sharding.py needs an 8-virtual-device XLA:CPU backend
(SCRUBVAE_TEST_DEVICES=8), which is a process-global jax config — it cannot
be flipped inside an already-initialized test process. This wrapper spawns a
fresh interpreter so the SPMD replica-invariance checks run on every default
`pytest -q` invocation (VERDICT r1 task 8 / W7) instead of being opt-in.
"""

import os
import pathlib
import re
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent


def test_sharding_suite_under_8_virtual_devices():
    env = dict(os.environ)
    # The container sitecustomize force-registers the axon TPU PJRT plugin
    # keyed off this var; drop it so a wedged tunnel can't hang a CPU-only
    # subprocess (see tests/conftest.py).
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["SCRUBVAE_TEST_DEVICES"] = "8"
    env["JAX_PLATFORMS"] = "cpu"
    # These tests check SPMD *semantics* (replica invariance), not codegen
    # quality: skip XLA:CPU's expensive backend passes to keep the default
    # tier's wall time down on a 1-core host.
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_backend_optimization_level=0"
    ).strip()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
         str(HERE / "test_sharding.py")],
        env=env,
        cwd=str(HERE.parent),
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (
        f"sharding tests failed\n--- stdout ---\n{proc.stdout[-4000:]}"
        f"\n--- stderr ---\n{proc.stderr[-4000:]}"
    )
    # the tests must actually have run (not self-skipped)
    m = re.search(r"(\d+) passed", proc.stdout)
    assert m and int(m.group(1)) >= 2, proc.stdout[-2000:]
    assert "skipped" not in proc.stdout, proc.stdout[-2000:]

"""Test harness configuration.

By default tests run single-device CPU. Sharding tests (tests/test_sharding)
need a virtual multi-device CPU backend: run them with
``SCRUBVAE_TEST_DEVICES=8 pytest tests/test_sharding.py``; they self-skip
when fewer devices are available. (On 1-core hosts the 8-virtual-device
XLA:CPU backend is fragile, so it is opt-in rather than default; the
multi-chip path is additionally validated by __graft_entry__.dryrun_multichip
in its own process.)
"""

import os

# Tests check semantics, not codegen quality: XLA:CPU's expensive backend
# passes roughly double compile time on a 1-core host, and compile dominates
# this suite's wall time. Skip them by default; SCRUBVAE_TEST_XLA_OPT=1
# restores full optimization (e.g. when timing something in a test).
if not os.environ.get("SCRUBVAE_TEST_XLA_OPT") and not os.environ.get(
    "SCRUBVAE_TEST_TPU"
):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_backend_optimization_level=0"
    ).strip()

# Tests always run on host CPU. Note the container exports
# JAX_PLATFORMS=axon AND its sitecustomize force-registers the axon (TPU)
# backend with jax_platforms='axon,cpu' regardless of the env var - so both
# the env var and the config must be overridden here, unconditionally.
# Set SCRUBVAE_TEST_TPU=1 to intentionally run tests on the attached chip.
if not os.environ.get("SCRUBVAE_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not os.environ.get("SCRUBVAE_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)
n_dev = int(os.environ.get("SCRUBVAE_TEST_DEVICES", "1"))
if n_dev > 1:
    jax.config.update("jax_num_cpu_devices", n_dev)
# XLA:CPU lowers f32 dot_general at low (bf16-like) precision by default in
# this version; pin to highest so numerical tests are meaningful.
jax.config.update("jax_default_matmul_precision", "highest")

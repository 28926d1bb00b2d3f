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

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

# The host image's sitecustomize force-registers the axon (TPU) backend and
# sets jax_platforms='axon,cpu' ignoring the env var; re-assert CPU at the
# config level so tests actually run on the host (and don't contend with
# benchmarks for the attached chip).
if "axon" not in os.environ.get("JAX_PLATFORMS", "cpu"):
    jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

jax.config.update("jax_enable_x64", False)
n_dev = int(os.environ.get("SCRUBVAE_TEST_DEVICES", "1"))
if n_dev > 1:
    jax.config.update("jax_num_cpu_devices", n_dev)
# XLA:CPU lowers f32 dot_general at low (bf16-like) precision by default in
# this version; pin to highest so numerical tests are meaningful.
jax.config.update("jax_default_matmul_precision", "highest")

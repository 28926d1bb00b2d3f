"""Test harness configuration.

Tests run on a virtual 8-device CPU backend so that every sharding/pjit path
is exercised without TPU hardware (SURVEY.md section 4: mesh-size-agnostic
tests). Config must be set before the first jax backend initialization.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# In this JAX/XLA version the supported way to fan one host into N virtual
# CPU devices is jax_num_cpu_devices (XLA_FLAGS=--xla_force_host_platform_
# device_count is no longer honored).
jax.config.update("jax_num_cpu_devices", 8)
# XLA:CPU lowers f32 dot_general at low (bf16-like) precision by default in
# this version; pin to highest so numerical tests are meaningful.
jax.config.update("jax_default_matmul_precision", "highest")

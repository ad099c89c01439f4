"""Test configuration: run everything on CPU with 8 virtual devices.

Tests must not require a TPU (SURVEY.md section 4 implication): CPU execution
plus interpret-mode Pallas covers correctness; the multi-device tests use the
virtual 8-device CPU mesh created by the XLA flag below.

NOTE: this environment pre-registers the axon TPU plugin from sitecustomize
and pins JAX_PLATFORMS=axon; the env var cannot be overridden from here, but
``jax.config.update("jax_platforms", ...)`` before first backend use can.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

"""Test harness configuration.

The suite is CPU-runnable by design (the reference's tests required a real
GPU — SURVEY.md §4 flags that as a weakness to fix): we force the JAX CPU
backend with 8 virtual devices so sharding/multi-chip paths compile and run
without TPU hardware, and enable x64 so the float64/complex128 paths are
exercised.  Set PYFFT_TPU_TEST_PLATFORM=tpu to run the same suite on real
hardware.
"""

import os

_platform = os.environ.get("PYFFT_TPU_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    # NOTE: this environment's TPU plugin imports jax from sitecustomize at
    # interpreter start, so JAX_PLATFORMS in os.environ is read before any
    # test code runs — the switch must go through jax.config instead.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's "same test body, CPU or GPU backend" strategy
(reference ``tests/test_common.hpp:66-89``): the jnp CPU execution acts as
the reference backend; compiled-TPU and Pallas-interpret paths are
exercised by the same tests when hardware is present.
"""

import os

# SPLA_TEST_TPU=1 runs the hardware lane (tests/test_tpu_hw.py) on the
# real chip instead of forcing the CPU backend — the reference analog of
# compiling the gtest main with a real OpenCL platform id
# (tests/test_common.hpp:66-89).
_TPU_LANE = bool(os.environ.get("SPLA_TEST_TPU"))

if not _TPU_LANE:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config
# (must happen before any backend is touched).
import jax

if not _TPU_LANE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)

"""Test env: force CPU platform with 8 virtual devices BEFORE jax imports.

Multi-chip sharding is validated on a virtual 8-device CPU mesh (the driver's
dryrun does the same); the real TPU is used only by bench.py. NOTE: in this
container the axon sitecustomize may claim the TPU at interpreter startup —
tests still run on CPU because of the env below; run pytest with
``PYTHONPATH= JAX_PLATFORMS=cpu`` to avoid touching the TPU at all.
"""

import os

# Opt-in real-TPU run (tests/test_tpu_compiled.py): TPU_SDR_TPU_TESTS=1
# skips the CPU forcing below. Everything else then still passes — the
# sharding tests need >=2 devices and self-skip on a single chip.
_USE_TPU = os.environ.get("TPU_SDR_TPU_TESTS") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# The axon sitecustomize (ambient PYTHONPATH) registers the TPU platform at
# interpreter startup and pins jax_platforms before this file runs; the env
# var alone is then ignored. config.update still wins as long as no backend
# has been initialized, so force CPU explicitly too.
import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)

import os

# Run tests on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware (the real chip is reserved for bench.py).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the sandbox sitecustomize pins jax_platforms to the axon TPU plugin at
# interpreter start; override after import so tests run on the CPU mesh
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from spaln_tpu.score.tables import find_table_dir, TableDir


@pytest.fixture(scope="session")
def table_dir() -> TableDir:
    return TableDir(find_table_dir())


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(42)

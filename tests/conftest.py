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

# Persistent compilation cache: the box has ONE CPU core and the big
# scan geometries take 30-200 s each to compile, so re-runs must reuse
# executables across processes.  Keyed by HLO hash — any change to the
# traced computation recompiles automatically.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest

from spaln_tpu.score.tables import find_table_dir, TableDir


@pytest.fixture(scope="session")
def table_dir() -> TableDir:
    return TableDir(find_table_dir())


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(42)


# ---- test tiers: `pytest -m fast` must stay under ~5 minutes.  Modules
# that compile large scan geometries (30-200 s per geometry on the CPU
# mesh, PERF_NOTES.md fact 5) are marked slow; everything else fast.
SLOW_MODULES = {
    "test_pipeline", "test_vs_reference", "test_batched_mapping",
    "test_long_intron", "test_segment", "test_protein_driver",
    "test_dp_tron_scan", "test_corpus_gate",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)

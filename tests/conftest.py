"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding tests run without TPU hardware by faking 8 XLA host
devices (SURVEY.md §4 "Distributed"). Real-TPU benchmarking lives in
bench.py, not in the test suite.

Note: this environment imports jax at interpreter start (sitecustomize
registers the axon TPU plugin), so JAX_PLATFORMS/XLA_FLAGS env vars are
already consumed by the time conftest runs — the switches below must go
through jax.config instead.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# CPU compiles of the mapper/tracker programs take minutes; the persistent
# cache makes test re-runs fast.
import os as _os

jax.config.update(
    "jax_compilation_cache_dir",
    _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), ".jaxcache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

"""Test harness: run everything on CPU with an 8-device virtual mesh so the
sharding tests exercise real collectives without TPU hardware."""

import os

# Hard-set: the sandbox exports JAX_PLATFORMS=axon (remote TPU tunnel);
# tests must run on local CPU with a virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent compile cache: first-trace XLA compiles dominate test time on
# small CPUs; cache them across pytest invocations.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_pytest")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The sandbox's sitecustomize registers the axon TPU backend at interpreter
# startup, which wins over the env var. Force the platform through the config
# API (effective as long as no backend has been initialized yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _release_executables_per_module():
    """Drop JAX's in-memory executable caches after each test module.

    Every compiled XLA CPU executable holds mmap'd JIT pages; across the
    whole suite the process otherwise accumulates >65k mappings and the
    kernel's default vm.max_map_count kills the next compile with a
    SIGSEGV/SIGABRT inside backend_compile (observed at ~60 tests in).
    Recompiles stay cheap via the persistent on-disk compile cache."""
    yield
    jax.clear_caches()

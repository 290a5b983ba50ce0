"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Mirrors the reference's strategy of exercising MPI code paths with local
`mpiexec -n 4` runs (SURVEY.md section 4 tier 4): multi-chip sharding is
validated on XLA host devices; real-TPU runs happen in the bench tier.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config flag wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite compiles hundreds of programs and
# XLA:CPU's in-process LLVM JIT can segfault after very many compilations;
# caching to disk makes re-runs (and CI runs) read precompiled artifacts.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches():
    """Free compiled-executable memory between test modules (the suite
    compiles hundreds of programs; unbounded caches can OOM the runner)."""
    yield
    jax.clear_caches()

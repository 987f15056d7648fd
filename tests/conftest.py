"""Test harness config.

Forces the CPU backend with 8 virtual devices BEFORE jax initializes, so the
multi-chip sharding paths (shard_map over a Mesh) are exercised in CI without
TPU hardware — the strategy SURVEY.md §4 prescribes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

# The axon TPU sitecustomize calls jax.config.update("jax_platforms", ...)
# at interpreter start, overriding the env var — force CPU again here
# (before any backend is initialized).
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _bound_jit_cache():
    """Release compiled executables between test modules.

    A full-suite run accumulates hundreds of XLA:CPU executables in-process;
    on small hosts the accumulation eventually segfaults a LATER compile
    inside backend_compile_and_load (observed deterministically at
    test_spotlight after the ~280th test, 2026-08-19).  Each module mostly
    compiles its own program shapes, so per-module clearing costs little.
    """
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def key():
    import jax

    return jax.random.PRNGKey(0)

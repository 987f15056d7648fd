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


@pytest.fixture(scope="session")
def key():
    import jax

    return jax.random.PRNGKey(0)

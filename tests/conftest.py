"""Test harness config.

Tests run on CPU with 8 virtual XLA devices — the TPU-world "fake backend"
for exercising jax.sharding.Mesh code paths without a real multi-chip slice.
Must set the env vars before jax initializes a backend.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # env presets axon (TPU); tests run on CPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# sitecustomize pre-imports jax with JAX_PLATFORMS=axon baked into jax.config,
# so the env override above is too late — update the live config too.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# fast CI subset (`pytest -m smoke`, < 2 min): host-side + tiny-jit modules
SMOKE_MODULES = {"test_data", "test_core", "test_utils", "test_text",
                 "test_japanese_fileops"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture
def rng():
    return np.random.default_rng(0)

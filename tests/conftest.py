"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the
host platform and splitting it into 8 virtual devices (the JAX-native
way to test pjit/shard_map meshes). Must run before jax is imported.
"""

import os

# force override: the host environment exports JAX_PLATFORMS=axon (TPU)
# and the axon plugin wins over the env var — use the config API, which
# does take effect. Tests must run on the virtual CPU mesh with exact
# f32 matmuls.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def reference_available():
    """The upstream PyTorch reference, if mounted (for parity tests only)."""
    return pathlib.Path("/root/reference").is_dir()

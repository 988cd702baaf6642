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

# Persistent compilation cache: the suite's wall-clock is dominated by
# XLA CPU compiles (adversarial-D grads, trainer steps, InceptionV3),
# so warm re-runs drop from ~15-20 min to a few minutes. Safe here:
# the axon-deadlock caveat (CLAUDE.md) applies only to the TPU tunnel,
# and tests are pinned to the CPU platform above.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _reset_kernel_env():
    """Runners export config keys (pallas_kernels/pallas_quant/
    pallas_train) to these trace-time env gates; snapshot+restore so a
    test that builds a runner from a config shipping them (e.g.
    swinir_std) can't contaminate later tests' kernel modes. No cache
    clearing needed: the quant gate is resolved in the UNJITTED kernel
    wrappers (part of the jit cache key), and the mode/train gates only
    select which code path a fresh per-test outer jit traces."""
    keys = ("RDST_TPU_PALLAS", "RDST_TPU_PALLAS_QUANT",
            "RDST_TPU_PALLAS_TRAIN", "RDST_TPU_PALLAS_IPP")
    before = {k: os.environ.get(k) for k in keys}
    yield
    for k, v in before.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


@pytest.fixture(autouse=True)
def _reset_active_mesh():
    """Tests that build a production mesh (make_mesh_from_paras) must
    not leak it into later tests: the kernel wrappers shard_map over
    the registered mesh at trace time."""
    yield
    from rdst_tpu.parallel.mesh import set_active_mesh

    set_active_mesh(None)


@pytest.fixture(scope="session")
def reference_available():
    """The upstream PyTorch reference, if mounted (for parity tests only)."""
    return pathlib.Path("/root/reference").is_dir()

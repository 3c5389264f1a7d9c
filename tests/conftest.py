"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU PJRT plugin at
interpreter start and pins JAX_PLATFORMS=axon, so the env-var route is
already stale by the time pytest runs. `jax.config.update` before any
backend is initialized still wins — the standard JAX trick for testing
pjit/shard_map semantics without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference repo not mounted")
    return REFERENCE_DIR


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1337)

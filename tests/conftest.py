"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard JAX way to exercise pjit/shard_map sharding logic
without TPU pod hardware (SURVEY.md §4). Must run before jax is imported
anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the environment's sitecustomize registers a TPU plugin and pins
# jax_platforms; override it so tests run on the virtual CPU mesh
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REFERENCE_DATA = "/root/reference/data-sample"


def _fixture_files():
    if not os.path.isdir(REFERENCE_DATA):
        return []
    return sorted(
        os.path.join(REFERENCE_DATA, f)
        for f in os.listdir(REFERENCE_DATA)
        if f.endswith(".npy")
    )


@pytest.fixture(scope="session")
def sample_clouds():
    """Real TS40K crops (N,4 = xyz + class) when available, else synthetic."""
    files = _fixture_files()
    if files:
        return [np.load(f) for f in files[:4]]
    rng = np.random.default_rng(0)
    clouds = []
    for _ in range(3):
        n = int(rng.integers(2000, 5000))
        xyz = rng.uniform([5.4e5, 4.6e6, 150.0], [5.4e5 + 30, 4.6e6 + 30, 220.0], (n, 3))
        labels = rng.choice([1, 2, 3, 5, 15, 16], size=n, p=[0.2, 0.4, 0.2, 0.1, 0.05, 0.05])
        clouds.append(np.concatenate([xyz, labels[:, None]], axis=1))
    return clouds


@pytest.fixture(scope="session")
def small_cloud():
    rng = np.random.default_rng(42)
    n = 3000
    xyz = rng.uniform([0, 0, 0], [30, 30, 60], (n, 3))
    labels = rng.choice([1, 2, 15], size=n, p=[0.5, 0.35, 0.15]).astype(np.float64)
    return np.concatenate([xyz, labels[:, None]], axis=1)
